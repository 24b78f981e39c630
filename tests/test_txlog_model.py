"""Model-based stateful fuzz of the ACID commit log.

Hypothesis drives random interleavings of append / CAS-append /
checkpoint / restore / vacuum against `txlog.LogParquetBackend` and
checks every resulting log version's VISIBLE FACT SET against a pure
in-memory reference model — the strongest form of evidence for the
protocol invariants the docstrings claim:

- append-by-manifest: a version's visible set is exactly the union of
  the batches its manifests name (no loss, no duplication);
- commit_rows CAS: succeeds iff based on the current head, and a lost
  race leaves NO trace (no orphan becomes visible later);
- checkpoint: pure compaction — the visible set at and after the
  checkpoint version is unchanged;
- restore: the head's visible set becomes exactly the target version's,
  every other version stays readable, history() reports the operation;
- aggressive vacuum: truncation point = the newest replaces_all
  manifest; reads at/above it unchanged, reads below raise ValueError;
- the _last_checkpoint pointer never changes an answer (it is purged
  at random to force full-scan fallback).

Reads go through pyarrow over `_live_files` (the same file-resolution
facts_df uses) so the whole machine runs without a JVM except the
checkpoint rewrite, which uses the session Spark. Derandomized like
every hypothesis suite here (tests/conftest.py).
"""

import os
import sys

import pytest
from hypothesis import settings
from hypothesis import strategies as st
from hypothesis.stateful import (
    RuleBasedStateMachine,
    initialize,
    invariant,
    precondition,
    rule,
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unifydb_spark.txlog import LogParquetBackend


def _visible_ids(backend, as_of=None):
    """The e-ids visible at a log version, via pyarrow over the same
    file list facts_df resolves — no JVM."""
    import pyarrow.parquet as pq

    ids = []
    for path in backend._live_files(as_of_version=as_of):
        ids.extend(pq.read_table(path, columns=["e"])["e"].to_pylist())
    return sorted(ids)


class TxLogMachine(RuleBasedStateMachine):
    # class attribute set by the launching test (needs the fixture)
    spark = None
    tmp_root = None

    @initialize()
    def setup(self):
        import tempfile

        d = tempfile.mkdtemp(dir=self.tmp_root, prefix="model_")
        # TWO independent handles on the same path: every operation is
        # routed through a hypothesis-chosen handle, so cross-writer
        # serialization (the optimistic CAS) is part of the fuzzed
        # surface, not just single-writer sequencing
        self.handles = [
            LogParquetBackend(self.spark, os.path.join(d, "f"))
            for _ in range(2)
        ]
        self.next_id = 1
        # model: version -> sorted visible ids; version 0 = empty store
        self.model = {0: []}
        self.truncated_below = 1  # smallest still-readable version

    @property
    def backend(self):
        return self.handles[0]

    def _pick(self, data):
        return self.handles[
            data.draw(st.integers(min_value=0, max_value=1), label="handle")
        ]

    def _batch(self, n):
        ids = list(range(self.next_id, self.next_id + n))
        self.next_id += n
        rows = [
            (i, "n", "long", i, None, None, None, None, None, None, i, True)
            for i in ids
        ]
        return ids, rows

    @property
    def head(self):
        return max(self.model)

    @rule(n=st.integers(min_value=1, max_value=3), data=st.data())
    def append(self, n, data):
        ids, rows = self._batch(n)
        self._pick(data).append(rows)
        self.model[self.head + 1] = sorted(self.model[self.head] + ids)

    @rule(n=st.integers(min_value=1, max_value=3), stale=st.booleans(),
          data=st.data())
    def commit_rows_cas(self, n, stale, data):
        """CAS append based on the head, or deliberately on a stale
        version (which must fail and leave no trace)."""
        ids, rows = self._batch(n)
        base = self.head
        if stale and base >= 1:
            base = base - 1
        ok = self._pick(data).commit_rows(rows, based_on_version=base)
        if base == self.head:
            assert ok, "CAS based on the true head must win"
            self.model[self.head + 1] = sorted(self.model[self.head] + ids)
        else:
            assert not ok, "CAS based on a stale version must lose"

    @precondition(lambda self: self.head >= 1)
    @rule(data=st.data())
    def checkpoint(self, data):
        v = self._pick(data).checkpoint()
        assert v == self.head + 1
        self.model[v] = self.model[self.head]

    @precondition(lambda self: self.head >= 1)
    @rule(data=st.data())
    def restore(self, data):
        target = data.draw(
            st.integers(min_value=self.truncated_below, max_value=self.head),
            label="restore_target",
        )
        v = self._pick(data).restore(target)
        assert v == self.head + 1
        self.model[v] = self.model[target]
        assert self.backend.history(limit=1)[0]["operation"] == "restore"

    @rule()
    def vacuum_safe(self):
        """Default vacuum: reclaims only crash orphans; every version
        stays readable."""
        self.backend.vacuum(retention_seconds=0.0)

    @precondition(lambda self: self.head >= 1)
    @rule()
    def vacuum_aggressive(self):
        self.backend.vacuum(
            retain_before_checkpoint=False, retention_seconds=0.0
        )
        versions = self.backend._list_versions()
        if versions:
            self.truncated_below = versions[0]

    @rule()
    def purge_pointer(self):
        """The pointer is advisory: deleting it must never change a
        read (degrades to a full scan)."""
        try:
            os.unlink(self.backend._lc_path)
        except FileNotFoundError:
            pass

    @invariant()
    def every_readable_version_matches_model(self):
        if not hasattr(self, "backend"):
            return
        assert self.backend.log_version() == self.head
        for v in sorted(self.model):
            if v == 0 or v < self.truncated_below:
                continue
            assert _visible_ids(self.backend, as_of=v) == self.model[v], (
                f"version {v} diverged from the model"
            )
        # head shorthand (no as_of) matches too
        if self.head >= 1:
            assert _visible_ids(self.backend) == self.model[self.head]
        # truncated versions refuse, never lie
        if self.truncated_below > 1:
            probe = self.truncated_below - 1
            if probe >= 1:
                with pytest.raises(ValueError, match="truncated"):
                    self.backend._live_files(as_of_version=probe)
        assert len(self.backend.history()) == len(
            self.backend._list_versions()
        )


def test_txlog_model_fuzz(spark, tmp_path):
    TxLogMachine.spark = spark
    TxLogMachine.tmp_root = str(tmp_path)
    from hypothesis.stateful import run_state_machine_as_test

    run_state_machine_as_test(
        TxLogMachine,
        settings=settings(
            max_examples=8,
            stateful_step_count=14,
            deadline=None,
            derandomize=True,
        ),
    )
