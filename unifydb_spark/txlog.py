"""ACID commit-log parquet fact store (a Delta-lite transaction log).

The reference serializes ALL writers through one transactor thread
(src/unifydb/transact.clj:116-137; "NOT THREAD SAFE, only write in the
single-threaded transactor", src/unifydb/btree.clj:2-4) — which also means
its write path is single-*process*. At the 100 TB mandate the fact store
needs what a lakehouse table format provides instead: atomic
append-by-manifest, optimistic concurrency across independent writer
processes, and log-versioned time travel. `LogParquetBackend` implements
that contract on plain parquet + a JSON commit log, dependency-free
(a production deployment would use Delta/Iceberg; the protocol below is
the same shape as their commit protocols).

Layout::

    <path>/_txlog/00000000000001.json   one manifest per commit
    <path>/data/<uuid>.parquet          data files; INVISIBLE until a
                                        manifest references them

Commit protocol (optimistic concurrency):

1. Write the new facts to a uniquely-named parquet file under ``data/``
   (pyarrow, driver-side — tx batches are small; bulk ingest goes through
   :meth:`bulk_append_df` which writes with Spark executors instead).
2. Read the current log head N (cheap: one directory listing).
3. Write the version-(N+1) manifest to a temp file, fsync, then
   ``os.link(tmp, _txlog/<N+1>.json)`` — an atomic CREATE-EXCLUSIVE on
   POSIX. ``EEXIST`` means another writer committed N+1 first: the data
   file stays (still invisible), the caller re-reads the head, re-bases
   (re-allocates entity/tx ids above the new ``max_id``) and retries.
4. Readers list ``_txlog/*.json`` and union exactly the files the
   manifests name. A writer that CRASHES between steps 1 and 3 leaves an
   orphan data file that no reader ever sees — the store stays clean.

Each manifest carries *cumulative* stats (``max_id``, ``latest_tx``,
``any_retraction``, distinct-tx bound), so id allocation and the
`clean`-fastpath decision are O(1) manifest reads — no Spark job, which
also makes the whole WRITE path runnable without a SparkSession (the
cross-process tests in tests/test_txlog.py exploit this: child writer
processes are plain Python; only the verifying reader needs a JVM).

Time travel: ``facts_df(as_of_version=N)`` reads the manifests ``<= N``
— log-versioned history, orthogonal to the fact-level ``tx <= T``
as-of filter the snapshot view applies (store.py:366).
"""

from __future__ import annotations

import json
import os
import socket
import time
import uuid
from typing import Iterable, Optional

_MANIFEST_DIGITS = 14


def _arrow_fact_schema():
    import pyarrow as pa

    # Mirrors values.FACT_SCHEMA column-for-column so
    # spark.read.schema(FACT_SCHEMA) reads these files without coercion.
    return pa.schema(
        [
            pa.field("e", pa.int64(), nullable=False),
            pa.field("a", pa.string(), nullable=False),
            pa.field("v_type", pa.string(), nullable=False),
            pa.field("v_long", pa.int64()),
            pa.field("v_double", pa.float64()),
            pa.field("v_str", pa.string()),
            pa.field("v_bool", pa.bool_()),
            pa.field("v_ref", pa.int64()),
            pa.field("v_ts", pa.timestamp("us")),
            pa.field("v_json", pa.string()),
            pa.field("tx", pa.int64(), nullable=False),
            pa.field("added", pa.bool_(), nullable=False),
        ]
    )


class CommitConflict(Exception):
    """Another writer committed the version this writer was basing on."""


class LogParquetBackend:
    """Fact-log backend with an ACID commit log (see module docstring).

    Satisfies the same backend protocol as ``store.ParquetBackend`` plus:

    - :meth:`commit_rows` — compare-and-swap append used by
      ``FactStore.transact`` for cross-process id-allocation safety;
    - :meth:`log_version` / ``facts_df(as_of_version=...)`` —
      log-versioned time travel;
    - :meth:`bulk_append_df` — executor-side big appends (manifest commit
      of Spark-written files);
    - :meth:`checkpoint` / :meth:`vacuum` — log compaction + orphan GC.
    """

    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path
        self.log_dir = os.path.join(path, "_txlog")
        self.data_dir = os.path.join(path, "data")
        os.makedirs(self.log_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)
        self._writer = f"{socket.gethostname()}:{os.getpid()}"

    # ---- log plumbing -----------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:0{_MANIFEST_DIGITS}d}.json")

    def _list_versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.log_dir):
            stem, ext = os.path.splitext(name)
            if ext == ".json" and stem.isdigit():
                out.append(int(stem))
        out.sort()
        return out

    def log_version(self) -> int:
        vs = self._list_versions()
        return vs[-1] if vs else 0

    # FactStore caches key on backend._version; the log head IS the version.
    @property
    def _version(self) -> int:
        return self.log_version()

    def _read_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def _head(self) -> Optional[dict]:
        v = self.log_version()
        return self._read_manifest(v) if v else None

    def _try_commit(self, manifest: dict, version: int) -> bool:
        """Atomically publish `manifest` as log version `version`.

        link(2) fails with EEXIST if the name is taken — the exclusive
        CAS at the heart of the protocol. The tmp file is fully written
        and fsynced first, so a visible manifest is never torn."""
        tmp = os.path.join(self.log_dir, f".tmp.{uuid.uuid4().hex}")
        data = json.dumps(manifest, separators=(",", ":"))
        fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644)
        try:
            os.write(fd, data.encode())
            os.fsync(fd)
        finally:
            os.close(fd)
        try:
            os.link(tmp, self._manifest_path(version))
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def _build_manifest(
        self, parent: Optional[dict], files: list[dict], rows_stats: dict
    ) -> dict:
        """Fold a new commit's stats into the cumulative head stats."""
        p_max = parent["max_id"] if parent else 0
        p_tx = parent["latest_tx"] if parent else 0
        p_retr = parent["any_retraction"] if parent else False
        # distinct-tx bound for the `clean` fast path: track the single tx
        # value while there is one; collapse to "multi" after.
        p_txs = parent.get("tx_state") if parent else None  # None | int | "multi"
        tx_state = p_txs
        for t in rows_stats["txs"]:
            if tx_state is None:
                tx_state = t
            elif tx_state != "multi" and tx_state != t:
                tx_state = "multi"
        return {
            "files": files,
            "max_id": max(p_max, rows_stats["max_id"]),
            "latest_tx": max(p_tx, rows_stats["latest_tx"]),
            "any_retraction": p_retr or rows_stats["any_retraction"],
            "tx_state": tx_state,
            "base": parent.get("base", 0) if parent else 0,
            "writer": self._writer,
            "ts_millis": int(time.time() * 1000),
        }

    @staticmethod
    def _rows_stats(rows: list[tuple]) -> dict:
        mx, mtx, retr, txs = 0, 0, False, set()
        for r in rows:
            mx = max(mx, r[0], r[10], r[7] or 0)
            mtx = max(mtx, r[10])
            txs.add(r[10])
            if not r[11]:
                retr = True
        return {
            "max_id": mx,
            "latest_tx": mtx,
            "any_retraction": retr,
            "txs": sorted(txs),
        }

    def _write_data_file(self, rows: list[tuple]) -> dict:
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = _arrow_fact_schema()
        cols = list(zip(*rows)) if rows else [[] for _ in schema]
        table = pa.Table.from_arrays(
            [pa.array(list(c), type=f.type) for c, f in zip(cols, schema)],
            schema=schema,
        )
        name = f"{uuid.uuid4().hex}.parquet"
        pq.write_table(table, os.path.join(self.data_dir, name))
        return {"name": name, "rows": len(rows)}

    # ---- writes -----------------------------------------------------------

    def commit_rows(self, rows: Iterable[tuple], based_on_version: int) -> bool:
        """Compare-and-swap append: commit `rows` as version
        based_on_version+1, or return False if another writer got there
        first (the caller must re-read max_id and re-allocate ids)."""
        rows = list(rows)
        f = self._write_data_file(rows)
        parent = (
            self._read_manifest(based_on_version) if based_on_version else None
        )
        manifest = self._build_manifest(parent, [f], self._rows_stats(rows))
        if self._try_commit(manifest, based_on_version + 1):
            return True
        # lost the race — leave the data file as an orphan for vacuum()
        return False

    def append(self, rows: Iterable[tuple], max_retries: int = 64) -> None:
        """Raw append (seed path): the rows' ids are the caller's problem,
        so a conflict only needs the manifest re-based, not the data."""
        rows = list(rows)
        f = self._write_data_file(rows)
        stats = self._rows_stats(rows)
        for _ in range(max_retries):
            head_v = self.log_version()
            parent = self._read_manifest(head_v) if head_v else None
            if self._try_commit(self._build_manifest(parent, [f], stats), head_v + 1):
                return
        raise CommitConflict(f"append lost the commit race {max_retries} times")

    def bulk_append_df(self, df, max_retries: int = 64) -> None:
        """Executor-side big append: Spark writes the parquet files to a
        staging dir, then one manifest commit makes them all visible
        atomically (append-by-manifest — the 100 TB ingest path; no
        driver materialization)."""
        from pyspark.sql import functions as F

        staging = os.path.join(self.data_dir, f".stage.{uuid.uuid4().hex}")
        df.write.parquet(staging)
        files, stats_rows = [], df.sparkSession.read.parquet(staging)
        agg = stats_rows.agg(
            F.greatest(
                F.max("e"), F.max("tx"), F.coalesce(F.max("v_ref"), F.lit(0))
            ).alias("mx"),
            F.max("tx").alias("mtx"),
            F.min("added").alias("all_added"),
            F.collect_set("tx").alias("txs"),
            F.count("*").alias("n"),
        ).collect()[0]
        for name in sorted(os.listdir(staging)):
            if name.endswith(".parquet"):
                final = f"{uuid.uuid4().hex}.parquet"
                os.rename(
                    os.path.join(staging, name), os.path.join(self.data_dir, final)
                )
                files.append({"name": final, "rows": None})
        files[0]["rows"] = agg["n"]
        for name in os.listdir(staging):
            os.unlink(os.path.join(staging, name))
        os.rmdir(staging)
        # bound the distinct-tx set carried in the manifest: 0/1 distinct
        # txs keep the exact value (the `clean` fast path needs only that);
        # more collapse to "multi" anyway.
        txs = agg["txs"] or []
        stats = {
            "max_id": agg["mx"] or 0,
            "latest_tx": agg["mtx"] or 0,
            "any_retraction": not bool(agg["all_added"]) if agg["n"] else False,
            "txs": sorted(txs)[:2],
        }
        for _ in range(max_retries):
            head_v = self.log_version()
            parent = self._read_manifest(head_v) if head_v else None
            if self._try_commit(self._build_manifest(parent, files, stats), head_v + 1):
                return
        raise CommitConflict(f"bulk append lost the commit race {max_retries} times")

    # ---- reads ------------------------------------------------------------

    def _live_files(self, as_of_version: Optional[int] = None) -> list[str]:
        versions = self._list_versions()
        if as_of_version is not None:
            versions = [v for v in versions if v <= as_of_version]
        files: list[str] = []
        start = 0
        manifests = [self._read_manifest(v) for v in versions]
        # a checkpoint manifest replaces everything before it
        for i, m in enumerate(manifests):
            if m.get("replaces_all"):
                start = i
        for m in manifests[start:]:
            files.extend(
                os.path.join(self.data_dir, f["name"]) for f in m["files"]
            )
        return files

    def facts_df(self, as_of_version: Optional[int] = None):
        from unifydb_spark.values import FACT_SCHEMA

        files = self._live_files(as_of_version)
        if not files:
            return self.spark.createDataFrame([], schema=FACT_SCHEMA)
        return self.spark.read.schema(FACT_SCHEMA).parquet(*files)

    @property
    def clean(self) -> bool:
        head = self._head()
        if head is None:
            return True
        return not head["any_retraction"] and head["tx_state"] != "multi"

    @property
    def has_retractions(self) -> bool:
        head = self._head()
        return bool(head and head["any_retraction"])

    def max_id(self) -> int:
        head = self._head()
        return head["max_id"] if head else 0

    def latest_tx(self) -> int:
        head = self._head()
        return head["latest_tx"] if head else 0

    def attr_types(self) -> dict[str, set]:
        out: dict[str, set] = {}
        for r in self.facts_df().select("a", "v_type").distinct().collect():
            out.setdefault(r["a"], set()).add(r["v_type"])
        return out

    # ---- maintenance --------------------------------------------------------

    def checkpoint(self, max_retries: int = 16) -> int:
        """Rewrite the live facts as one consolidated, (a, e, tx)-sorted
        file set and commit a `replaces_all` manifest. Readers of newer
        versions touch only the checkpoint's files (small-file compaction);
        older versions remain readable because nothing is deleted —
        vacuum() reclaims space separately. Returns the new log version."""
        base_v = self.log_version()
        if base_v == 0:
            return 0
        df = self.facts_df(as_of_version=base_v).sortWithinPartitions(
            "a", "e", "tx"
        )
        staging = os.path.join(self.data_dir, f".stage.{uuid.uuid4().hex}")
        df.write.parquet(staging)
        files = []
        for name in sorted(os.listdir(staging)):
            if name.endswith(".parquet"):
                final = f"{uuid.uuid4().hex}.parquet"
                os.rename(
                    os.path.join(staging, name), os.path.join(self.data_dir, final)
                )
                files.append({"name": final, "rows": None})
        for name in os.listdir(staging):
            os.unlink(os.path.join(staging, name))
        os.rmdir(staging)
        parent = self._read_manifest(base_v)
        for _ in range(max_retries):
            head_v = self.log_version()
            if head_v != base_v:
                # concurrent commits landed mid-rewrite; the checkpoint
                # would silently drop them — abandon (files become orphans)
                raise CommitConflict(
                    "checkpoint raced a concurrent commit; re-run when quiescent"
                )
            manifest = dict(
                parent,
                files=files,
                replaces_all=True,
                writer=self._writer,
                ts_millis=int(time.time() * 1000),
            )
            if self._try_commit(manifest, head_v + 1):
                return head_v + 1
        raise CommitConflict("checkpoint lost the commit race")

    def vacuum(self, retain_before_checkpoint: bool = True) -> list[str]:
        """Delete data files no LIVE manifest references — crash orphans
        and, if a checkpoint exists and retain_before_checkpoint=False,
        files only pre-checkpoint versions reference (which forfeits
        time travel to those versions). Returns the deleted names."""
        versions = self._list_versions()
        referenced: set[str] = set()
        for v in versions:
            m = self._read_manifest(v)
            if retain_before_checkpoint or not m.get("replaces_all"):
                referenced.update(f["name"] for f in m["files"])
        if not retain_before_checkpoint:
            referenced = set()
            start = 0
            manifests = [self._read_manifest(v) for v in versions]
            for i, m in enumerate(manifests):
                if m.get("replaces_all"):
                    start = i
            for m in manifests[start:]:
                referenced.update(f["name"] for f in m["files"])
        deleted = []
        for name in os.listdir(self.data_dir):
            if name.endswith(".parquet") and name not in referenced:
                os.unlink(os.path.join(self.data_dir, name))
                deleted.append(name)
        return deleted
