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
    <path>/_txlog/_last_checkpoint      advisory pointer to the newest
                                        replaces_all manifest (read
                                        optimization, Delta-shaped; never
                                        load-bearing for correctness)
    <path>/data/<uuid>.parquet          data files; INVISIBLE until a
                                        manifest references them

Commit protocol (optimistic concurrency):

1. Write the new facts to a uniquely-named parquet file under ``data/``
   (pyarrow, driver-side — tx batches are small; bulk ingest goes through
   :meth:`bulk_append_df` which writes with Spark executors instead).
2. Read the current log head N (cheap: one directory listing).
3. Publish the version-(N+1) manifest via the pluggable
   :class:`CommitProtocol` — a single atomic *put-if-absent*. On POSIX
   that is ``os.link`` CREATE-EXCLUSIVE (:class:`PosixLinkProtocol`); on
   an object store it is a conditional PUT (S3 ``If-None-Match: *`` /
   GCS ``ifGenerationMatch=0`` — :class:`ConditionalPutProtocol`
   simulates that contract so the whole conflict/crash suite runs against
   both primitives unchanged). A lost put means another writer committed
   N+1 first: the caller re-reads the head, re-bases (re-allocates
   entity/tx ids above the new ``max_id``) and retries.
4. Readers list ``_txlog/*.json`` and union exactly the files the
   manifests name. A writer that CRASHES between steps 1 and 3 leaves an
   orphan data file that no reader ever sees — the store stays clean.

Only the MANIFEST publish needs an atomic primitive. Data files are
invisible until a manifest names them, so they need no atomicity at
all: on an object store they are simply PUT under their final unique
names (the local staging-dir + rename in :meth:`bulk_append_df` is a
local-filesystem convenience for collecting Spark's part files, not a
protocol requirement — a cluster deployment points the staging write at
the table's object prefix and commits the written keys directly).

Each manifest carries *cumulative* stats (``max_id``, ``latest_tx``,
``any_retraction``, distinct-tx bound, per-stream last committed epoch),
so id allocation, the `clean`-fastpath decision and streaming
exactly-once dedup are O(1) manifest reads — no Spark job, which
also makes the whole WRITE path runnable without a SparkSession (the
cross-process tests in tests/test_txlog.py exploit this: child writer
processes are plain Python; only the verifying reader needs a JVM).

Time travel: ``facts_df(as_of_version=N)`` reads the manifests ``<= N``
— log-versioned history, orthogonal to the fact-level ``tx <= T``
as-of filter the snapshot view applies (store.py:366).

Durability scope: manifests are fsynced before publish and the log
directory is fsynced after (a visible manifest survives power loss);
Spark-written data files are fsynced at rename time along with the data
directory. Crash-safety TESTS cover process kills (tests/test_txlog.py);
power-loss durability additionally depends on the filesystem honoring
fsync ordering, as with any log-structured store.
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


def _fsync_dir(path: str) -> None:
    """fsync a directory so a just-created/renamed entry survives power
    loss (the entry itself being durable is not enough on POSIX — the
    directory block that names it must also reach disk)."""
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _fsync_file(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


class CommitProtocol:
    """The single atomic primitive the commit log's ACID claim rests on:
    publish `data` under `path` iff nothing is there yet.

    Everything else in the protocol (re-base retry, crash-orphan
    invisibility, checkpoint rebase) is built ON this one operation, so
    porting the store to a new storage system means implementing exactly
    this class — the contract test (tests/test_txlog.py) runs the same
    conflict/crash suite against every implementation.
    """

    def put_if_absent(self, path: str, data: bytes) -> bool:
        """Atomically create `path` with `data`. True on success; False
        if `path` already exists (another writer won). A False return
        MUST leave the existing object untouched, and a crash mid-call
        MUST never leave a torn/partial object visible at `path`."""
        raise NotImplementedError


class PosixLinkProtocol(CommitProtocol):
    """put-if-absent via link(2): write+fsync a tmp file, then
    ``os.link(tmp, path)`` — CREATE-EXCLUSIVE on POSIX, atomic even over
    NFS (unlike O_EXCL on some NFS versions). The published entry is made
    power-loss durable by fsyncing the parent directory."""

    def put_if_absent(self, path: str, data: bytes) -> bool:
        d = os.path.dirname(path)
        tmp = os.path.join(d, f".tmp.{uuid.uuid4().hex}")
        fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644)
        try:
            os.write(fd, data)
            os.fsync(fd)
        finally:
            os.close(fd)
        try:
            os.link(tmp, path)
            _fsync_dir(d)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)


class ConditionalPutProtocol(CommitProtocol):
    """Simulated object-store conditional PUT (S3 ``If-None-Match: *`` /
    GCS ``ifGenerationMatch=0`` / Azure ``If-None-Match`` ETag).

    Object stores have NO client-visible atomic link(2) or O_EXCL — the
    STORE serializes conditional writes internally (this is why classic
    Delta-on-S3 needed a DynamoDB LogStore until S3 shipped conditional
    PUT in 2024). The simulation reproduces exactly that split: an
    advisory flock on a service sidecar file stands in for the object
    store's internal serialization (it is the "service", not a
    filesystem primitive the client protocol may rely on), and inside it
    the object appears via write-to-temp + rename, matching object-store
    whole-object visibility (readers never observe a torn object).

    The point of shipping this next to :class:`PosixLinkProtocol` is the
    contract test: the ENTIRE txlog conflict/crash suite runs against a
    primitive with object-store semantics, proving the protocol above it
    never silently depends on POSIX-only atomicity.

    SAME-PROTOCOL REQUIREMENT: every handle to a given table must use
    the same protocol. The flock sidecar only serializes writers that
    go THROUGH it — a PosixLinkProtocol handle's link(2) bypasses the
    lock entirely, so mixing protocols on one path voids the
    serialization guarantee (exactly as mixing S3-conditional-PUT
    clients with posix-mount clients would on a real object store).
    The `.svc.lock` sidecar lives in `_txlog/` and is intentionally
    permanent: it is the simulated service, not store state — vacuum
    and the manifest scanners ignore non-`NNN.json` names, and deleting
    it while writers hold it open would split the serialization domain.
    """

    def __init__(self):
        self._svc = ".svc.lock"

    def put_if_absent(self, path: str, data: bytes) -> bool:
        import fcntl

        d = os.path.dirname(path)
        lock_path = os.path.join(d, self._svc)
        lock_fd = os.open(lock_path, os.O_RDWR | os.O_CREAT, 0o644)
        try:
            fcntl.flock(lock_fd, fcntl.LOCK_EX)  # the service's serialization
            if os.path.exists(path):
                return False  # HTTP 412 PreconditionFailed
            tmp = os.path.join(d, f".put.{uuid.uuid4().hex}")
            fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644)
            try:
                os.write(fd, data)
                os.fsync(fd)
            finally:
                os.close(fd)
            os.rename(tmp, path)  # whole-object visibility
            _fsync_dir(d)
            return True
        finally:
            os.close(lock_fd)  # releases the flock


class LogParquetBackend:
    """Fact-log backend with an ACID commit log (see module docstring).

    Satisfies the same backend protocol as ``store.ParquetBackend`` plus:

    - :meth:`commit_rows` — compare-and-swap append used by
      ``FactStore.transact`` for cross-process id-allocation safety;
    - :meth:`log_version` / ``facts_df(as_of_version=...)`` —
      log-versioned time travel;
    - :meth:`bulk_append_df` — executor-side big appends (manifest commit
      of Spark-written files), with optional per-stream epoch tracking
      for exactly-once streaming ingest (streaming/stream.py
      ``stream_facts_to_txlog``);
    - :meth:`checkpoint` / :meth:`restore` / :meth:`vacuum` — log
      compaction, head rollback-as-a-commit, orphan GC.

    `protocol` selects the atomic publish primitive (default POSIX link;
    pass :class:`ConditionalPutProtocol` for object-store semantics).
    """

    def __init__(
        self,
        spark,
        path: str,
        protocol: Optional[CommitProtocol] = None,
        maintain_every: Optional[int] = None,
        vacuum_retention_seconds: float = 3600.0,
        truncate_log: bool = False,
    ):
        self.spark = spark
        self.path = path
        self.log_dir = os.path.join(path, "_txlog")
        self.data_dir = os.path.join(path, "data")
        os.makedirs(self.log_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)
        self.protocol = protocol or PosixLinkProtocol()
        # auto-maintenance policy (see maintain()); None = manual only
        self.maintain_every = maintain_every
        self.vacuum_retention_seconds = vacuum_retention_seconds
        self.truncate_log = truncate_log
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

    # ---- _last_checkpoint pointer ----------------------------------------
    #
    # Without it every read re-parses the WHOLE log — O(total commits),
    # forever, even after compaction. The pointer (same role as Delta's
    # _last_checkpoint file) lets readers start at the newest replaces_all
    # manifest: read cost becomes O(commits since last checkpoint). It is
    # ADVISORY, not part of the commit protocol: written last-writer-wins
    # after a successful checkpoint CAS, validated against the real
    # manifest on read, and a stale/missing/corrupt pointer only costs a
    # full log scan (never correctness).

    @property
    def _lc_path(self) -> str:
        return os.path.join(self.log_dir, "_last_checkpoint")

    def _write_last_checkpoint(self, version: int) -> None:
        tmp = os.path.join(self.log_dir, f".lc.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(json.dumps({"version": version}))
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._lc_path)

    def _read_last_checkpoint(self) -> int:
        """Version of the newest known checkpoint, 0 if none/unusable.
        Validated: the named manifest must exist and carry replaces_all
        (a concurrent-checkpoint race can leave the pointer at an OLDER
        checkpoint, which is still a correct scan start)."""
        try:
            with open(self._lc_path) as f:
                v = int(json.load(f)["version"])
            if self._read_manifest(v).get("replaces_all"):
                return v
        except (OSError, ValueError, KeyError, json.JSONDecodeError):
            pass
        return 0

    def _head(self) -> Optional[dict]:
        # a manifest listed as head can vanish if a concurrent
        # checkpoint + aggressive vacuum land between the listing and
        # the read — by then a NEWER head exists, so re-list and retry
        for _ in range(5):
            v = self.log_version()
            if not v:
                return None
            try:
                return self._read_manifest(v)
            except FileNotFoundError:
                continue
        # sustained checkpoint+truncation churn: surface the protocol-level
        # error, never a raw OSError (callers retry CommitConflict)
        try:
            return self._read_manifest(self.log_version())
        except FileNotFoundError:
            raise CommitConflict(
                "head manifest kept vanishing under concurrent "
                "checkpoint + log truncation"
            ) from None

    def _try_commit(self, manifest: dict, version: int) -> bool:
        """Atomically publish `manifest` as log version `version` via the
        pluggable put-if-absent primitive. False = another writer won the
        version — the CAS at the heart of the protocol."""
        data = json.dumps(manifest, separators=(",", ":")).encode()
        return self.protocol.put_if_absent(self._manifest_path(version), data)

    def _build_manifest(
        self,
        parent: Optional[dict],
        files: list[dict],
        rows_stats: dict,
        stream_epoch: Optional[tuple[str, int]] = None,
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
        streams = dict(parent.get("streams", {})) if parent else {}
        if stream_epoch is not None:
            sid, epoch = stream_epoch
            streams[sid] = max(int(epoch), streams.get(sid, -1))
        return {
            "files": files,
            # rows THIS commit added (None when unknown — e.g. a
            # checkpoint rewrite); the manifest-level total is the
            # honest aggregate, per-file entries are all-real (pyarrow
            # single-file path) or all-None (Spark multi-file staging)
            "rows": rows_stats.get("n"),
            "max_id": max(p_max, rows_stats["max_id"]),
            "latest_tx": max(p_tx, rows_stats["latest_tx"]),
            "any_retraction": p_retr or rows_stats["any_retraction"],
            "tx_state": tx_state,
            "streams": streams,
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
            "n": len(rows),
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
        full = os.path.join(self.data_dir, name)
        pq.write_table(table, full)
        # the manifest that references this file is fsynced before publish;
        # the file itself must be durable FIRST or power loss can leave a
        # visible manifest naming a vanished file (same ordering rule as
        # _publish_staged applies to Spark-written files)
        _fsync_file(full)
        _fsync_dir(self.data_dir)
        return {"name": name, "rows": len(rows)}

    def _publish_staged(self, staging: str) -> list[dict]:
        """Move Spark-written part files out of a staging dir into data/
        under fresh uuid names, fsyncing each file and the data dir so the
        about-to-be-committed manifest never outlives its data on disk."""
        files = []
        for name in sorted(os.listdir(staging)):
            if name.endswith(".parquet"):
                final = f"{uuid.uuid4().hex}.parquet"
                dst = os.path.join(self.data_dir, final)
                os.rename(os.path.join(staging, name), dst)
                _fsync_file(dst)
                files.append({"name": final, "rows": None})
        if files:
            _fsync_dir(self.data_dir)
        for name in os.listdir(staging):
            os.unlink(os.path.join(staging, name))
        os.rmdir(staging)
        return files

    # ---- writes -----------------------------------------------------------

    def commit_rows(self, rows: Iterable[tuple], based_on_version: int) -> bool:
        """Compare-and-swap append: commit `rows` as version
        based_on_version+1, or return False if another writer got there
        first (the caller must re-read max_id and re-allocate ids).
        A lost race unlinks the just-written data file — it is private to
        this writer and provably unreferenced, and the retry will write a
        fresh file with re-based ids anyway (no orphan accumulation under
        contention)."""
        rows = list(rows)
        f = self._write_data_file(rows)
        parent = None
        if based_on_version:
            try:
                parent = self._read_manifest(based_on_version)
            except FileNotFoundError:
                # the base was truncated by a concurrent checkpoint +
                # aggressive vacuum — a newer head exists, so this CAS
                # is lost by definition; report it as a clean loss
                try:
                    os.unlink(os.path.join(self.data_dir, f["name"]))
                except OSError:
                    pass
                return False
        manifest = self._build_manifest(parent, [f], self._rows_stats(rows))
        if self._try_commit(manifest, based_on_version + 1):
            return True
        # lost the race — reclaim the private data file before the retry
        try:
            os.unlink(os.path.join(self.data_dir, f["name"]))
        except OSError:
            pass
        return False

    def append(self, rows: Iterable[tuple], max_retries: int = 64) -> None:
        """Raw append (seed path): the rows' ids are the caller's problem,
        so a conflict only needs the manifest re-based, not the data."""
        rows = list(rows)
        f = self._write_data_file(rows)
        stats = self._rows_stats(rows)
        for _ in range(max_retries):
            head_v = self.log_version()
            try:
                parent = self._read_manifest(head_v) if head_v else None
            except FileNotFoundError:
                continue  # head truncated under us — re-list and retry
            if self._try_commit(self._build_manifest(parent, [f], stats), head_v + 1):
                return
        raise CommitConflict(f"append lost the commit race {max_retries} times")

    def bulk_append_df(
        self,
        df,
        max_retries: int = 64,
        stream_epoch: Optional[tuple[str, int]] = None,
    ) -> bool:
        """Executor-side big append: Spark writes the parquet files to a
        staging dir, then one manifest commit makes them all visible
        atomically (append-by-manifest — the 100 TB ingest path; no
        driver materialization).

        `stream_epoch=(stream_id, epoch)` makes the commit IDEMPOTENT per
        (stream, epoch): the manifest records the stream's last committed
        epoch cumulatively, and a replayed epoch (<= the recorded one) is
        skipped without committing — the exactly-once half of the
        streaming transactor (stream.py stream_facts_to_txlog); Spark's
        checkpoint provides the at-least-once half. An EMPTY input
        commits an explicit zero-file manifest ONLY when there is an
        epoch to record (an empty micro-batch must still advance its
        stream's epoch); with no stream_epoch an empty frame is a pure
        no-op — no version churn for a no-op batch write. Returns True
        if a commit happened, False if skipped as a replay/no-op."""
        from pyspark.sql import functions as F

        from unifydb_spark.values import FACT_SCHEMA

        # a mismatched frame would commit files facts_df() silently
        # null-coerces on read — corrupting the store with no error at
        # write time; fail the commit instead
        expected = [(f.name, f.dataType) for f in FACT_SCHEMA.fields]
        got = [(f.name, f.dataType) for f in df.schema.fields]
        if got != expected:
            raise ValueError(
                f"bulk_append_df: frame schema {got} does not match "
                f"FACT_SCHEMA {expected}"
            )
        if stream_epoch is not None:
            sid, epoch = stream_epoch
            head = self._head()
            if head and head.get("streams", {}).get(sid, -1) >= int(epoch):
                return False  # replayed micro-batch: already committed
        staging = os.path.join(self.data_dir, f".stage.{uuid.uuid4().hex}")
        # the manifest stats ride the WRITE job via the Observation API —
        # no second scan of the staged data (measured: the re-read tripled
        # bulk-append wall time at ~1M rows)
        from pyspark.sql import Observation

        obs = Observation()
        df.observe(
            obs,
            F.greatest(
                F.max("e"), F.max("tx"), F.coalesce(F.max("v_ref"), F.lit(0))
            ).alias("mx"),
            F.max("tx").alias("mtx"),
            F.min("added").alias("all_added"),
            F.collect_set("tx").alias("txs"),
            F.count(F.lit(1)).alias("n"),
        ).write.parquet(staging)
        agg = obs.get
        if agg["n"] == 0:
            # nothing to publish: drop the staging dir, and commit a
            # zero-file manifest only when there is an epoch to record
            for name in os.listdir(staging):
                os.unlink(os.path.join(staging, name))
            os.rmdir(staging)
            if stream_epoch is None:
                return False
            files = []
        else:
            files = self._publish_staged(staging)
        # bound the distinct-tx set carried in the manifest: 0/1 distinct
        # txs keep the exact value (the `clean` fast path needs only that);
        # more collapse to "multi" anyway.
        txs = agg["txs"] or []
        stats = {
            "max_id": agg["mx"] or 0,
            "latest_tx": agg["mtx"] or 0,
            "any_retraction": not bool(agg["all_added"]) if agg["n"] else False,
            "txs": sorted(txs)[:2],
            "n": int(agg["n"]),
        }
        for _ in range(max_retries):
            head_v = self.log_version()
            try:
                parent = self._read_manifest(head_v) if head_v else None
            except FileNotFoundError:
                continue  # head truncated under us — re-list and retry
            if stream_epoch is not None and parent:
                sid, epoch = stream_epoch
                if parent.get("streams", {}).get(sid, -1) >= int(epoch):
                    # another attempt of the SAME epoch won the race
                    for fobj in files:
                        try:
                            os.unlink(os.path.join(self.data_dir, fobj["name"]))
                        except OSError:
                            pass
                    return False
            m = self._build_manifest(parent, files, stats, stream_epoch)
            if self._try_commit(m, head_v + 1):
                return True
        raise CommitConflict(f"bulk append lost the commit race {max_retries} times")

    # ---- reads ------------------------------------------------------------

    def _live_entries(self, as_of_version: Optional[int] = None) -> list[dict]:
        """The live manifest file ENTRIES (name/rows dicts) at a log
        version — the shared resolution behind facts_df and restore.
        A listed manifest can vanish mid-scan if a concurrent
        checkpoint + aggressive vacuum truncate the log — re-list and
        retry (bounded), exactly like the writer loops do."""
        for _ in range(5):
            try:
                return self._live_entries_once(as_of_version)
            except FileNotFoundError:
                continue
        try:
            return self._live_entries_once(as_of_version)
        except FileNotFoundError:
            raise CommitConflict(
                "manifest listing kept vanishing under concurrent "
                "checkpoint + log truncation"
            ) from None

    def _live_entries_once(
        self, as_of_version: Optional[int] = None
    ) -> list[dict]:
        versions = self._list_versions()
        if as_of_version is not None:
            if versions and 0 < as_of_version < versions[0] and versions[0] > 1:
                raise ValueError(
                    f"time travel to version {as_of_version}: the log was "
                    f"truncated at version {versions[0]} (vacuum with "
                    "retain_before_checkpoint=False forfeits older history)"
                )
            versions = [v for v in versions if v <= as_of_version]
        # skip ahead to the newest known checkpoint — only manifests at or
        # after it can contribute files (replaces_all), so the scan is
        # O(commits since checkpoint), not O(all commits ever)
        lc = self._read_last_checkpoint()
        if lc and (as_of_version is None or lc <= as_of_version):
            versions = [v for v in versions if v >= lc]
        entries: list[dict] = []
        start = 0
        manifests = [self._read_manifest(v) for v in versions]
        # a checkpoint manifest replaces everything before it
        for i, m in enumerate(manifests):
            if m.get("replaces_all"):
                start = i
        for m in manifests[start:]:
            entries.extend(m["files"])
        return entries

    def _live_files(self, as_of_version: Optional[int] = None) -> list[str]:
        return [
            os.path.join(self.data_dir, f["name"])
            for f in self._live_entries(as_of_version)
        ]

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

    def history(self, limit: Optional[int] = None) -> list[dict]:
        """Commit history, newest first (the DESCRIBE HISTORY
        introspection surface): one dict per log version with the
        version number, operation kind (append / checkpoint / restore),
        writer identity, commit timestamp, file count and the
        cumulative stats. Reads only manifests — no Spark job."""
        versions = self._list_versions()
        if limit is not None:
            versions = versions[-int(limit):]
        out = []
        for v in reversed(versions):
            m = self._read_manifest(v)
            if m.get("restored_from") is not None:
                op = "restore"
            elif m.get("replaces_all"):
                op = "checkpoint"
            else:
                op = "append"
            out.append(
                {
                    "version": v,
                    "operation": op,
                    "restored_from": m.get("restored_from"),
                    "writer": m.get("writer"),
                    "ts_millis": m.get("ts_millis"),
                    "n_files": len(m["files"]),
                    "rows": m.get("rows"),
                    "max_id": m["max_id"],
                    "latest_tx": m["latest_tx"],
                    "any_retraction": m["any_retraction"],
                    "streams": m.get("streams", {}),
                }
            )
        return out

    def last_stream_epoch(self, stream_id: str) -> int:
        """Last epoch committed for `stream_id`, -1 if none — the O(1)
        manifest read streaming exactly-once dedup rests on."""
        head = self._head()
        if not head:
            return -1
        return int(head.get("streams", {}).get(stream_id, -1))

    def attr_types(self) -> dict[str, set]:
        out: dict[str, set] = {}
        for r in self.facts_df().select("a", "v_type").distinct().collect():
            out.setdefault(r["a"], set()).add(r["v_type"])
        return out

    # ---- maintenance --------------------------------------------------------

    def checkpoint(
        self, max_retries: int = 16, sort_cols: tuple[str, ...] = ("a", "e", "tx")
    ) -> int:
        """Rewrite the live facts as one consolidated, sorted file set and
        commit a `replaces_all` manifest. Readers of newer versions touch
        only the checkpoint's files (small-file compaction); older
        versions remain readable because nothing is deleted — vacuum()
        reclaims space separately. Returns the new log version.

        Default sort (a, e, tx) is the measured winner of the repo's own
        zone-map advisor over the q01-q18 pattern workload
        (scripts/layout_advisor.py, table in SCALE.md): pattern queries
        constrain `a` first (attribute scans are AVET-shaped), so
        attribute-major clustering prunes the most row groups.

        Commits that land MID-REWRITE are re-based in, not dropped:
        the checkpoint's files replace only the versions it actually read
        (<= base_v), so each retry folds the (base_v, head_v] manifests'
        file lists in after the compacted set and adopts the new head's
        cumulative stats, then CASes at head_v+1 — the standard
        lakehouse compaction-vs-writer protocol (a checkpoint never
        blocks or loses a concurrent writer). EXCEPTION: a concurrent
        manifest that is itself `replaces_all` (another checkpoint, or a
        restore) cannot be folded — appending our compacted prefix in
        front of it would duplicate every fact it compacted, or
        resurrect facts a restore rolled back. A superseding
        replaces_all aborts the fold, reclaims the staged files, and
        REDOES the rewrite from the new head (bounded by max_retries)."""
        for _ in range(max_retries):
            base_v = self.log_version()
            if base_v == 0:
                return 0
            df = self.facts_df(as_of_version=base_v).sortWithinPartitions(
                *sort_cols
            )
            staging = os.path.join(self.data_dir, f".stage.{uuid.uuid4().hex}")
            df.write.parquet(staging)
            ckpt_files = self._publish_staged(staging)
            v = self._ckpt_commit(base_v, ckpt_files, max_retries)
            if v is not None:
                return v
            # superseded by a concurrent replaces_all: our compacted
            # prefix is stale — reclaim it and rewrite from the new head
            for fobj in ckpt_files:
                try:
                    os.unlink(os.path.join(self.data_dir, fobj["name"]))
                except OSError:
                    pass
        raise CommitConflict("checkpoint superseded repeatedly")

    def _ckpt_commit(
        self, base_v: int, ckpt_files: list[dict], max_retries: int
    ) -> Optional[int]:
        """CAS a checkpoint manifest for a rewrite of versions <= base_v,
        folding concurrent APPEND manifests in. Returns the committed
        version, or None if a concurrent replaces_all superseded the
        rewrite (the caller must redo it from the new head)."""
        for _ in range(max_retries):
            head_v = self.log_version()
            try:
                head = self._read_manifest(head_v)
                # re-base: concurrent commits in (base_v, head_v] stay live
                # by carrying their file lists after the compacted prefix
                extra_files: list[dict] = []
                for v in range(base_v + 1, head_v + 1):
                    m = self._read_manifest(v)
                    if m.get("replaces_all"):
                        return None  # superseded — folding would corrupt
                    extra_files.extend(m["files"])
            except FileNotFoundError:
                continue  # a concurrent truncation landed — re-list
            manifest = dict(
                head,  # cumulative stats of everything being replaced
                files=ckpt_files + extra_files,
                rows=None,  # a rewrite ADDS no rows; never inherit head's
                replaces_all=True,
                writer=self._writer,
                ts_millis=int(time.time() * 1000),
            )
            manifest.pop("restored_from", None)  # stats adopted, op is ours
            if self._try_commit(manifest, head_v + 1):
                # advisory read-optimization pointer (Delta _last_checkpoint
                # shape); racing checkpoints leave it at SOME valid
                # checkpoint, which readers validate anyway
                self._write_last_checkpoint(head_v + 1)
                return head_v + 1
        raise CommitConflict("checkpoint lost the commit race")

    def restore(self, version: int, max_retries: int = 16) -> int:
        """Roll the store's HEAD back to log version `version` by
        committing a new manifest whose file set is exactly that
        version's live set (Delta-RESTORE shape: rollback is a new
        commit, never history rewriting — every version including the
        rolled-back ones stays time-travel readable until vacuumed).

        Stats in the restore manifest: `any_retraction`/`tx_state`
        describe the restored VISIBLE facts (they come from the target
        version), while `max_id`/`latest_tx` keep the head's high-water
        marks — id/tx allocation is monotone across a restore, so facts
        transacted afterwards can never collide with rolled-back ids
        that remain readable in history. Concurrent commits that land
        during the restore are rolled back BY it (that is what restore
        means); the CAS retry re-reads the head only to keep the
        allocation marks current. Raises ValueError if `version` was
        truncated by an aggressive vacuum, or if any of its data files
        were reclaimed (same contract as Delta RESTORE's missing-file
        error — committing a head that references vacuumed files would
        corrupt the store). Returns the new version.

        TOCTOU guard: the missing-file check above races an aggressive
        concurrent vacuum — between the existence scan and the CAS, a
        vacuum past its retention window can reclaim the target's
        (currently unreferenced) data files, and the CAS would then
        publish a head naming deleted files. After a successful CAS the
        file set is re-verified; on loss the store ROLLS FORWARD (a
        follow-up replaces_all commit re-publishing the pre-restore
        head's live set) and raises ValueError — readers of the broken
        intermediate version get the same missing-file failure they
        would get from any vacuumed time-travel read, and the head is
        valid again one version later. Operationally: do not run
        restore concurrently with vacuum(retain_before_checkpoint=
        False, retention_seconds=0); the default 1h retention window
        makes the race practically unreachable."""
        try:
            target = self._read_manifest(version)
            files = self._live_entries(as_of_version=version)
        except FileNotFoundError:
            raise ValueError(
                f"restore to version {version}: its manifests were "
                "truncated by an aggressive vacuum"
            ) from None
        missing = [
            f["name"]
            for f in files
            if not os.path.exists(os.path.join(self.data_dir, f["name"]))
        ]
        if missing:
            raise ValueError(
                f"restore to version {version}: {len(missing)} of its "
                f"data files were reclaimed by vacuum (e.g. {missing[0]}) "
                "— that history is gone"
            )
        for _ in range(max_retries):
            head_v = self.log_version()
            try:
                head = self._read_manifest(head_v)
            except FileNotFoundError:
                continue  # head truncated under us — re-list and retry
            manifest = dict(
                head,
                files=files,
                rows=None,
                replaces_all=True,
                any_retraction=target["any_retraction"],
                tx_state=target["tx_state"],
                restored_from=version,
                writer=self._writer,
                ts_millis=int(time.time() * 1000),
            )
            if self._try_commit(manifest, head_v + 1):
                lost = [
                    f["name"]
                    for f in files
                    if not os.path.exists(
                        os.path.join(self.data_dir, f["name"])
                    )
                ]
                if lost:
                    rolled = self._roll_forward(head_v, head_v + 1)
                    outcome = (
                        "the head was rolled forward to the pre-restore "
                        "state"
                        if rolled
                        else "roll-forward FAILED (CAS exhausted or "
                        "pre-restore history gone) — the head still "
                        "references reclaimed files; verify the head "
                        "and restore manually"
                    )
                    raise ValueError(
                        f"restore to version {version}: {len(lost)} of "
                        f"its data files were reclaimed by a concurrent "
                        f"vacuum mid-restore (e.g. {lost[0]}); {outcome}"
                    )
                self._write_last_checkpoint(head_v + 1)
                return head_v + 1
        raise CommitConflict("restore lost the commit race")

    def _roll_forward(self, to_version: int, broken_v: int) -> bool:
        """Re-publish log version `to_version`'s live state as a new
        replaces_all commit — the recovery path when a just-committed
        restore turned out to reference vacuumed files. Best-effort
        bounded CAS (concurrent commits based on the broken head are
        rolled back with it, exactly like any restore). Returns True
        only when the recovery commit actually landed, so restore()'s
        error message can state the head's real condition instead of
        claiming health after an exhausted CAS or vanished history."""
        try:
            target = self._read_manifest(to_version)
            files = self._live_entries(as_of_version=to_version)
        except (FileNotFoundError, ValueError, CommitConflict):
            return False  # pre-restore history is gone; nothing to publish
        for _ in range(16):
            head_v = self.log_version()
            try:
                head = self._read_manifest(head_v)
            except FileNotFoundError:
                continue
            manifest = dict(
                head,
                files=files,
                rows=None,
                replaces_all=True,
                any_retraction=target["any_retraction"],
                tx_state=target["tx_state"],
                restored_from=to_version,
                writer=self._writer,
                ts_millis=int(time.time() * 1000),
            )
            if self._try_commit(manifest, head_v + 1):
                self._write_last_checkpoint(head_v + 1)
                return True
        return False

    def maintain(
        self,
        checkpoint_every: int = 64,
        vacuum_retention_seconds: float = 3600.0,
        truncate_log: bool = False,
    ) -> dict:
        """Config-driven maintenance policy (VERDICT r10 ask #5): the
        primitives (checkpoint / vacuum) are hardened and fuzzed but
        nothing scheduled them — without a policy the log listing grows
        O(all commits ever) and crash orphans are reclaimed only by a
        manual vacuum. One call applies the policy:

        - CHECKPOINT when >= `checkpoint_every` commits landed since the
          newest checkpoint (compacts small files AND bounds the
          manifest scan; with the _last_checkpoint pointer, read cost
          returns to O(1)-ish after each checkpoint);
        - VACUUM afterwards with `vacuum_retention_seconds` (crash
          orphans older than the window are reclaimed; referenced files
          are never touched). With `truncate_log=True` pre-checkpoint
          manifests are truncated too — bounded log listing at the cost
          of time travel past the checkpoint (Delta's
          logRetentionDuration trade, OFF by default).

        Cheap when idle: one directory listing + one pointer read
        decide "nothing to do" (no Spark job, no manifest parse), so it
        is safe to call after every transact — FactStore does exactly
        that when the backend is constructed with maintain_every
        (see :class:`LogParquetBackend` / cli storage config). Returns
        {"checkpointed": version|None, "vacuumed": [names]}.

        Time-travel contract: with the defaults nothing is deleted that
        any log version references, so history()/facts_df(as_of_version)
        keep working across maintenance; only truncate_log forfeits
        pre-checkpoint versions (facts_df then raises on them, the
        documented vacuum contract)."""
        head_v = self.log_version()
        since = head_v - self._read_last_checkpoint()
        out: dict = {"checkpointed": None, "vacuumed": []}
        if head_v and since >= int(checkpoint_every):
            out["checkpointed"] = self.checkpoint()
            out["vacuumed"] = self.vacuum(
                retain_before_checkpoint=not truncate_log,
                retention_seconds=vacuum_retention_seconds,
            )
        return out

    def maybe_maintain(self) -> Optional[dict]:
        """Apply the constructor-configured maintenance policy if one is
        set (maintain_every); the after-commit hook FactStore.transact
        calls. No-op (None) when unconfigured or when this handle has no
        SparkSession (cross-process plain-Python writers can commit but
        cannot run the checkpoint's rewrite job)."""
        if not self.maintain_every or self.spark is None:
            return None
        return self.maintain(
            checkpoint_every=self.maintain_every,
            vacuum_retention_seconds=self.vacuum_retention_seconds,
            truncate_log=self.truncate_log,
        )

    def vacuum(
        self,
        retain_before_checkpoint: bool = True,
        retention_seconds: float = 3600.0,
    ) -> list[str]:
        """Delete data files no LIVE manifest references — crash orphans
        and, if a checkpoint exists and retain_before_checkpoint=False,
        files only pre-checkpoint versions reference (which forfeits
        time travel to those versions). Returns the deleted names.

        `retention_seconds` guards the commit protocol's write-order
        (data file BEFORE manifest): an unreferenced file younger than
        the window may belong to an IN-FLIGHT commit whose manifest has
        not landed yet — deleting it would corrupt the next committed
        version (the same reason Delta's VACUUM has a retention check).
        Files are judged by mtime; pass 0.0 only when all writers are
        known quiescent (as the crash-cleanup tests do).

        With retain_before_checkpoint=False the pre-checkpoint MANIFESTS
        are truncated too (subject to the same retention window): their
        history is already forfeited once their data files go, and
        without truncation the log listing itself grows O(all commits
        ever) — this is the log-retention half of Delta's
        VACUUM/logRetentionDuration split. Time travel below the
        truncation point then raises (facts_df checks)."""
        versions = self._list_versions()
        manifests = [self._read_manifest(v) for v in versions]
        ckpt_i = 0
        for i, m in enumerate(manifests):
            if m.get("replaces_all"):
                ckpt_i = i
        keep_from = 0 if retain_before_checkpoint else ckpt_i
        referenced: set[str] = set()
        for m in manifests[keep_from:]:
            referenced.update(f["name"] for f in m["files"])
        deleted = []
        cutoff = time.time() - retention_seconds
        for name in os.listdir(self.data_dir):
            if name.endswith(".parquet") and name not in referenced:
                full = os.path.join(self.data_dir, name)
                try:
                    if os.path.getmtime(full) > cutoff:
                        continue  # possibly an in-flight commit's data
                    os.unlink(full)
                except FileNotFoundError:
                    continue
                deleted.append(name)
        if not retain_before_checkpoint and ckpt_i:
            for v in versions[:ckpt_i]:
                p = self._manifest_path(v)
                try:
                    if os.path.getmtime(p) > cutoff:
                        continue  # an active reader may still be on it
                    os.unlink(p)
                except FileNotFoundError:
                    continue
        return deleted
