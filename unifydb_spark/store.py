"""The fact store: an append-only EAVT table + time-travel snapshot views.

Reference parity map (see SURVEY.md §1, §2.3, §2.4):
 - facts are 5-tuples [e a v tx added?] (reference src/unifydb/facts.clj:3-26)
   stored here as one DataFrame in FACT_SCHEMA (typed-value union, values.py);
 - the reference keeps three covering B-tree sort orders EAVT/AVET/VAET
   (src/unifydb/storage.clj:57-68) and picks one per pattern
   (src/unifydb/storage.clj:31-46). On Spark the indexes are *virtual*:
   `facts(attr=...)` narrows to an attribute slice at plan-construction time
   and Catalyst pushes e/v predicates into the parquet scan — index selection
   becomes predicate pushdown + column pruning;
 - a "database value" is `{tx-id, historical}` (src/unifydb/server.clj:23);
   `Db.visible_facts()` is the reference's post-scan visibility filter +
   retraction collapse + cardinality resolution
   (src/unifydb/storage.clj:46, src/unifydb/query.clj:132-204) expressed as
   window functions, computed once per pattern instead of per probed frame;
 - the transactor (src/unifydb/transact.clj:98-137) is `FactStore.transact`:
   map-form expansion, tempid allocation, tx metadata, transforms/filters,
   single atomic append.

Scale notes (100 TB): the snapshot dedup windows shuffle on (e, a[, value]) —
they only run when the store actually contains retractions / multi-tx
re-asserts (`clean` fast path otherwise, like Delta's no-deletes read path).
Bulk-ingested analytics tables take the clean path and never shuffle.
"""

from __future__ import annotations

import datetime as _dt
import itertools
import time
from dataclasses import dataclass, field, replace
from typing import Any, Callable, Iterable, Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from unifydb_spark.values import FACT_SCHEMA, Ref, V_COLS, encode_value

LATEST = "latest"

TX_TEMPID = "unifydb.tx"
TX_INSTANT_ATTR = "unifydb/txInstant"
SCHEMA_ATTR = "unifydb/schema"
CARDINALITY_ATTR = "unifydb/cardinality"
CARDINALITY_MANY = "cardinality/many"


def norm_attr(a: str) -> str:
    """Attributes are EDN keywords in the reference (':employee/age'); we
    store them colon-stripped."""
    if not isinstance(a, str) or not a:
        raise TypeError(f"attribute must be a non-empty string, got {a!r}")
    return a[1:] if a.startswith(":") else a


def _norm_value(v: Any) -> Any:
    """EDN keyword values (':foo') normalize to colon-stripped strings —
    matching how query constants parse — and, being explicitly keywords,
    they can never collide with a tempid string (the reference separates
    the two by type; the Python surface separates them by the ':')."""
    if isinstance(v, str) and v.startswith(":"):
        return v[1:]
    return v


class MemoryBackend:
    """Driver-side fact log (the reference's in-memory KV store,
    src/unifydb/kvstore/memory.clj:5-25). Facts live as Python rows and are
    shipped to the cluster as one cached DataFrame per version."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.rows: list[tuple] = []
        self._df: Optional[DataFrame] = None
        self._version = 0
        self._df_version = -1
        self.has_retractions = False
        self._txs: set[int] = set()

    def append(self, rows: Iterable[tuple]) -> None:
        rows = list(rows)
        self.rows.extend(rows)
        for r in rows:
            if not r[-1]:
                self.has_retractions = True
            self._txs.add(r[-2])
        self._version += 1

    def facts_df(self) -> DataFrame:
        if self._df is None or self._df_version != self._version:
            self._df = self.spark.createDataFrame(self.rows, schema=FACT_SCHEMA)
            self._df_version = self._version
        return self._df

    @property
    def clean(self) -> bool:
        return not self.has_retractions and len(self._txs) <= 1

    def max_id(self) -> int:
        m = 0
        for r in self.rows:
            m = max(m, r[0], r[-2])
            if r[2] == "ref" and r[7] is not None:
                m = max(m, r[7])
        return m

    def latest_tx(self) -> int:
        return max(self._txs) if self._txs else 0

    def attr_types(self) -> dict[str, set]:
        out: dict[str, set] = {}
        for r in self.rows:
            out.setdefault(r[1], set()).add(r[2])
        return out


class ParquetBackend:
    """Parquet-directory fact log: each transaction appends files atomically
    (the reference's single KV `commit!`, src/unifydb/kvstore.clj:105-121 /
    storage.clj:12-29; on a real deployment this would be a Delta table —
    plain parquet keeps the container dependency-free)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._version = 0
        self._stats: Optional[tuple] = None  # (version, max_id, latest_tx, clean)

    def _exists(self) -> bool:
        import os

        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        )

    def append(self, rows: Iterable[tuple]) -> None:
        df = self.spark.createDataFrame(list(rows), schema=FACT_SCHEMA)
        df.write.mode("append").parquet(self.path)
        self._version += 1

    def facts_df(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame([], schema=FACT_SCHEMA)
        return self.spark.read.schema(FACT_SCHEMA).parquet(self.path)

    def _compute_stats(self) -> tuple:
        if self._stats is None or self._stats[0] != self._version:
            if not self._exists():
                self._stats = (self._version, 0, 0, True)
            else:
                row = self.facts_df().agg(
                    F.greatest(
                        F.max("e"), F.max("tx"), F.coalesce(F.max("v_ref"), F.lit(0))
                    ).alias("mx"),
                    F.max("tx").alias("mtx"),
                    F.min("added").alias("all_added"),
                    F.countDistinct("tx").alias("ntx"),
                ).collect()[0]
                self._stats = (
                    self._version,
                    row["mx"] or 0,
                    row["mtx"] or 0,
                    bool(row["all_added"]) and row["ntx"] <= 1,
                )
        return self._stats

    @property
    def clean(self) -> bool:
        return self._compute_stats()[3]

    @property
    def has_retractions(self) -> bool:
        return not self._compute_stats()[3]

    def max_id(self) -> int:
        return self._compute_stats()[1]

    def latest_tx(self) -> int:
        return self._compute_stats()[2]

    def attr_types(self) -> dict[str, set]:
        out: dict[str, set] = {}
        for r in self.facts_df().select("a", "v_type").distinct().collect():
            out.setdefault(r["a"], set()).add(r["v_type"])
        return out

    def compact(self, target_files: Optional[int] = None) -> None:
        """Rewrite the fact log clustered by (a, e, tx).

        Every transaction appends small files; at scale the log fragments
        and pattern scans lose locality. Clustering by attribute first
        mirrors the reference's AVET index (src/unifydb/storage.clj:57-68):
        a concrete-attribute pattern then touches a contiguous file range
        and parquet min/max stats on `a` prune everything else. (On Delta
        this is OPTIMIZE ZORDER; on plain parquet it is a sorted rewrite
        with a directory swap.)"""
        import os
        import shutil

        if not self._exists():
            return
        df = self.facts_df().sortWithinPartitions("a", "e", "tx")
        if target_files is not None:
            df = self.facts_df().repartitionByRange(
                target_files, "a", "e"
            ).sortWithinPartitions("a", "e", "tx")
        tmp = self.path.rstrip("/") + ".compact.tmp"
        old = self.path.rstrip("/") + ".compact.old"
        shutil.rmtree(tmp, ignore_errors=True)
        df.write.parquet(tmp)
        shutil.rmtree(old, ignore_errors=True)
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)
        self._version += 1


class DataFrameBackend:
    """A read-only fact log defined by an arbitrary DataFrame in
    FACT_SCHEMA — the scalable way to derive a versioned fact store from an
    existing event log (e.g. the events table: tx = event id) without
    materializing anything. Stats are computed lazily once."""

    def __init__(
        self,
        spark: SparkSession,
        df: DataFrame,
        clean: bool = False,
        has_retractions: Optional[bool] = None,
    ):
        self.spark = spark
        self._df = df
        self.clean = clean
        self.has_retractions = (not clean) if has_retractions is None else has_retractions
        self._version = 0
        self._stats: Optional[tuple] = None

    def facts_df(self) -> DataFrame:
        return self._df

    def append(self, rows):
        raise NotImplementedError("DataFrameBackend is read-only")

    def _compute(self):
        if self._stats is None:
            row = self._df.agg(
                F.greatest(
                    F.max("e"), F.max("tx"), F.coalesce(F.max("v_ref"), F.lit(0))
                ).alias("mx"),
                F.max("tx").alias("mtx"),
            ).collect()[0]
            self._stats = (row["mx"] or 0, row["mtx"] or 0)
        return self._stats

    def max_id(self) -> int:
        return self._compute()[0]

    def latest_tx(self) -> int:
        return self._compute()[1]

    def attr_types(self) -> dict[str, set]:
        out: dict[str, set] = {}
        for r in self._df.select("a", "v_type").distinct().collect():
            out.setdefault(r["a"], set()).add(r["v_type"])
        return out


@dataclass(frozen=True)
class Db:
    """A database value: the facts visible as of `tx_id` (reference
    src/unifydb/server.clj:23, src/unifydb/query.clj:216-229)."""

    store: "FactStore"
    tx_id: Union[int, str] = LATEST
    historical: bool = False

    def as_of(self, tx_id: int) -> "Db":
        return replace(self, tx_id=tx_id)

    def history(self) -> "Db":
        return replace(self, historical=True)

    def visible_facts(self, attr: Optional[str] = None) -> DataFrame:
        return self.store.snapshot(self.tx_id, self.historical, attr=attr)

    def cardinality_many_attrs(self) -> frozenset:
        return self.store.cardinality_many_attrs(self.tx_id)

    def attr_types(self) -> dict[str, set]:
        return self.store.attr_types()


class FactStore:
    """Append-only EAVT store with a time-traveling snapshot view."""

    def __init__(self, spark: SparkSession, backend=None, path: Optional[str] = None):
        self.spark = spark
        if backend is None:
            backend = (
                ParquetBackend(spark, path) if path else MemoryBackend(spark)
            )
        self.backend = backend
        # Pluggable tx pipeline hooks (reference transact/transforms.clj,
        # transact/filters.clj): transforms rewrite statements pre-commit,
        # filters redact the outgoing tx report. The reference installs its
        # auth hooks unconditionally — mirror that default.
        from unifydb_spark.auth import filter_auth_facts, new_user_transform

        self.transforms: list[Callable[[list], list]] = [new_user_transform]
        self.report_filters: list[Callable[[dict], dict]] = [filter_auth_facts]
        self._schema_cache: dict = {}
        self._attr_types_cache: Optional[tuple] = None
        # Relation-producing query functions (compile._apply_table_fn):
        # name -> callable(db, keys_df, *params) returning
        # (DataFrame(__tf_in, __tf_out), out_repr). Registered through
        # Engine.register_table_fn; empty by default.
        self.table_fns: dict[str, Callable] = {}
        # The reference serializes ALL writes through one transactor
        # thread (src/unifydb/transact.clj:116-137; the B-trees say
        # "NOT THREAD SAFE, only write in the single-threaded
        # transactor", btree.clj:2-4). Mirror that contract in-process:
        # transact() holds this lock across id allocation + append, so
        # concurrent callers serialize — distinct tx-ids, both visible.
        # Cross-PROCESS writers serialize through the optimistic commit
        # log when the backend provides one (txlog.LogParquetBackend:
        # CAS-on-next-log-version with id re-allocation on conflict);
        # plain MemoryBackend/ParquetBackend remain single-process.
        import threading

        self._tx_lock = threading.Lock()

    # ---- reads -----------------------------------------------------------

    def db(self, tx_id: Union[int, str] = LATEST, historical: bool = False) -> Db:
        return Db(self, tx_id, historical)

    def facts(self, attr: Optional[str] = None) -> DataFrame:
        """Raw fact tuples, optionally narrowed to one attribute (the
        reference's index selection, src/unifydb/storage.clj:31-46 — here
        either a backend-provided single-attribute projection or a
        pushed-down filter)."""
        if attr is not None and hasattr(self.backend, "facts_for_attr"):
            return self.backend.facts_for_attr(attr)
        df = self.backend.facts_df()
        if attr is not None:
            df = df.filter(F.col("a") == attr)
        return df

    def snapshot(
        self,
        tx_id: Union[int, str] = LATEST,
        historical: bool = False,
        attr: Optional[str] = None,
    ) -> DataFrame:
        """The visible-facts view: tx visibility filter + retraction collapse
        + cardinality resolution (reference src/unifydb/query.clj:132-204 and
        src/unifydb/storage.clj:43-46), as window functions.

        Semantics notes vs the reference:
         - a value is live iff the most recent fact for (e,a,value) is an
           assert, with a retract outranking an assert in the same tx
           (cmp-fact-versions src/unifydb/query.clj:132-150). The reference's
           multiset pairing (a dangling retract can cancel an unrelated add)
           is treated as set semantics here.
         - cardinality-one picks the live value of the *latest tx*
           (last-writer-wins); the reference's sort makes the max value win
           when two live values coexist without retraction — an artifact its
           tests never exercise (documented divergence).
        """
        df = self.facts(attr=attr)
        if tx_id != LATEST:
            df = df.filter(F.col("tx") <= F.lit(int(tx_id)))
        if historical:
            return df
        if not self.backend.clean:
            if self.backend.has_retractions:
                w = Window.partitionBy("e", "a", *V_COLS).orderBy(
                    F.col("tx").desc(), F.col("added").asc()
                )
                df = (
                    df.withColumn("_rn", F.row_number().over(w))
                    .filter((F.col("_rn") == 1) & F.col("added"))
                    .drop("_rn")
                )
            # cardinality-one: keep only the latest live assertion per (e, a)
            many = self.cardinality_many_attrs(tx_id)
            w1 = Window.partitionBy("e", "a").orderBy(F.col("tx").desc())
            keep_many = (
                F.col("a").isin(*sorted(many)) if many else F.lit(False)
            )
            df = (
                df.withColumn("_rn1", F.row_number().over(w1))
                .filter(keep_many | (F.col("_rn1") == 1))
                .drop("_rn1")
            )
        return df

    def tx_as_of(self, instant: Union[int, _dt.datetime]) -> int:
        """The newest transaction whose txInstant <= instant (epoch millis
        or datetime) — wall-clock time travel: db(store.tx_as_of(t)).
        The reference notes tx-ids 'should really be timestamps'
        (src/unifydb/transact.clj:73-74); the txInstant metadata fact (T4)
        provides exactly this mapping."""
        if isinstance(instant, _dt.datetime):
            instant = int(instant.timestamp() * 1000)
        row = (
            self.facts(TX_INSTANT_ATTR)
            .filter(F.col("v_long") <= int(instant))
            .agg(F.max("tx").alias("tx"))
            .collect()[0]
        )
        return int(row["tx"] or 0)

    def materialize_snapshot(
        self,
        path: str,
        tx_id: Union[int, str] = LATEST,
        partition_by_attr: bool = True,
    ) -> "FactStore":
        """Write the collapsed snapshot view (visibility + retraction +
        cardinality resolution already applied) as a parquet fact log and
        return a FactStore over it.

        Scale rationale: a dirty log pays the dedup windows on every
        pattern scan; analyses that hammer one as-of point should pay
        them once. The result is `clean` by construction (single tx, no
        retractions), so every later query takes the no-window fast path;
        `partition_by_attr` lays files out attribute-first (AVET order) so
        attribute patterns prune to their own files."""
        snap_tx = (
            self.backend.latest_tx() if tx_id == LATEST else int(tx_id)
        )
        # stamp every surviving fact with the snapshot tx: the result is a
        # single-tx assert-only log, so the `clean` fast path applies and
        # later reads never pay the dedup windows again
        df = self.snapshot(tx_id).withColumn(
            "tx", F.lit(snap_tx).cast("long")
        ).withColumn("added", F.lit(True))
        if partition_by_attr:
            df = df.sortWithinPartitions("a", "e")
        df.write.mode("errorifexists").parquet(path)
        return FactStore(self.spark, ParquetBackend(self.spark, path))

    def materialize_snapshot_bucketed(
        self,
        table_name: str,
        tx_id: Union[int, str] = LATEST,
        bucket_by: str = "e",
        n_buckets: int = 32,
    ) -> "FactStore":
        """Write the collapsed snapshot as a BUCKETED managed table
        (bucketBy + sortBy on `bucket_by`, Hive-style layout) and return a
        FactStore over it.

        Scale rationale: every multi-pattern query joins fact slices on
        the entity id; with both sides read from the same bucketed table,
        Spark plans those joins and aggregations with NO shuffle on the
        bucketed side (outputPartitioning is known from the bucket spec).
        This is the persistent co-location that `repartition` can only
        provide within one job — the parquet analog of the reference's
        EAVT clustering (src/unifydb/storage.clj:23-27), except the
        cluster key survives restarts and is shared by every reader."""
        snap_tx = (
            self.backend.latest_tx() if tx_id == LATEST else int(tx_id)
        )
        df = self.snapshot(tx_id).withColumn(
            "tx", F.lit(snap_tx).cast("long")
        ).withColumn("added", F.lit(True))
        (
            df.write.mode("errorifexists")
            .format("parquet")
            .bucketBy(n_buckets, bucket_by)
            .sortBy(bucket_by)
            .saveAsTable(table_name)
        )
        backend = DataFrameBackend(
            self.spark, self.spark.table(table_name), clean=True
        )
        return FactStore(self.spark, backend=backend)

    def cardinality_many_attrs(self, tx_id: Union[int, str] = LATEST) -> frozenset:
        """Attributes declared :cardinality/many via schema facts (reference
        src/unifydb/schema.clj:5-15). Cached per (backend version, tx) —
        fixing the reference's re-query-per-pattern TODO (schema.clj:17)."""
        key = (getattr(self.backend, "_version", 0), tx_id)
        if key in self._schema_cache:
            return self._schema_cache[key]
        df = self.facts(SCHEMA_ATTR).unionByName(self.facts(CARDINALITY_ATTR))
        if tx_id != LATEST:
            df = df.filter(F.col("tx") <= F.lit(int(tx_id)))
        rows = df.select("e", "a", "v_str", "tx", "added").collect()
        # collapse add/retract per (e, a, v) in the driver: schema facts are few
        state: dict = {}
        for r in sorted(rows, key=lambda r: (r["tx"], r["added"])):
            state[(r["e"], r["a"], r["v_str"])] = r["added"]
        schema_attr_of: dict = {}
        card_of: dict = {}
        for (e, a, v), live in state.items():
            if not live:
                continue
            if a == SCHEMA_ATTR:
                schema_attr_of[e] = v
            elif a == CARDINALITY_ATTR:
                card_of[e] = v
        many = frozenset(
            norm_attr(schema_attr_of[e])
            for e, c in card_of.items()
            if c in (CARDINALITY_MANY, ":" + CARDINALITY_MANY) and e in schema_attr_of
        )
        self._schema_cache[key] = many
        return many

    def attr_types(self) -> dict[str, set]:
        """attr -> set of v_type tags seen; drives the compiler's static
        type inference for value-position variables."""
        ver = getattr(self.backend, "_version", 0)
        if self._attr_types_cache is None or self._attr_types_cache[0] != ver:
            self._attr_types_cache = (ver, self.backend.attr_types())
        return self._attr_types_cache[1]

    # ---- writes ----------------------------------------------------------

    def seed(self, facts: Iterable[Sequence]) -> "FactStore":
        """Load raw [e a v tx added] tuples (the reference tests seed storage
        directly, test/unifydb/query_test.clj:12-22). e/tx may be ints or
        Ref."""
        rows = []
        for e, a, v, tx, added in facts:
            enc = encode_value(_norm_value(v))
            rows.append(
                (
                    int(e),
                    norm_attr(a),
                    enc["v_type"],
                    enc["v_long"],
                    enc["v_double"],
                    enc["v_str"],
                    enc["v_bool"],
                    enc["v_ref"],
                    enc["v_ts"],
                    enc["v_json"],
                    int(tx),
                    bool(added),
                )
            )
        self.backend.append(rows)
        return self

    def transact(self, tx_data: list, now_millis: Optional[int] = None) -> dict:
        """Run one transaction (reference do-transaction,
        src/unifydb/transact.clj:98-114): tx-metadata statement, map-form
        expansion, transforms, tempid allocation, atomic append.

        Statements: ``["add"|"retract"|":unifydb/add"|":unifydb/retract",
        e, a, v]`` or a map form (dict). String entity ids are tempids,
        resolved consistently across the tx (also in value position) —
        src/unifydb/transact.clj:70-96.

        Returns the tx-report ``{"db_after": Db, "tx_data": [facts],
        "tempids": {str: int}}`` (shape: src/unifydb/transact.clj:109-112).

        Concurrency: serialized per store via `_tx_lock` — the in-process
        equivalent of the reference's single transactor thread
        (transact.clj:116-137). Two threads transacting concurrently get
        distinct tx-ids and both transactions are visible.
        """
        with self._tx_lock:
            return self._transact_serialized(tx_data, now_millis)

    def _transact_serialized(
        self, tx_data: list, now_millis: Optional[int] = None
    ) -> dict:
        if now_millis is None:
            now_millis = int(time.time() * 1000)
        stmts = list(tx_data) + [["add", TX_TEMPID, TX_INSTANT_ATTR, now_millis]]
        stmts = _expand_map_forms(stmts)
        for t in self.transforms:
            stmts = t(stmts)
        raw = []
        for s in stmts:
            op = norm_attr(str(s[0])).split("/")[-1]
            if op == "add":
                raw.append((s[1], norm_attr(s[2]), s[3], True))
            elif op == "retract":
                raw.append((s[1], norm_attr(s[2]), s[3], False))
            else:
                raise ValueError(f"unknown tx operation {s[0]!r}")
        # tempid allocation in first-appearance order (transact.clj:70-96).
        # Backends with a versioned commit log (txlog.LogParquetBackend)
        # support optimistic concurrency across PROCESSES: ids are
        # allocated above the committed max_id, and the commit is a CAS on
        # the next log version — a lost race re-reads max_id and
        # re-allocates, so two independent writer processes serialize with
        # distinct tx-ids, the cross-process analog of the reference's
        # single transactor thread (transact.clj:116-137).
        supports_occ = hasattr(self.backend, "commit_rows")
        for _attempt in range(64):
            base_version = (
                self.backend.log_version() if supports_occ else None
            )
            next_id = self.backend.max_id() + 1
            tempids = {}
            for e, _a, _v, _add in raw:
                if isinstance(e, str) and e not in tempids:
                    tempids[e] = next_id
                    next_id += 1
            tx_id = tempids[TX_TEMPID]
            rows, facts_out = [], []
            for e, a, v, add in raw:
                eid = tempids.get(e, e) if isinstance(e, str) else int(e)
                if isinstance(e, str) and e not in tempids:
                    raise ValueError(f"unresolvable entity id {e!r}")
                if isinstance(v, str):
                    if v.startswith(":"):  # explicit keyword — never a tempid
                        v = v[1:]
                    elif v in tempids:
                        v = Ref(tempids[v])
                enc = encode_value(v)
                rows.append(
                    (
                        int(eid),
                        a,
                        enc["v_type"],
                        enc["v_long"],
                        enc["v_double"],
                        enc["v_str"],
                        enc["v_bool"],
                        enc["v_ref"],
                        enc["v_ts"],
                        enc["v_json"],
                        tx_id,
                        add,
                    )
                )
                facts_out.append([eid, a, v, tx_id, add])
            if supports_occ:
                if self.backend.commit_rows(rows, base_version):
                    break
                # lost the CAS: linear backoff scaled by the attempt and
                # a per-process phase offset so N contending writers
                # de-synchronize instead of re-colliding in lockstep
                import os as _os

                time.sleep(0.002 * (_attempt + 1) * (1 + (_os.getpid() % 7)))
            else:
                self.backend.append(rows)
                break
        else:
            raise RuntimeError("transact: lost the optimistic-commit race 64 times")
        # The transaction IS committed at this point; everything below is
        # post-commit bookkeeping and must not make it look failed.
        self._schema_cache.clear()
        # backend-configured maintenance policy (txlog maintain_every):
        # cheap no-op check when idle, checkpoint+vacuum when due.
        # Best-effort: checkpoint can lose its CAS race (CommitConflict)
        # and vacuum can race a concurrent truncation (FileNotFoundError)
        # — maintenance failure is a deferral, not a transaction failure.
        if hasattr(self.backend, "maybe_maintain"):
            from unifydb_spark.txlog import CommitConflict

            try:
                self.backend.maybe_maintain()
            except (CommitConflict, OSError) as exc:
                import logging

                logging.getLogger(__name__).warning(
                    "post-commit maintenance deferred: %s", exc
                )
        report = {
            "db_after": self.db(tx_id),
            "tx_data": facts_out,
            "tempids": tempids,
        }
        for flt in self.report_filters:
            report = flt(report)
        return report


def _expand_map_forms(tx_data: list) -> list:
    """Map-form (document) statements -> add statements with generated
    tempids (reference map-form->add-forms, src/unifydb/transact.clj:23-55).
    Tempids are deterministic ('unifydb.map/N') rather than random UUIDs."""
    counter = itertools.count()
    out = []

    def expand(form: dict) -> str:
        mid = form.get("unifydb/id") or form.get(":unifydb/id")
        if mid is None:
            mid = f"unifydb.map/{next(counter)}"
        for k, v in form.items():
            if norm_attr(str(k)) == "unifydb/id":
                continue
            if isinstance(v, dict):
                child = expand(v)
                out.append(["add", mid, k, child])
            elif isinstance(v, (list, tuple)) and v and all(
                isinstance(x, dict) for x in v
            ):
                for childform in v:
                    child = expand(childform)
                    out.append(["add", mid, k, child])
            else:
                out.append(["add", mid, k, v])
        return mid

    for stmt in tx_data:
        if isinstance(stmt, dict):
            expand(stmt)
        else:
            out.append(stmt)
    return out
