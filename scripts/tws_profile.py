"""Attribute the transformWithStateInPandas (TWS) vs
applyInPandasWithState (AIPWS) gap (VERDICT r9 ask #4).

r134/r135 measured the TWS twins ~1.5-1.7x slower than the AIPWS
primaries at sf0.1 but left the cause unattributed. The two APIs share
the SAME state transition function (_latest_step), the same shuffle, and
the same Arrow data plane — they differ in how STATE moves:

  - AIPWS: state rides the Arrow batches themselves; the JVM hands each
    group (rows + prior state) to Python in one batch and reads
    (output + new state) back. State ops per micro-batch: O(1) batches.
  - TWS: each ValueState.get()/update() is a SYNCHRONOUS round-trip
    from the Python worker to the JVM state server over a local socket
    (StatefulProcessorApiClient; proto-encoded request/response per
    call). State ops per micro-batch: O(keys) round-trips — 2 per key
    for the latest-value processor (one get, one update), regardless of
    row volume.

If that model is right, the gap must scale with the KEY count at fixed
row count, and be flat in row count at fixed keys. This script measures
exactly that: synthetic events (fixed 60k rows; 100 / 2,000 / 20,000
distinct users) through both operators, availableNow, memory sink,
min-of-N wall clock, plus a per-key overhead estimate from the deltas.

Usage: python scripts/tws_profile.py [reps]   (default 3)
Run on an idle host (same discipline as bench.py).
"""

from __future__ import annotations

import sys
import tempfile
import time
import uuid

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_query(spark, op, src_dir, rocksdb: bool):
    from unifydb_spark.streaming import read_event_stream

    name = "p_" + uuid.uuid4().hex[:8]
    ckpt = tempfile.mkdtemp(prefix="tws_prof_ckpt_")
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    if rocksdb:
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    t0 = time.time()
    try:
        q = (
            op(read_event_stream(spark, src_dir))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
    finally:
        if rocksdb:
            if old is None:
                try:
                    spark.conf.unset(key)
                except Exception:
                    pass
            else:
                spark.conf.set(key, old)
    dt = time.time() - t0
    n = spark.table(name).count()
    spark.catalog.dropTempView(name)
    return dt, n


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("tws-profile")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from unifydb_spark.streaming import running_latest, running_latest_tws

    n_rows = 60_000
    key_counts = [100, 2_000, 20_000]
    sources = {}
    for ks in key_counts:
        d = tempfile.mkdtemp(prefix=f"tws_prof_src_{ks}_")
        (
            spark.range(n_rows)
            .select(
                F.col("id").alias("event_id"),
                F.timestamp_micros(
                    ((F.col("id") + F.lit(1704067200)) * F.lit(1_000_000))
                    .cast("long")
                ).alias("ts"),
                (F.col("id") % ks).alias("user_id"),
                F.lit("click").alias("event_type"),
                (F.col("id") % 97).cast("double").alias("value"),
                F.lit(None).cast("string").alias("props"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(d)
        )
        sources[ks] = d

    print(f"rows per run: {n_rows}; reps: {reps}; min-of-reps reported\n")
    print("| keys | AIPWS s | TWS s | gap s | gap/key us |")
    print("|---|---|---|---|---|")
    rows_out = []
    for ks in key_counts:
        times = {}
        for label, op, rocks in (
            ("aipws", running_latest, False),
            ("tws", running_latest_tws, True),
        ):
            best = None
            for _ in range(reps):
                dt, n = run_query(spark, op, sources[ks], rocks)
                assert n >= ks, (label, ks, n)
                best = dt if best is None else min(best, dt)
            times[label] = best
        gap = times["tws"] - times["aipws"]
        print(
            f"| {ks} | {times['aipws']:.2f} | {times['tws']:.2f} "
            f"| {gap:.2f} | {gap / ks * 1e6:.0f} |"
        )
        rows_out.append((ks, times["aipws"], times["tws"], gap))
    # per-key overhead from the two largest key counts (fixed-cost terms
    # cancel in the delta)
    (k1, _, _, g1), (k2, _, _, g2) = rows_out[-2], rows_out[-1]
    if k2 > k1:
        per_key = (g2 - g1) / (k2 - k1)
        print(
            f"\nmarginal TWS overhead: {per_key * 1e6:.0f} us/key "
            f"(from {k1} -> {k2} keys at constant rows)"
        )
        print(
            "interpretation: > 0 and ~linear in keys = per-key state-server"
            " round-trips dominate; ~0 = fixed overhead (proto shim / "
            "handle init)."
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
