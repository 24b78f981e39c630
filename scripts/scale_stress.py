"""10x scale-stress harness (VERDICT r7 ask #1): measure — not just
argue — the data-dependent iteration counts, candidate ratios, and wall
times at an sf1-equivalent scale (~6M lineitem rows, 10x every claim the
driver grades at sf0.1).

Prereq: python scripts/gen_scale_data.py   (writes fixtures/sf1)

Three probes, each emitting one JSON block to stdout and accumulating
into SCALE_SF1.json:

1. rounds   — run the iterative operators directly on sf1 and read
              unifydb_spark.instrument counters: histogram-narrowing
              rounds for the quantilers (bound: ceil(log_buckets
              (n / exact_threshold)) + sliver), CC supersteps (bound:
              O(component diameter)), k-core peel rounds (monotone),
              Datalog fixpoint rounds (delta shrinks monotonically).
2. ratios   — LSH candidate-pair count vs verified pairs vs the
              all-pairs count it replaces; IVF probed-candidate scan
              fraction vs brute force; skew-join key histogram.
3. oracle   — the driver-exact correctness replica
              (scripts/oracle_check.py) at fixtures/sf1 for the
              data-dependent entries the judge named; plus bench.py at
              sf1 via SPARK_GRAFT_SF_DIR (run separately: see
              SCALE_SF1.md).

Usage: python scripts/scale_stress.py [sf_dir] [probe ...]
       probes: rounds ratios (default: both)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = "fixtures/sf1"


def _spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("scale-stress")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _release(spark):
    from unifydb_spark.resources import release_persisted

    release_persisted()
    spark.catalog.clearCache()


def probe_rounds(spark, sf_dir: str) -> dict:
    """Iteration counts of every fixpoint/narrowing operator at sf1."""
    from pyspark.sql import functions as F

    from unifydb_spark import instrument

    out: dict = {}

    # --- scalar quantiler (q97 machinery) on 6M lineitem prices
    from unifydb_spark.operators.stats import (
        exact_group_quantiles_scalable,
        exact_quantiles_scalable,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n_li = li.count()
    instrument.reset()
    t0 = time.time()
    exact_quantiles_scalable(
        li, "l_extendedprice", buckets=4096, exact_threshold=100_000
    ).collect()
    dt = time.time() - t0
    rounds = instrument.counters.get("quantile_narrow_rounds", 0)
    # bound: each round divides the candidate set by ~buckets; +1 round
    # per order-statistic pair target for the final sliver resolve
    bound = math.ceil(max(1, math.log(n_li / 100_000, 4096))) + 1
    out["q97_scalar_quantiler"] = {
        "n_rows": n_li,
        "narrow_rounds_total": rounds,
        "bound_per_target": bound,
        "targets": 5,
        "sec": round(dt, 2),
        "within_bound": rounds <= bound * 5,
    }
    _release(spark)

    # --- grouped quantiler (r09 machinery): per-returnflag price quantiles
    instrument.reset()
    t0 = time.time()
    exact_group_quantiles_scalable(
        li, "l_returnflag", "l_extendedprice",
        buckets=1024, exact_threshold=5000,
    ).collect()
    dt = time.time() - t0
    g_rounds = instrument.counters.get("group_quantile_narrow_rounds", 0)
    g_bound = math.ceil(max(1, math.log(n_li / 5000, 1024))) + 1
    out["r09_grouped_quantiler"] = {
        "n_rows": n_li,
        "shared_narrow_rounds": g_rounds,
        "bound": g_bound,
        "sec": round(dt, 2),
        "within_bound": g_rounds <= g_bound + 1,
    }
    _release(spark)

    # --- connected components (q31 machinery) on the sf1 ref graph
    from unifydb_spark.operators.graph import connected_components, kcore

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # the q31-style edge relation: users co-active in the same hour
    # would be quadratic; use the bench's event-graph shape instead —
    # consecutive-event edges per user (linear, diameter grows with
    # history length: exactly what the 10x time axis stresses)
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("nxt", F.lead("event_id").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(
            F.col("event_id").alias("src"), F.col("nxt").alias("dst")
        )
    )
    n_edges = edges.count()
    instrument.reset()
    t0 = time.time()
    cc = connected_components(edges)
    n_comp = cc.select("component").distinct().count()
    dt = time.time() - t0
    out["q31_connected_components"] = {
        "n_edges": n_edges,
        "n_components": n_comp,
        "supersteps": instrument.counters.get("cc_supersteps", 0),
        "sec": round(dt, 2),
        "note": "per-user event chains: diameter = longest user history "
        "(max_user_chain). Plain min-label propagation is O(diameter) "
        "and SILENTLY stalled at max_iter=25 here (962k bogus "
        "components) — the r8 pointer-jumping fix converges in "
        "O(log diameter) supersteps and raises on non-convergence",
    }
    max_chain = (
        ev.groupBy("user_id").count().agg(F.max("count")).collect()[0][0]
    )
    out["q31_connected_components"]["max_user_chain"] = int(max_chain)
    _release(spark)

    # --- k-core peels (r79 machinery) on the supplier-part bipartite
    # graph from 6M lineitems (~10k suppliers x 200k parts; peeling has
    # real cascade structure, unlike a chain graph)
    pairs = (
        li.select(
            F.col("l_suppkey").alias("src"),
            (F.col("l_partkey") + F.lit(100_000_000)).alias("dst"),
        )
        .distinct()
    )
    n_pairs = pairs.count()
    instrument.reset()
    t0 = time.time()
    core_n = kcore(pairs, k=8).count()
    dt = time.time() - t0
    out["r79_kcore"] = {
        "n_edges": n_pairs,
        "k": 8,
        "core_nodes": core_n,
        "peel_rounds": instrument.counters.get("kcore_peel_rounds", 0),
        "sec": round(dt, 2),
    }
    _release(spark)

    # --- Datalog recursive rule (q09 machinery) at sf1
    import __spark_entry__ as entrymod

    instrument.reset()
    t0 = time.time()
    n = entrymod.queries()["q09_rule_recursive"](spark, sf_dir).count()
    dt = time.time() - t0
    out["q09_rule_recursive"] = {
        "result_rows": n,
        "fixpoint_rounds": instrument.counters.get(
            "rule_fixpoint_rounds", 0
        ),
        "sec": round(dt, 2),
    }
    _release(spark)
    return out


def probe_ratios(spark, sf_dir: str) -> dict:
    """Candidate-set sizes of the sub-quadratic pair operators at sf1:
    the number that justifies 'bucketed, never all-pairs' at scale."""
    from pyspark.sql import functions as F

    out: dict = {}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    all_pairs = n_docs * (n_docs - 1) // 2

    # --- MinHash LSH (q24): candidates = same-(band, band_key) pairs
    from unifydb_spark.operators.dedup import (
        minhash_band_rows,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    t0 = time.time()
    band_rows = minhash_band_rows(minhash_signatures(docs))
    cand = (
        band_rows.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) / 2")).alias("pairs"))
        .collect()[0]["pairs"]
    )
    verified = minhash_lsh_pairs(docs).count()
    dt = time.time() - t0
    out["q24_minhash_lsh"] = {
        "n_docs": n_docs,
        "all_pairs": all_pairs,
        "lsh_candidate_pairs": int(cand),
        "verified_pairs": int(verified),
        "candidate_fraction_of_allpairs": round(cand / all_pairs, 8),
        "sec": round(dt, 2),
    }
    _release(spark)

    # --- IVF ANN (q28): measured probed-bucket scan fraction
    from unifydb_spark.operators.similarity import ivf_assign

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_vec = emb.count()
    n_centroids, nprobe = 16, 4
    t0 = time.time()
    assigned = ivf_assign(emb, n_centroids=n_centroids)
    sizes = (
        assigned.groupBy("centroid_id").count().orderBy(
            F.col("count").desc()
        ).collect()
    )
    dt = time.time() - t0
    # worst case: a query probing the nprobe LARGEST buckets
    worst_scan = sum(int(r["count"]) for r in sizes[:nprobe])
    out["q28_ivf"] = {
        "n_vectors": n_vec,
        "n_centroids": n_centroids,
        "nprobe": nprobe,
        "scan_fraction_uniform_bound": nprobe / n_centroids,
        "scan_fraction_worst_probes": round(worst_scan / n_vec, 4),
        "largest_bucket_fraction": round(
            int(sizes[0]["count"]) / n_vec, 4
        ),
        "assign_sec": round(dt, 2),
        "note": "probe scans only its nprobe buckets (partition-pruned "
        "at scale); recall measured by q90's gauge",
    }
    _release(spark)

    # --- skew: the q47 salted-join key histogram at sf1
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    top = (
        li.groupBy("l_partkey")
        .count()
        .orderBy(F.col("count").desc())
        .limit(5)
        .collect()
    )
    med = li.groupBy("l_partkey").count().agg(
        F.expr("percentile(count, 0.5)").alias("m")
    ).collect()[0]["m"]
    out["q47_skew_profile"] = {
        "top_partkey_counts": [int(r["count"]) for r in top],
        "median_partkey_count": float(med),
        "skew_ratio_top_vs_median": round(top[0]["count"] / med, 2),
        "note": "disjoint-copy scaling preserves per-key group sizes "
        "(TPC-H convention): skew RATIO constant, absolute hot-key rows "
        "x10 — the salted join's fanout keeps per-task rows bounded",
    }
    return out


def probe_skew(spark, zipf_events_path: str) -> dict:
    """Per-task row bounds under Zipf(1.2) keys (VERDICT r8 ask #3).

    Prereq: python scripts/gen_zipf_events.py  (writes fixtures/sf1_zipf)

    The sf1 generator's keys are TPC-H-uniform (hot/median 1.77); real
    event/token keys are Zipfian — the head user here carries ~22% of
    all events. For each shuffle the graded operators run, this measures
    the MAX/MEDIAN rows a reduce task receives under Spark's actual
    partitioning function (murmur3 `F.hash(keys) % 32`):

    - sessionize (q34) / stream transitions (r114): shuffle key user_id.
      A window over one user is irreducibly one task, so the documented
      bound is the HOT KEY'S OWN share — measured here, with the
      structural note that per-task rows = max per-user volume, which a
      100 TB deployment bounds by history retention, not corpus size.
    - salted join (q47): fact side shuffles on (user_id, salt). The
      documented bound: salting with n_salts=8 must bring max/median
      within 2.0x (vs the unsalted hot task holding ~7x the median).

    Also runs sessionize and the salted join end to end on the skewed
    table (wall time + row counts) so the bound is exercised, not just
    computed."""
    from pyspark.sql import functions as F

    from unifydb_spark.values import normalize_event_ts

    events = normalize_event_ts(spark.read.parquet(zipf_events_path))
    n = events.count()
    n_part = 32
    out: dict = {"n_events": n, "n_shuffle_partitions": n_part}

    def task_loads(*key_cols) -> dict:
        """Rows per reduce task under HashPartitioning(keys, 32) — the
        exact modulo Spark's Exchange applies (murmur3 via F.hash)."""
        loads = (
            events.select(
                F.pmod(F.hash(*[F.col(c) for c in key_cols]), F.lit(n_part)).alias(
                    "p"
                )
            )
            .groupBy("p")
            .count()
        )
        row = loads.agg(
            F.max("count").alias("mx"),
            F.expr("percentile(count, 0.5)").alias("med"),
        ).collect()[0]
        return {
            "max_task_rows": int(row["mx"]),
            "median_task_rows": float(row["med"]),
            "ratio": round(int(row["mx"]) / float(row["med"]), 2),
        }

    # hot-key profile (the irreducible per-user bound for window ops)
    top = (
        events.groupBy("user_id").count().orderBy(F.col("count").desc()).limit(1)
    ).collect()[0]
    med_user = events.groupBy("user_id").count().agg(
        F.expr("percentile(count, 0.5)").alias("m")
    ).collect()[0]["m"]
    out["key_histogram"] = {
        "hot_user_rows": int(top["count"]),
        "hot_user_share": round(int(top["count"]) / n, 4),
        "median_user_rows": float(med_user),
        "hot_vs_median_key": round(int(top["count"]) / float(med_user), 1),
    }

    # sessionize / stream-transitions shuffle: key = user_id
    out["sessionize_r114_tasks_unsalted"] = task_loads("user_id")
    # salted join fact side: key = (user_id, salt) with q47's salt formula.
    # Sizing rule (salted_join docstring: "size n_salts to the skew"):
    # n_salts must cover hot_share / (1/n_part) sub-keys AND oversample
    # ~4x so the sub-keys' own hash placement over n_part reducers
    # doesn't re-collide (8 salts over 32 partitions measured 3.3x from
    # exactly that birthday effect). Bound documented on the SIZED salt
    # count; the undersized one is reported to show the failure mode.
    for n_salts, documented in ((8, None), (32, 2.0)):
        events_salted = events.withColumn(
            "__salt",
            F.pmod(
                F.xxhash64(*[F.col(c) for c in events.columns]), F.lit(n_salts)
            ).cast("int"),
        )
        loads_salted = (
            events_salted.select(
                F.pmod(F.hash("user_id", "__salt"), F.lit(n_part)).alias("p")
            )
            .groupBy("p")
            .count()
            .agg(
                F.max("count").alias("mx"),
                F.expr("percentile(count, 0.5)").alias("med"),
            )
            .collect()[0]
        )
        entry = {
            "max_task_rows": int(loads_salted["mx"]),
            "median_task_rows": float(loads_salted["med"]),
            "ratio": round(
                int(loads_salted["mx"]) / float(loads_salted["med"]), 2
            ),
        }
        if documented is not None:
            entry["documented_bound"] = documented
        out[f"salted_join_tasks_n_salts_{n_salts}"] = entry

    # end-to-end: sessionize + salted join actually run on the skewed table
    from unifydb_spark.operators.events import sessionize
    from unifydb_spark.operators.joins import salted_join

    t0 = time.time()
    n_sessions = sessionize(events).count()
    t_sess = time.time() - t0
    _release(spark)
    users = events.select("user_id").distinct().withColumn(
        "segment", F.pmod(F.col("user_id"), F.lit(5))
    )
    t0 = time.time()
    n_joined = salted_join(events, users, "user_id", n_salts=8).count()
    t_join = time.time() - t0
    plain = events.join(users, "user_id").count()
    out["end_to_end"] = {
        "sessionize_sessions": int(n_sessions),
        "sessionize_sec": round(t_sess, 2),
        "salted_join_rows": int(n_joined),
        "salted_join_sec": round(t_join, 2),
        "salted_equals_plain_join": bool(n_joined == plain),
    }
    _release(spark)
    return out


def probe_bucketed(spark, zipf_events_path: str, bucket_hours: int = 24) -> dict:
    """Bucketed pre-sessionization under Zipf(1.2) skew (VERDICT r9 ask
    #6's done-criterion): on fixtures/sf1_zipf,

    1. RESULT IDENTITY — sessionize_bucketed == plain sessionize,
       row-for-row (exceptAll both directions must be empty);
    2. PER-TASK FLOOR — max rows any window task holds: plain partitions
       by user_id (floor = the hot user's whole history); bucketed
       partitions stage 1 by (user_id, bucket) (floor = the hot user's
       busiest BUCKET) and stage 2 by user over SUB-SESSIONS only;
    3. SHUFFLE BALANCE — max/median task rows under Spark's actual
       HashPartitioning(..., 32) for both keys;
    4. wall time for both paths (min-of-2, warm).
    """
    import time as _time

    from pyspark.sql import functions as F

    from unifydb_spark.operators.events import sessionize, sessionize_bucketed
    from unifydb_spark.values import normalize_event_ts

    events = normalize_event_ts(spark.read.parquet(zipf_events_path))
    events = events.persist()
    n = events.count()
    n_part = 32
    bucket_us = bucket_hours * 3600 * 1_000_000
    out: dict = {"n_events": n, "bucket_hours": bucket_hours}

    keyed = events.withColumn(
        "_bkt", F.expr(f"unix_micros(ts) DIV {bucket_us}")
    )
    # per-key floors (a window task holds at least its biggest key group)
    floor_user = keyed.groupBy("user_id").count()
    floor_bkt = keyed.groupBy("user_id", "_bkt").count()
    out["per_task_floor"] = {
        "plain_max_user_rows": int(
            floor_user.agg(F.max("count")).collect()[0][0]
        ),
        "bucketed_max_user_bucket_rows": int(
            floor_bkt.agg(F.max("count")).collect()[0][0]
        ),
        "bucketed_stage2_max_subsessions_per_user": int(
            sessionize_bucketed(events, 30, bucket_hours)
            .groupBy("user_id").count().agg(F.max("count")).collect()[0][0]
        ),
    }

    def task_loads(df, *key_cols) -> dict:
        loads = (
            df.select(
                F.pmod(
                    F.hash(*[F.col(c) for c in key_cols]), F.lit(n_part)
                ).alias("p")
            )
            .groupBy("p")
            .count()
        )
        row = loads.agg(
            F.max("count").alias("mx"),
            F.expr("percentile(count, 0.5)").alias("med"),
        ).collect()[0]
        return {
            "max_task_rows": int(row["mx"]),
            "median_task_rows": float(row["med"]),
            "ratio": round(int(row["mx"]) / float(row["med"]), 2),
        }

    out["shuffle_user"] = task_loads(keyed, "user_id")
    out["shuffle_user_bucket"] = task_loads(keyed, "user_id", "_bkt")

    # result identity (exact, both directions)
    plain = sessionize(events, 30)
    bucketed = sessionize_bucketed(events, 30, bucket_hours)
    out["result_identity"] = {
        "plain_rows": plain.count(),
        "bucketed_rows": bucketed.count(),
        "plain_minus_bucketed": plain.exceptAll(bucketed).count(),
        "bucketed_minus_plain": bucketed.exceptAll(plain).count(),
    }

    def timed(fn):
        best = None
        for _ in range(2):
            t0 = _time.time()
            fn().count()
            best = min(best or 1e9, _time.time() - t0)
        return round(best, 2)

    out["wall_s"] = {
        "plain": timed(lambda: sessionize(events, 30)),
        "bucketed": timed(
            lambda: sessionize_bucketed(events, 30, bucket_hours)
        ),
    }

    # the auto default (round-11 promotion): record what the measured-skew
    # heuristic decides on this fixture, and that its result is identical
    from unifydb_spark.operators.events import hot_key_share, sessionize_auto

    share = hot_key_share(events, ["user_id"])
    auto = sessionize_auto(events, 30, bucket_hours)
    out["auto_route"] = {
        "hot_user_share": round(share, 4),
        "threshold": 0.05,
        "routed": "bucketed" if share > 0.05 else "plain",
        "auto_rows": auto.count(),
        "auto_minus_plain": auto.exceptAll(plain).count(),
    }
    events.unpersist()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else SF1
    probes = set(sys.argv[2:]) or {"rounds", "ratios"}
    if not os.path.isdir(sf_dir):
        raise SystemExit(
            f"{sf_dir} missing — run scripts/gen_scale_data.py first"
        )
    spark = _spark()
    results: dict = {"sf_dir": sf_dir}
    if "rounds" in probes:
        results["rounds"] = probe_rounds(spark, sf_dir)
        print(json.dumps({"rounds": results["rounds"]}, indent=2))
    if "ratios" in probes:
        results["ratios"] = probe_ratios(spark, sf_dir)
        print(json.dumps({"ratios": results["ratios"]}, indent=2))
    if "skew" in probes:
        zipf = os.path.join(
            os.path.dirname(sf_dir.rstrip("/")) or ".",
            "sf1_zipf",
            "events.parquet",
        )
        if not os.path.isdir(zipf):
            raise SystemExit(
                f"{zipf} missing — run scripts/gen_zipf_events.py first"
            )
        results["skew_zipf"] = probe_skew(spark, zipf)
        print(json.dumps({"skew_zipf": results["skew_zipf"]}, indent=2))
    if "bucketed" in probes:
        zipf = os.path.join(
            os.path.dirname(sf_dir.rstrip("/")) or ".",
            "sf1_zipf",
            "events.parquet",
        )
        if not os.path.isdir(zipf):
            raise SystemExit(
                f"{zipf} missing — run scripts/gen_zipf_events.py first"
            )
        results["bucketed_sessionize_zipf"] = probe_bucketed(spark, zipf)
        print(json.dumps(
            {"bucketed_sessionize_zipf": results["bucketed_sessionize_zipf"]},
            indent=2,
        ))
    path = "SCALE_SF1.json"
    existing = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    existing.update(results)
    with open(path, "w") as f:
        json.dump(existing, f, indent=2)
    print(f"appended to {path}")


if __name__ == "__main__":
    main()
