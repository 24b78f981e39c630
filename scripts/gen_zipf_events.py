"""Zipf(1.2)-skewed variant of the sf1 events table (VERDICT r8 ask #3).

The sf1 generator keeps TPC-H-uniform keys (hot/median user ratio 1.77,
SCALE_SF1.md §2) — real event streams are Zipfian. This script rewrites
fixtures/sf1/events.parquet with user_id drawn from an EXACT discrete
Zipf(s=1.2) distribution over the SAME user domain, deterministically:

- weights w_r ∝ r^-1.2 over the U distinct users (ranks map to the
  existing sorted user ids, so joins against user dimensions still hit);
- each event's uniform draw u derives from xxhash64(event_id) — no RNG
  state, rerunnable bit-identically;
- rank(u) = 1 + |{cumulative boundaries <= u}| (inverse CDF as a
  higher-order filter over the boundary array literal — pure column
  expression, executor-side).

With s=1.2 and U=1500 the head user carries ~7% of all events — the
shape that melts an unsalted shuffle join and is exactly what
scripts/scale_stress.py's `skew` probe measures (per-task row bounds for
the salted join, sessionize, and stream transitions).

Usage: python scripts/gen_zipf_events.py [src_events] [out_events] [s]
       defaults: fixtures/sf1/events.parquet fixtures/sf1_zipf/events.parquet 1.2
Do NOT commit the output (fixtures/ data dirs are gitignored).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "fixtures/sf1/events.parquet"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "fixtures/sf1_zipf/events.parquet"
    )
    s = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("gen-zipf-events")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    events = spark.read.parquet(src)
    users = sorted(
        r["user_id"] for r in events.select("user_id").distinct().collect()
    )
    U = len(users)
    weights = [r ** (-s) for r in range(1, U + 1)]
    tot = sum(weights)
    cum, acc = [], 0.0
    for w in weights[:-1]:  # boundaries between ranks: rank = 1 + #{c <= u}
        acc += w / tot
        cum.append(acc)

    # u in [0, 1) from the event id; 2^40 buckets keep quantization far
    # below the smallest rank probability
    u = F.pmod(F.xxhash64(F.col("event_id")), F.lit(1 << 40)) / float(1 << 40)
    cum_arr = F.lit(cum).cast("array<double>")
    rank = (
        F.expr(
            "1 + size(filter(__cum, c -> c <= __u))"
        )
    )
    user_arr = F.lit(users).cast("array<bigint>")
    zipfed = (
        events.withColumn("__u", u)
        .withColumn("__cum", cum_arr)
        .withColumn("user_id", F.element_at(user_arr, rank.cast("int")))
        .drop("__u", "__cum")
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    zipfed.coalesce(8).write.mode("overwrite").parquet(out)

    top = (
        spark.read.parquet(out)
        .groupBy("user_id")
        .count()
        .orderBy(F.desc("count"))
        .limit(3)
        .collect()
    )
    n = spark.read.parquet(out).count()
    print(f"{n} events, {U} users, s={s}")
    for r in top:
        print(f"  user {r['user_id']}: {r['count']} events ({r['count']/n:.1%})")
    print(f"written to {out}")


if __name__ == "__main__":
    main()
