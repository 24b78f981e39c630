"""Deterministic 10x scale-up of the driver's sf0.1 testdata.

Writes a self-consistent sf1-equivalent dataset (~6M lineitem rows)
under fixtures/sf1/ (or argv[1] target dir) by replicating sf0.1 with
per-copy key offsets — the standard TPC-H-style scaling where key
domains grow and per-key group sizes stay constant — plus the
deviations a stress harness actually wants:

- events keep the ORIGINAL user domain and extend the time axis: copy c
  shifts ts by c * (span + 1h), so per-user event counts grow 10x
  (sessionize / retention / stateful-state stress grows with data, as a
  living product's history does).
- documents are Caesar-rotated per copy (letters only, rotation = copy):
  per-copy token/shingle structure is IDENTICAL to sf0.1 (within-copy
  near-dup density preserved), while cross-copy token overlap is zero —
  pair-operator output grows linearly with copies, not quadratically.
  Rotation keeps every length/whitespace/shape statistic intact and
  n_chars stays valid.
- embeddings get a small per-(copy, dim) deterministic offset so copies
  do not create exact-tie duplicates in cosine top-k, while cluster
  structure (IVF/k-means) persists.

Deterministic by construction: pure column arithmetic, no random(), no
timestamps. Do NOT commit the output (fixtures/sf1 is gitignored);
rerun this script to regenerate. Source data is read-only sf0.1 —
never modified.

Usage: python scripts/gen_scale_data.py [out_dir] [copies]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"

# key offsets: far above any sf0.1 key domain, distinct per table
CUST_BASE = 1_000_000
SUPP_BASE = 1_000_000
PART_BASE = 1_000_000
ORD_BASE = 10_000_000
EVT_BASE = 10_000_000
DOC_BASE = 1_000_000
VEC_BASE = 1_000_000

ALPHA_LO = "abcdefghijklmnopqrstuvwxyz"
ALPHA_UP = ALPHA_LO.upper()


def _rot(s: str, n: int) -> str:
    return s[n:] + s[:n]


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "fixtures/sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("gen-scale-data")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    def copies_of(df, build):
        out = None
        for c in range(copies):
            part = build(df, c)
            out = part if out is None else out.unionByName(part)
        return out

    # dims that do not scale
    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{t}.parquet")

    customer = spark.read.parquet(f"{SRC}/customer.parquet")
    copies_of(
        customer,
        lambda df, c: df.select(
            (F.col("c_custkey") + c * CUST_BASE).alias("c_custkey"),
            F.concat(F.col("c_name"), F.lit(f"#{c}")).alias("c_name"),
            "c_nationkey",
            # deterministic per-copy cent jitter keeps value domains from
            # being 10 identical histograms
            F.round(F.col("c_acctbal") + c * 0.01, 2).alias("c_acctbal"),
            "c_mktsegment",
        ),
    ).coalesce(4).write.mode("overwrite").parquet(f"{out_dir}/customer.parquet")

    supplier = spark.read.parquet(f"{SRC}/supplier.parquet")
    copies_of(
        supplier,
        lambda df, c: df.select(
            (F.col("s_suppkey") + c * SUPP_BASE).alias("s_suppkey"),
            F.concat(F.col("s_name"), F.lit(f"#{c}")).alias("s_name"),
            "s_nationkey",
            F.round(F.col("s_acctbal") + c * 0.01, 2).alias("s_acctbal"),
        ),
    ).coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/supplier.parquet")

    part = spark.read.parquet(f"{SRC}/part.parquet")
    copies_of(
        part,
        lambda df, c: df.select(
            (F.col("p_partkey") + c * PART_BASE).alias("p_partkey"),
            F.concat(F.col("p_name"), F.lit(f"#{c}")).alias("p_name"),
            "p_brand",
            "p_type",
            "p_size",
            F.round(F.col("p_retailprice") + c * 0.01, 2).alias(
                "p_retailprice"
            ),
        ),
    ).coalesce(2).write.mode("overwrite").parquet(f"{out_dir}/part.parquet")

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    copies_of(
        orders,
        lambda df, c: df.select(
            (F.col("o_orderkey") + c * ORD_BASE).alias("o_orderkey"),
            (F.col("o_custkey") + c * CUST_BASE).alias("o_custkey"),
            "o_orderstatus",
            F.round(F.col("o_totalprice") + c * 0.01, 2).alias(
                "o_totalprice"
            ),
            # stagger order dates by copy-minutes: distinct timestamps,
            # same calendar distribution
            (F.col("o_orderdate") + F.expr(f"INTERVAL {c} MINUTE")).alias(
                "o_orderdate"
            ),
            "o_orderpriority",
        ),
    ).coalesce(8).write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")

    lineitem = spark.read.parquet(f"{SRC}/lineitem.parquet")
    copies_of(
        lineitem,
        lambda df, c: df.select(
            (F.col("l_orderkey") + c * ORD_BASE).alias("l_orderkey"),
            (F.col("l_partkey") + c * PART_BASE).alias("l_partkey"),
            (F.col("l_suppkey") + c * SUPP_BASE).alias("l_suppkey"),
            "l_linenumber",
            "l_quantity",
            F.round(F.col("l_extendedprice") + c * 0.01, 2).alias(
                "l_extendedprice"
            ),
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            (F.col("l_shipdate") + F.expr(f"INTERVAL {c} MINUTE")).alias(
                "l_shipdate"
            ),
        ),
    ).coalesce(16).write.mode("overwrite").parquet(
        f"{out_dir}/lineitem.parquet"
    )

    # events: SAME users, 10x the history (time axis extends per copy).
    # ts arrives as TIMESTAMP_NTZ from the driver's parquet — normalize
    # through the engine's canonical converter (never hand-roll; the
    # encoding changed across rounds).
    from unifydb_spark.values import normalize_event_ts

    events = normalize_event_ts(
        spark.read.parquet(f"{SRC}/events.parquet")
    )
    span = events.agg(
        (F.max("ts").cast("long") - F.min("ts").cast("long")).alias("s")
    ).collect()[0]["s"]
    shift = int(span) + 3600
    copies_of(
        events,
        lambda df, c: df.select(
            (F.col("event_id") + c * EVT_BASE).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {c * shift} SECOND")).alias(
                "ts"
            ),
            "user_id",
            "event_type",
            F.round(F.col("value") + c * 0.001, 6).alias("value"),
            "props",
        ),
    ).coalesce(8).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    # documents: per-copy Caesar rotation — identical within-copy
    # token/shingle structure, zero cross-copy overlap
    documents = spark.read.parquet(f"{SRC}/documents.parquet")

    def doc_copy(df, c):
        if c == 0:
            text = F.col("text")
        else:
            text = F.translate(
                F.col("text"),
                ALPHA_LO + ALPHA_UP,
                _rot(ALPHA_LO, c) + _rot(ALPHA_UP, c),
            )
        return df.select(
            (F.col("doc_id") + c * DOC_BASE).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            "n_chars",
        )

    copies_of(documents, doc_copy).coalesce(4).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/documents.parquet")

    # embeddings: small per-(copy, dim) deterministic offset
    embeddings = spark.read.parquet(f"{SRC}/embeddings.parquet")

    def emb_copy(df, c):
        if c == 0:
            emb = F.col("embedding")
        else:
            emb = F.expr(
                "transform(embedding, (x, i) -> "
                f"cast(x + (({c} * 31 + i * 17) % 7 - 3) * 0.003 as float))"
            )
        return df.select(
            (F.col("vec_id") + c * VEC_BASE).alias("vec_id"),
            emb.alias("embedding"),
            "label",
        )

    copies_of(embeddings, emb_copy).coalesce(4).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/embeddings.parquet")

    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        n = spark.read.parquet(f"{out_dir}/{t}.parquet").count()
        print(f"{t}: {n} rows")
    print(f"written to {out_dir} ({copies} copies of sf0.1)")


if __name__ == "__main__":
    main()
