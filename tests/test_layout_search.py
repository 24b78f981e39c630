"""Layout (global row number, z-order) and search (inverted index,
BM25) operators, plus the Misra-Gries heavy-hitter pruning and
duplicated-substring coverage — semantics AND the plan/scale properties
each one claims."""

import pytest
from pyspark.sql import functions as F

from unifydb_spark.operators.layout import (
    global_row_number,
    write_zordered,
    zorder_block_profile,
    zorder_key_col,
)
from unifydb_spark.operators.search import bm25_topk, inverted_index
from unifydb_spark.operators.sketch import _mg_candidates, heavy_hitters


# ---------------------------------------------------------------------------
# global_row_number

def test_global_row_number_matches_single_sort(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") * 37 % 1000).alias("k"), F.col("id").alias("uid")
    )
    got = {
        (r["k"], r["uid"]): r["row_num"]
        for r in global_row_number(df, ["k", "uid"], num_partitions=7).collect()
    }
    rows = sorted(((r["k"], r["uid"]) for r in df.collect()))
    assert len(got) == 5000
    for i, key in enumerate(rows, start=1):
        assert got[key] == i


def test_global_row_number_no_single_partition_exchange(spark):
    """The whole point: the naive ROW_NUMBER() OVER (ORDER BY) plan is
    Exchange SinglePartition; ours must not contain one."""
    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    plan = global_row_number(df, ["k"], num_partitions=5)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # and the naive plan DOES, proving the check has teeth
    from pyspark.sql import Window

    naive = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("k"))
    )
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in naive_plan


def test_global_row_number_duplicate_keys_still_dense(spark):
    """Non-unique order key: numbering is still a dense permutation of
    1..N (tie order unspecified, as with ROW_NUMBER itself)."""
    df = spark.range(0, 300).select((F.col("id") % 3).alias("k"))
    nums = sorted(
        r["row_num"]
        for r in global_row_number(df, ["k"], num_partitions=4).collect()
    )
    assert nums == list(range(1, 301))


# ---------------------------------------------------------------------------
# z-order

def test_zorder_key_known_values(spark):
    # interleave(x=0b011, y=0b101) -> y2 x2 y1 x1 y0 x0 = 1 0 0 1 1 1
    df = spark.createDataFrame([(3, 5)], "x long, y long")
    (z,) = df.select(zorder_key_col(F.col("x"), F.col("y"), bits=3).alias("z")).collect()
    assert z["z"] == 0b100111
    # zero / identity checks
    df2 = spark.createDataFrame([(0, 0), (7, 0), (0, 7)], "x long, y long")
    zs = [r["z"] for r in df2.select(zorder_key_col(F.col("x"), F.col("y"), 3).alias("z")).collect()]
    assert zs == [0, 0b010101, 0b101010]


def test_zorder_blocks_are_2d_tiles(spark):
    """On a full 64x64 grid, every 2^6-key z-block must be an exact 8x8
    tile: both dimensions span 8 values. A row-major layout's blocks
    would span the full y range."""
    grid = spark.range(0, 64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    prof = zorder_block_profile(grid, "x", "y", bits=6, block_shift=6).collect()
    assert len(prof) == 64
    for r in prof:
        assert r["n_rows"] == 64
        assert r["x_max"] - r["x_min"] == 7
        assert r["y_max"] - r["y_min"] == 7


def test_write_zordered_files_prune_on_both_dims(spark, tmp_path):
    """After a z-ordered write, each output file's min/max range on each
    dimension is a fraction of the domain — i.e. a filter on EITHER
    column can skip most files on footer stats alone."""
    grid = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    path = str(tmp_path / "zord")
    write_zordered(grid, path, "x", "y", bits=6, num_files=16)
    import glob

    spans_x, spans_y = [], []
    for f in sorted(glob.glob(path + "/part-*.parquet")):
        pf = spark.read.parquet(f)
        row = pf.agg(
            F.min("x"), F.max("x"), F.min("y"), F.max("y")
        ).collect()[0]
        spans_x.append(row[1] - row[0])
        spans_y.append(row[3] - row[2])
    assert len(spans_x) >= 8
    # every file covers well under the full 0..63 domain on both axes
    assert max(spans_x) <= 32
    assert max(spans_y) <= 32


# ---------------------------------------------------------------------------
# heavy hitters

def _skewed(spark):
    # key "hot" ~ 3000 rows, "warm" ~ 600, 2000 singletons
    return (
        spark.range(0, 3000).select(F.lit("hot").alias("k"))
        .unionAll(spark.range(0, 600).select(F.lit("warm").alias("k")))
        .unionAll(
            spark.range(0, 2000).select(
                F.concat(F.lit("u"), F.col("id")).alias("k")
            )
        )
        .repartition(8)
    )


def test_heavy_hitters_equals_exact(spark):
    keys = _skewed(spark)
    got = {
        r["k"]: r["cnt"]
        for r in heavy_hitters(keys, "k", phi_num=1, phi_den=20).collect()
    }
    n = keys.count()
    exact = {
        r["k"]: r["cnt"]
        for r in keys.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * 20 > n)
        .collect()
    }
    assert got == exact == {"hot": 3000, "warm": 600}


def test_mg_candidate_output_is_bounded(spark):
    """The shuffle-collapse claim: each partition forwards at most k
    candidate rows no matter how many rows it holds."""
    keys = _skewed(spark)
    k = 20
    per_part = (
        _mg_candidates(keys, "k", k)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    assert per_part  # non-empty
    assert all(r["count"] <= k for r in per_part)


def test_heavy_hitters_no_false_negatives_fuzz(spark):
    """Seeded fuzz: random zipf-ish data, MG+recount == exact filter."""
    import random

    rng = random.Random(7)
    rows = [(f"k{rng.randint(0, 30) ** 2}",) for _ in range(4000)]
    keys = spark.createDataFrame(rows, "k string").repartition(6)
    got = {
        (r["k"], r["cnt"])
        for r in heavy_hitters(keys, "k", phi_num=1, phi_den=40).collect()
    }
    exact = {
        (r["k"], r["cnt"])
        for r in keys.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * 40 > 4000)
        .collect()
    }
    assert got == exact


# ---------------------------------------------------------------------------
# inverted index + BM25

_DOCS = [
    (0, "spark shuffle join shuffle"),
    (1, "broadcast join small table"),
    (2, "spark broadcast broadcast hash join"),
    (3, "sort merge join spills"),
    (64, "spark spark spark"),  # lands in chunk 1 for chunk=64
]


def test_inverted_index_postings(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    idx = {
        (r["term"], r["chunk_id"]): r
        for r in inverted_index(docs, min_df=2, chunk=64).collect()
    }
    assert idx[("join", 0)]["postings"] == "0:1,1:1,2:1,3:1"
    assert idx[("join", 0)]["df"] == 4
    # chunking: doc 64 is a separate row, df/tf_total denormalized on both
    assert idx[("spark", 0)]["postings"] == "0:1,2:1"
    assert idx[("spark", 1)]["postings"] == "64:3"
    assert idx[("spark", 0)]["df"] == 3
    assert idx[("spark", 1)]["tf_total"] == 5
    # min_df prunes singletons
    assert not any(t == "spills" for (t, _) in idx)


def test_bm25_ranks_matching_docs_first(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    top = bm25_topk(docs, "broadcast join", k=5).collect()
    assert top  # non-empty
    scores = {r["doc_id"]: r["score_micros"] for r in top}
    # doc 64 has neither term -> absent; docs 1 and 2 hit both terms
    assert 64 not in scores
    assert top[0]["doc_id"] in (1, 2)
    assert top[0]["n_terms_hit"] == 2
    # scores strictly ordered as returned
    vals = [r["score_micros"] for r in top]
    assert vals == sorted(vals, reverse=True)


def test_bm25_score_is_integer_exact_across_partitionings(spark):
    """Micro-unit summation: identical scores no matter the layout."""
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    a = {(r["doc_id"], r["score_micros"]) for r in bm25_topk(docs.coalesce(1), "spark join", k=5).collect()}
    b = {(r["doc_id"], r["score_micros"]) for r in bm25_topk(docs.repartition(7), "spark join", k=5).collect()}
    assert a == b


# ---------------------------------------------------------------------------
# duplicated-substring coverage

def test_dup_span_coverage_fixture(spark):
    from unifydb_spark.operators.dedup import dup_span_coverage

    shared = "a b c d e f g h"  # one shared 8-gram
    docs = spark.createDataFrame(
        [
            (0, shared + " x0 y0 z0"),
            (1, "p q " + shared + " r"),
            (2, "totally unique words only here now"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dup_span_coverage(docs, n=8).collect()}
    assert rows[0]["dup_starts"] == 1 and rows[0]["covered_tokens"] == 8
    assert rows[1]["dup_starts"] == 1 and rows[1]["covered_tokens"] == 8
    assert rows[2]["dup_starts"] == 0 and rows[2]["covered_tokens"] == 0
    assert rows[0]["n_tokens"] == 11


def test_dup_span_coverage_overlapping_spans_union(spark):
    """Two overlapping duplicated 8-grams cover 9 positions, not 16 —
    the distinct-position count is an interval union."""
    from unifydb_spark.operators.dedup import dup_span_coverage

    nine = "a b c d e f g h i"  # 9 tokens -> two overlapping 8-grams
    docs = spark.createDataFrame(
        [(0, nine + " tail0"), (1, nine + " tail1")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dup_span_coverage(docs, n=8).collect()}
    assert rows[0]["dup_starts"] == 2
    assert rows[0]["covered_tokens"] == 9


# ---------------------------------------------------------------------------
# exact quantiles via histogram narrowing

def test_exact_quantiles_matches_percentile(spark):
    """Narrowing path forced (threshold << n): equals Spark's exact
    percentile (which buffers all values) to the rounded digit."""
    import random

    from unifydb_spark.operators.stats import exact_quantiles_scalable

    rng = random.Random(11)
    rows = [(rng.uniform(-1000, 1000),) for _ in range(20000)]
    df = spark.createDataFrame(rows, "x double").repartition(8)
    probs = (0.25, 0.5, 0.9, 0.99)
    got = {
        r["quantile"]: r["value"]
        for r in exact_quantiles_scalable(
            df, "x", probs=probs, buckets=64, exact_threshold=50
        ).collect()
    }
    ref = df.agg(
        *[
            F.round(F.percentile(F.col("x"), F.lit(p)), 4).alias(f"p{i}")
            for i, p in enumerate(probs)
        ]
    ).collect()[0]
    assert got["p25"] == ref["p0"]
    assert got["p50"] == ref["p1"]
    assert got["p90"] == ref["p2"]
    assert got["p99"] == ref["p3"]


def test_exact_quantiles_duplicate_heavy(spark):
    """A value owning most of the distribution must not stall the
    narrowing loop (the min==max snap resolves it in one round)."""
    from unifydb_spark.operators.stats import exact_quantiles_scalable

    rows = [(42.5,)] * 5000 + [(float(i),) for i in range(100)]
    df = spark.createDataFrame(rows, "x double").repartition(4)
    got = {
        r["quantile"]: r["value"]
        for r in exact_quantiles_scalable(
            df, "x", probs=(0.5,), buckets=16, exact_threshold=10
        ).collect()
    }
    assert got["p50"] == 42.5


def test_exact_quantiles_small_and_edge(spark):
    from unifydb_spark.operators.stats import exact_quantiles_scalable

    one = spark.createDataFrame([(7.0,)], "x double")
    assert exact_quantiles_scalable(one, "x", probs=(0.5,)).collect()[0][
        "value"
    ] == 7.0
    two = spark.createDataFrame([(1.0,), (3.0,)], "x double")
    got = {
        r["quantile"]: r["value"]
        for r in exact_quantiles_scalable(two, "x", probs=(0.5, 0.99)).collect()
    }
    assert got["p50"] == 2.0  # interpolated midpoint
    assert got["p99"] == round(1.0 + 0.99 * 2.0, 4)
