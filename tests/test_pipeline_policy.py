"""Pipeline-policy operators: canonical keep/drop election, curriculum
bucketing on the scalable rank, deterministic holdout assignment."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _final_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]


def test_canonical_keep_elects_one_per_cluster(spark):
    from unifydb_spark.operators.dedup import canonical_keep

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again"),
        (2, "the quick brown fox jumps over the lazy dog again!!"),  # longer dup
        (3, "a completely different document about spark engines"),
        (4, "short unrelated text"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in canonical_keep(docs, threshold=0.5).collect()}
    assert len(out) == 4
    # docs 1+2 cluster together; 2 is longer -> kept
    assert out[1]["canonical_id"] == out[2]["canonical_id"]
    assert out[1]["kept_id"] == 2 and out[2]["kept_id"] == 2
    assert not out[1]["keep"] and out[2]["keep"]
    # singletons keep themselves
    for d in (3, 4):
        assert out[d]["cluster_size"] == 1 and out[d]["keep"]
        assert out[d]["kept_id"] == d
    # exactly one keeper per cluster
    import collections

    per = collections.Counter(
        r["canonical_id"] for r in out.values() if r["keep"]
    )
    assert all(v == 1 for v in per.values())


def test_curriculum_buckets_equal_sizes_and_monotone(spark, docs):
    from unifydb_spark.operators.layout import curriculum_buckets

    out = curriculum_buckets(docs, "n_chars", "doc_id", n_buckets=8)
    rows = out.select("bucket", "n_chars", "doc_id").collect()
    n = len(rows)
    import collections

    sizes = collections.Counter(r["bucket"] for r in rows)
    assert sorted(sizes) == list(range(8))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert sum(sizes.values()) == n
    # bucket boundaries respect the (n_chars, doc_id) order
    spans = {
        b: (
            min((r["n_chars"], r["doc_id"]) for r in rows if r["bucket"] == b),
            max((r["n_chars"], r["doc_id"]) for r in rows if r["bucket"] == b),
        )
        for b in sizes
    }
    for b in range(7):
        assert spans[b][1] <= spans[b + 1][0]


def test_curriculum_no_single_partition_sort(spark, docs):
    from unifydb_spark.operators.layout import curriculum_buckets

    plan = _final_plan(curriculum_buckets(docs, "n_chars", "doc_id", 8))
    assert "Exchange SinglePartition" not in plan


def test_holdout_assignment_is_append_stable(spark, docs):
    from unifydb_spark.operators.text import holdout_split

    full = {
        r["doc_id"]: r["split"]
        for r in holdout_split(docs).select("doc_id", "split").collect()
    }
    subset = {
        r["doc_id"]: r["split"]
        for r in holdout_split(docs.filter(F.col("doc_id") % 3 == 0))
        .select("doc_id", "split")
        .collect()
    }
    # every row assigned; subset assignments identical to full-corpus ones
    assert set(full.values()) == {"train", "val", "test"}
    for k, v in subset.items():
        assert full[k] == v
    # fractions roughly honored (n=500 docs)
    import collections

    frac = collections.Counter(full.values())
    assert abs(frac["train"] / len(full) - 0.8) < 0.08
    assert abs(frac["test"] / len(full) - 0.1) < 0.06
