"""Executable proofs for SCALE.md's two strongest physical-layout claims.

1. IVF probes are partition-pruned / exchange-free once the assignment is
   materialized with centroid_id as the layout key (SCALE.md 'ANN' bullet:
   "bucket id is the natural partition/cluster key so each probe is
   partition-pruned").
2. Salting actually re-balances a hot join key across partitions
   (SCALE.md 'Skew-salted join': salt varies WITHIN a key), while staying
   result-identical to the plain join.

These assert on plan shape and on measured per-partition row counts, not
on wall clock — the properties that survive a 100x scale-up.
"""

import pytest
from pyspark.sql import functions as F

from unifydb_spark.operators.joins import salted_join
from unifydb_spark.operators.similarity import (
    ivf_assign,
    ivf_assign_bucketed,
    ivf_assign_partitioned,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_ivf_probe_is_partition_pruned(spark, emb, tmp_path):
    full = ivf_assign_partitioned(emb, str(tmp_path / "ivf"), n_centroids=8)
    probe = full.filter(F.col("centroid_id").isin([0, 3]))
    probe.collect()
    qe = probe._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], "probe filter did not reach partition pruning"
    # the scan's own metrics: 2 of the 8 centroid partitions were read
    scan = qe.executedPlan().collectLeaves().apply(0)
    assert scan.metrics().apply("numPartitions").value() == 2
    assert scan.metrics().apply("numFiles").value() < len(full.inputFiles())
    # pruning changed only the scan, never the result
    expect = {
        r["vec_id"]
        for r in ivf_assign(emb, n_centroids=8)
        .filter(F.col("centroid_id").isin([0, 3]))
        .collect()
    }
    assert {r["vec_id"] for r in probe.collect()} == expect


def test_ivf_bucketed_join_and_agg_no_exchange(spark, emb):
    name = "ivf_bucketed_proof"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    t = ivf_assign_bucketed(emb, name, n_centroids=8, n_buckets=4)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # per-bucket candidate aggregation: no exchange before the agg
        agg_plan = _executed_plan(
            spark.table(name).groupBy("centroid_id").count()
        )
        assert "Exchange hashpartitioning" not in agg_plan
        # bucket-key self-join (the within-bucket pair generation shape
        # used by embedding near-dup): SMJ with no exchange on either side
        a = spark.table(name).select("vec_id", "centroid_id")
        b = spark.table(name).select(
            F.col("vec_id").alias("vec_id2"), "centroid_id"
        )
        join_plan = _executed_plan(a.join(b, "centroid_id"))
        assert "SortMergeJoin" in join_plan
        assert "Exchange hashpartitioning" not in join_plan
        assert t.count() == emb.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _partition_sizes(df, n, *cols):
    return (
        df.repartition(n, *[F.col(c) for c in cols])
        .rdd.mapPartitions(lambda it: [sum(1 for _ in it)])
        .collect()
    )


def test_salted_join_rebalances_hot_key(spark):
    n_salts, hot = 8, 4000
    fact = (
        spark.range(hot)
        .select(F.lit(1).alias("key"), F.col("id").alias("payload"))
        .unionAll(
            spark.range(40).select(
                (F.col("id") % 8 + 2).alias("key"), F.col("id").alias("payload")
            )
        )
    )
    dim = spark.range(10).select(
        (F.col("id") + 1).alias("key"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    n_parts = 4 * n_salts
    # unsalted shuffle: the hot key lands whole on ONE reducer partition
    unsalted_max = max(_partition_sizes(fact, n_parts, "key"))
    assert unsalted_max >= hot
    # the salt varies WITHIN the hot key: its 4000 rows split into n_salts
    # sub-groups of ~hot/n_salts each (the unit of shuffle placement)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    groups = (
        fact.withColumn("salt", salt)
        .groupBy("key", "salt")
        .count()
        .filter(F.col("key") == 1)
        .collect()
    )
    assert len(groups) == n_salts
    assert max(r["count"] for r in groups) < 2 * hot / n_salts
    # and the largest reducer partition shrinks accordingly (a few salt
    # groups may co-locate under hash placement — still >=3x better)
    salted_max = max(
        _partition_sizes(fact.withColumn("salt", salt), n_parts, "key", "salt")
    )
    assert salted_max <= unsalted_max / 3
    # and the operator's output is exactly the plain join
    got = salted_join(fact, dim, "key", n_salts=n_salts)
    plain = fact.join(dim, "key")
    assert got.count() == plain.count() == hot + 40
    assert got.exceptAll(plain).count() == 0


def test_lsh_index_ingest_no_corpus_exchange(spark):
    """The persisted corpus LSH index (bucketBy band, band_key) joins an
    ingest batch's band rows with no exchange on the corpus side — the
    daily-ingest shape from SCALE.md: O(batch) compute, corpus hashed
    once at build time."""
    from unifydb_spark.operators.dedup import (
        minhash_lsh_pairs_incremental,
        write_lsh_index,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i % 5} epsilon zeta") for i in range(40)],
        "doc_id bigint, text string",
    )
    corpus = docs.filter("doc_id % 4 != 0")
    batch = docs.filter("doc_id % 4 = 0")
    name = "lsh_index_proof"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        from unifydb_spark.operators.dedup import (
            minhash_band_rows,
            minhash_signatures,
        )

        def final_plan(df):
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
            return plan.split("== Initial Plan ==")[0]

        idx = write_lsh_index(corpus, name, n_buckets=4)
        out = minhash_lsh_pairs_incremental(batch, idx)
        unbucketed = minhash_lsh_pairs_incremental(
            batch, minhash_band_rows(minhash_signatures(corpus))
        )
        b_plan, u_plan = final_plan(out), final_plan(unbucketed)
        # the bucketed corpus scan needs no shuffle before the band join
        # (and no re-hash of the corpus at all): strictly fewer exchanges
        # than the identical query over the plain recomputed frame
        assert "SelectedBucketsCount" in b_plan
        assert b_plan.count("Exchange hashpartitioning") < u_plan.count(
            "Exchange hashpartitioning"
        )
        want = {
            (r["new_doc_id"], r["corpus_doc_id"])
            for r in unbucketed.collect()
        }
        assert {
            (r["new_doc_id"], r["corpus_doc_id"]) for r in out.collect()
        } == want
        assert want  # the %5 text pattern guarantees cross-set duplicates
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {name}")
