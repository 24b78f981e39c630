"""Operator calls must not leak CacheManager entries: iterative operators
unpersist their loop intermediates inline (try/finally); single-plan
operators route persists through `resources.tracked_persist` and callers
release them with `resources.release_persisted()` after materializing.

The assertion surface is Spark's CacheManager (DataFrame persists are
registered there and are NEVER auto-released — the leak the bench's
clearCache papered over). localCheckpoint blocks are excluded: the
ContextCleaner garbage-collects those once the frame is unreachable.
"""

from pyspark.sql import functions as F

from unifydb_spark.resources import release_persisted


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def _edges(spark):
    rows = [(i, i + 1) for i in range(20)] + [(0, 2), (5, 15), (30, 31)]
    return spark.createDataFrame(rows, "src bigint, dst bigint")


def test_graph_fixpoints_self_release(spark):
    from unifydb_spark.operators.graph import (
        connected_components,
        shortest_paths,
        triangle_count,
    )

    spark.catalog.clearCache()
    assert _cache_empty(spark)
    connected_components(_edges(spark)).count()
    assert _cache_empty(spark), "connected_components leaked its edge cache"
    shortest_paths(_edges(spark), sources=[0]).count()
    assert _cache_empty(spark), "shortest_paths leaked its edge cache"
    assert triangle_count(_edges(spark)).collect()[0][0] >= 1
    assert _cache_empty(spark), "triangle_count leaked canon/oriented caches"


def test_kmeans_self_release(spark):
    from unifydb_spark.operators.similarity import kmeans_assign

    emb = spark.range(12).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 3 + 1).cast("float"),
            (F.col("id") % 5 + 1).cast("float"),
        ).alias("embedding"),
    )
    kmeans_assign(emb, k=2, iters=2).count()
    assert _cache_empty(spark), "kmeans_assign leaked exploded-matrix caches"


def test_dedup_text_release_on_demand(spark):
    from unifydb_spark.operators.dedup import minhash_lsh_pairs
    from unifydb_spark.operators.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [(i, "the quick brown fox " * (1 + i % 3)) for i in range(10)],
        "doc_id bigint, text string",
    )
    minhash_lsh_pairs(docs).count()
    tfidf_top_terms(docs, k=3).count()
    assert not _cache_empty(spark), (
        "expected tracked caches to be live right after materialization"
    )
    released = release_persisted()
    assert released >= 2
    assert _cache_empty(spark), "release_persisted left CacheManager entries"
    # idempotent
    assert release_persisted() == 0
