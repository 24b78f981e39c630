"""Join-strategy operators: skew-salted joins and bloom-filter semi-join
pre-filters.

Both address the same 100 TB failure mode — a shuffle join that is
correct at test scale but melts on production key distributions:

 - `salted_join`: a hot fact key (one user with 10^8 events, one "null
   bucket" entity) lands an entire join key on one reducer. Salting
   splits each fact key across `n_salts` sub-partitions (salt = row
   hash, so it varies WITHIN a key) and replicates the dim side to
   every salt — result-identical to the plain join (the oracle checks
   exactly that), but the hot key now spreads over n_salts tasks. AQE's
   skew-join split handles sort-merge spills adaptively; explicit
   salting is the deterministic tool when you know the skew in advance
   or the build side must stay hash-partitioned.

 - `bloom_build` / `bloom_probe`: when a selective dim-side filter means
   most fact rows will not survive a join, shuffling the whole fact
   table first is wasted I/O. Build a small bloom bitmap over the dim
   keys (one map-side bit_or aggregation — the bitmap, at m_bits/8
   bytes, is broadcast-sized by construction, which is why collecting
   it to the driver is legitimate), then probe it fact-side BEFORE the
   shuffle: false-positive rows still join away correctly, true matches
   are never dropped. This is the cross-stage analog of Spark's own
   runtime bloom pushdown (spark.sql.optimizer.runtime.bloomFilter.*),
   usable across jobs — e.g. decontamination against a benchmark-ngram
   set too large for a plain broadcast but tiny as a bitmap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join, result-identical to
    fact.join(dim, key, how). Fact rows get salt = xxhash64(whole row) %
    n_salts; each dim row is replicated to all salts, so every
    (key, salt) pair meets exactly the dim rows it would have met on a
    plain join. Dim-side blowup is n_salts×.

    SIZING (measured under Zipf(1.2) keys, SCALE_SF1.md §2): n_salts
    must cover the hot key's share of the shuffle —
    hot_share / (1/n_shuffle_partitions) — TIMES ~4× oversampling,
    because the salt sub-keys themselves re-collide under the reducer
    hash: with a 22.6%-hot key and 32 reducers, 8 salts measured 3.3×
    max/median task rows (birthday collisions) while 32 salts measured
    1.63×, inside the 2.0 bound the scale doc records."""
    n = int(n_salts)
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n)
    ).cast("int")
    f2 = fact.withColumn("__salt", salt)
    d2 = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n)]))
    )
    return f2.join(d2, [key, "__salt"], how).drop("__salt")


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 1 << 15, k: int = 4
) -> list:
    """Aggregate a bloom bitmap over df[key_col]: k xxhash64-seeded bit
    positions per key, OR-combined into m_bits/64 longs. The groupBy is
    on the word index (<= m_bits/64 groups — trivially small), partials
    combine map-side, and the result is a driver-side list of python
    ints sized for broadcast (m_bits = 2^15 -> 4 KiB)."""
    m, words = int(m_bits), int(m_bits) // 64
    pos = [
        F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m))
        for i in range(int(k))
    ]
    bits = df.select(F.explode(F.array(*pos)).alias("pos")).select(
        (F.col("pos") / 64).cast("int").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
            "mask"
        ),
    )
    got = {
        r["word"]: r["bits"]
        for r in bits.groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
        .collect()
    }
    return [got.get(w, 0) for w in range(words)]


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bitmap: list,
    m_bits: int = 1 << 15,
    k: int = 4,
) -> DataFrame:
    """Keep rows whose key MAY be in the builder's key set (no false
    negatives; false-positive rate ~ (1-e^{-kn/m})^k). Pure codegen
    projection over an array literal — no shuffle, no UDF; run it
    upstream of the real join to cut shuffle volume."""
    m = int(m_bits)
    # one ArrayType literal, not F.array of m/64 scalar literals: the
    # expression tree is O(1) instead of O(m/64) nodes replicated into
    # each of the k probe conjuncts — analysis/codegen time, not data
    arr = F.lit([int(w) for w in bitmap]).cast("array<long>")
    cond = F.lit(True)
    for i in range(int(k)):
        pos = F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m))
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        bit = F.pmod(pos, F.lit(64)).cast("int")
        hit = F.call_function("shiftright", word, bit).bitwiseAND(F.lit(1)) == 1
        cond = cond & hit
    return df.filter(cond)


def bloom_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 3,
    m_bits: int = 1 << 17,
    k: int = 4,
) -> DataFrame:
    """Benchmark decontamination with a bloom pre-filter — result-
    identical to `dedup.decontaminate(docs, benchmark, text_col, n)`
    (same (doc_id, n_shingles, n_overlap, contaminated) relation; the
    oracle asserts exactly that), for the regime where the benchmark
    n-gram SET is too large to broadcast as rows but fits as a bitmap:
    a 2^27-bit bloom is 16 MiB where 10^8 distinct shingle strings are
    gigabytes. Corpus shingles are probed against the bitmap (pure
    codegen projection, no shuffle, no false negatives) BEFORE the exact
    overlap join, so only candidate rows — true overlaps plus the ~
    (1-e^{-kn/m})^k false-positive sliver — reach the shuffle; the semi
    join then removes false positives, keeping the counts exact."""
    from unifydb_spark.operators.dedup import _doc_shingles
    from unifydb_spark.resources import tracked_persist

    sh = tracked_persist(_doc_shingles(docs, text_col, n))
    bench_sh = tracked_persist(
        _doc_shingles(benchmark, text_col, n).select("shingle").distinct()
    )
    bitmap = bloom_build(bench_sh, "shingle", m_bits, k)
    cand = bloom_probe(sh, "shingle", bitmap, m_bits, k)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    # deliberately un-hinted: at test scale Catalyst broadcasts bench_sh,
    # at bitmap-motivating scale AQE plans a shuffle join over the
    # bloom-thinned candidate relation
    ov = (
        cand.join(bench_sh, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        docs.select("doc_id")
        .join(sizes, "doc_id", "left")
        .join(ov, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) > 0).alias("contaminated"),
        )
    )
