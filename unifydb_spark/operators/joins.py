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
    plain join. Dim-side blowup is n_salts× — size n_salts to the skew
    factor, not higher."""
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
    arr = F.array(*[F.lit(int(w)).cast("long") for w in bitmap])
    cond = F.lit(True)
    for i in range(int(k)):
        pos = F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m))
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        bit = F.pmod(pos, F.lit(64)).cast("int")
        hit = F.call_function("shiftright", word, bit).bitwiseAND(F.lit(1)) == 1
        cond = cond & hit
    return df.filter(cond)
