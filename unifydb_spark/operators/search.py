"""Full-text search primitives: inverted index construction and BM25
ranked retrieval.

A training-data platform is also a retrieval platform — "find the
documents about X" (for curation audits, decontamination forensics,
eval-set mining) needs an inverted index over the corpus, and BM25 is
the canonical ranking function over it (Robertson/Sparck Jones; the
Lucene-style +1 idf smoothing keeps every term's weight positive).

Scale shape:
- Index build is ONE shuffle keyed on term (groupBy term), map-side
  combinable. The classic killer is posting-list skew — a stopword's
  posting list is the corpus — so postings are CHUNKED: the group key is
  (term, doc_id div chunk), bounding every output row to `chunk`
  entries. Hot terms become many bounded rows instead of one unbounded
  collect_list; readers reassemble by concatenating chunks in order.
- BM25 never scans the corpus per query: query terms are a literal
  filter pushed into the token explosion (only matching postings
  survive the map stage), df/N/avgdl are broadcast-sized joins, and the
  final top-k is TakeOrderedAndProject (per-partition heaps + driver
  merge of k rows), not a global sort.
- Scores are summed as exact integer micro-units so the result is
  independent of partition/addition order — the same trick the HLL
  estimate uses, and the reason the oracle can assert value-hash
  equality on a floating-point ranking function.

The reference has no text retrieval (SURVEY §2 — its strings are opaque
values); this is net-new pipeline capability like dedup/similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unifydb_spark.operators.text import words_col

def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    min_df: int = 2,
    chunk: int = 64,
) -> DataFrame:
    """Build a chunked inverted index: one row per (term, chunk) with the
    chunk's posting list as "docid:tf" pairs in doc_id order, plus the
    term's corpus-wide df and total tf on every chunk row (denormalized
    so a reader scores from a single row group).

    Returns (term, chunk_id, df, tf_total, n_postings, postings)."""
    toks = docs.select(
        "doc_id", F.explode(words_col(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    chunks = (
        tf.groupBy(
            "term", F.expr(f"doc_id div {chunk}").alias("chunk_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_postings"),
            F.sum("tf").alias("tf_chunk"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "tf"))
                    ),
                    lambda s: F.concat_ws(
                        ":",
                        s["doc_id"].cast("string"),
                        s["tf"].cast("string"),
                    ),
                ),
                ",",
            ).alias("postings"),
        )
    )
    # corpus-wide term stats as a WINDOW over term rather than a
    # vocab-sized aggregate + self-join: one shuffle on term computes
    # both the chunk rows' final layout and the denormalized df/tf_total
    # (the window state per task is one term's chunk rows — bounded by
    # corpus_size/chunk, and in practice by the hottest term's chunk
    # count, not the vocabulary)
    from pyspark.sql import Window

    w = Window.partitionBy("term")
    return (
        chunks.withColumn("df", F.sum("n_postings").over(w))
        .withColumn("tf_total", F.sum("tf_chunk").over(w))
        .filter(F.col("df") >= min_df)
        .select("term", "chunk_id", "df", "tf_total", "n_postings", "postings")
    )


def inverted_index_sql(
    table: str = "documents",
    text_col: str = "text",
    min_df: int = 2,
    chunk: int = 64,
) -> str:
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(string_split({text_col}, ' '), w -> w != '')) AS term
          FROM {table}
        ), tf AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
        ), chunks AS (
          SELECT term, CAST(doc_id // {chunk} AS BIGINT) AS chunk_id,
                 COUNT(*) AS n_postings, SUM(tf) AS tf_chunk,
                 string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
          FROM tf GROUP BY 1, 2
        ), stats AS (
          SELECT term, SUM(n_postings) AS df, SUM(tf_chunk) AS tf_total
          FROM chunks GROUP BY 1
        )
        SELECT term, chunk_id, CAST(df AS BIGINT) AS df,
               CAST(tf_total AS BIGINT) AS tf_total, n_postings, postings
        FROM chunks JOIN stats USING (term)
        WHERE df >= {min_df}
        ORDER BY term, chunk_id
    """


def bm25_topk(
    docs: DataFrame,
    query: str,
    text_col: str = "text",
    k: int = 10,
    k1_micro: int = 1_200_000,
    b_micro: int = 750_000,
) -> DataFrame:
    """BM25 top-k documents for a bag-of-words query.

    score(d) = sum over query terms t of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl)),
    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))  (always positive).

    Each per-term score is rounded to integer MICRO-units before the
    per-doc sum, so the aggregate is exact bigint arithmetic — the
    ranking is reproducible bit-for-bit regardless of partitioning.
    k1/b are passed as micro-units for the same reason.

    Plan: the term filter is a literal isin() pushed below the explode
    (only query-term postings are materialized), df is a query-terms-
    sized aggregate, N and avgdl ride one broadcast single-row cross
    join, and the top-k is orderBy+limit = TakeOrderedAndProject.
    Returns (doc_id, score_micros, n_terms_hit, dl)."""
    terms = sorted({w for w in query.split(" ") if w})
    k1 = k1_micro / 1e6
    b = b_micro / 1e6
    base = docs.select(
        "doc_id", words_col(F.col(text_col)).alias("ws")
    )
    dl = base.select("doc_id", F.size("ws").alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        base.select("doc_id", F.explode("ws").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (
        1.0 - b + b * F.col("dl") / F.col("avgdl")
    )
    term_score = F.round(
        F.lit(1e6) * idf * F.col("tf") * (k1 + 1.0) / denom
    ).cast("bigint")
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(corpus))
        .select("doc_id", "dl", term_score.alias("s_micro"))
    )
    return (
        scored.groupBy("doc_id", "dl")
        .agg(
            F.sum("s_micro").alias("score_micros"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .select("doc_id", "score_micros", "n_terms_hit", "dl")
        .orderBy(F.desc("score_micros"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_topk_sql(
    query: str,
    table: str = "documents",
    text_col: str = "text",
    k: int = 10,
    k1_micro: int = 1_200_000,
    b_micro: int = 750_000,
) -> str:
    terms = sorted({w for w in query.split(" ") if w})
    term_list = ", ".join(f"'{t}'" for t in terms)
    k1 = k1_micro / 1e6
    b = b_micro / 1e6
    return f"""
        WITH base AS (
          SELECT doc_id,
                 list_filter(string_split({text_col}, ' '), w -> w != '') AS ws
          FROM {table}
        ), dl AS (
          SELECT doc_id, len(ws) AS dl FROM base
        ), corpus AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl
        ), tf AS (
          SELECT doc_id, term, COUNT(*) AS tf
          FROM (SELECT doc_id, unnest(ws) AS term FROM base)
          WHERE term IN ({term_list})
          GROUP BY 1, 2
        ), df AS (
          SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
        ), scored AS (
          SELECT tf.doc_id, dl.dl,
                 CAST(ROUND(1e6
                     * ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                     * tf * ({k1!r} + 1.0)
                     / (tf + {k1!r} * (1.0 - {b!r} + {b!r} * dl / avgdl))
                   ) AS BIGINT) AS s_micro
          FROM tf JOIN df USING (term)
               JOIN dl ON tf.doc_id = dl.doc_id
               CROSS JOIN corpus
        )
        SELECT doc_id, CAST(SUM(s_micro) AS BIGINT) AS score_micros,
               COUNT(*) AS n_terms_hit, dl
        FROM scored GROUP BY doc_id, dl
        ORDER BY score_micros DESC, doc_id ASC LIMIT {k}
    """
