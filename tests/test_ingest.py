"""Ingestion quarantine tests: every input line lands in exactly one of
(good, quarantine); round-trip through JSONL preserves the frame."""

import json

from pyspark.sql import functions as F

from unifydb_spark.sources.ingest import (
    read_csv_quarantine,
    read_jsonl_quarantine,
    write_jsonl,
)

SF = "/root/testdata/sf0.001"


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    n = docs.count()
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out, partitions=2)

    # inject corruption: one malformed JSON line, one schema-violating line
    bad = tmp_path / "docs_jsonl" / "part-bad.json"
    bad.write_text(
        'this is not json at all\n'
        + json.dumps({"doc_id": "NOT_A_NUMBER", "text": "x", "lang": "en",
                      "source": "s", "n_chars": "also_bad"})
        + "\n"
    )

    schema = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    good, quar = read_jsonl_quarantine(spark, out, schema)
    assert good.count() == n
    assert quar.count() == 2
    assert set(good.columns) == {"doc_id", "text", "lang", "source", "n_chars"}
    # raw lines preserved for replay
    lines = [r["raw_line"] for r in quar.collect()]
    assert any("not json" in l for l in lines)
    assert any("NOT_A_NUMBER" in l for l in lines)

    # content round-trip: same doc_ids and char sums
    a = docs.agg(F.sum("n_chars"), F.count("*")).collect()[0]
    b = good.agg(F.sum("n_chars"), F.count("*")).collect()[0]
    assert tuple(a) == tuple(b)


def test_csv_quarantine(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text(
        "id,name,score\n"
        "1,alice,3.5\n"
        "2,bob,4.25\n"
        "3,carol,not_a_double\n"
        "4,dave,1.0\n"
    )
    good, quar = read_csv_quarantine(
        spark, str(p), "id BIGINT, name STRING, score DOUBLE"
    )
    assert sorted(r["id"] for r in good.collect()) == [1, 2, 4]
    [q] = quar.collect()
    assert "not_a_double" in q["raw_line"]


def test_ingest_summary_fixture_parity(spark):
    """The r13 oracle entry's Spark side over the committed fixture:
    50 good rows in three lang buckets, 10 quarantined, sums exact
    (scores are multiples of 0.25 — order-independent double sums)."""
    import os

    from unifydb_spark.sources.ingest import ingest_summary

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        "ingest_sample.jsonl",
    )
    out = {
        r["bucket"]: (r["n"], r["sum_value"])
        for r in ingest_summary(
            spark, path, "doc_id BIGINT, lang STRING, score DOUBLE",
            "lang", "score",
        ).collect()
    }
    assert out["_quarantine"] == (10, None)
    assert out["de"] == (17, 110.5)
    assert out["en"] == (16, 102.0)
    assert out["fr"] == (17, 106.25)
