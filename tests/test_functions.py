"""Scalar function registry tests (Q5/Q6): the extended clojure.core ->
Spark builtin surface."""

import pytest

from unifydb_spark import Engine, FactStore, Ref
from unifydb_spark.query.parse import QueryError

FACTS = [
    (1, ":name", "Ben Bitdiddle", 0, True),
    (1, ":salary", 60000, 0, True),
    (1, ":tags", ["a", "b", "c"], 0, True),
    (2, ":name", "alyssa", 0, True),
    (2, ":salary", 40000.5, 0, True),
    (3, ":name", "X", 0, True),
]


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark, FactStore(spark).seed(FACTS))


def q1(eng, q):
    rows = eng.query_rows(q)
    assert len(rows) == 1
    return rows[0]


def test_string_fns(eng):
    assert q1(eng, {"find": ["?u"], "where": [
        [1, ":name", "?n"], [("upper-case", "?n"), "?u"]]}) == ("BEN BITDIDDLE",)
    assert q1(eng, {"find": ["?r"], "where": [
        [1, ":name", "?n"], [("replace", "?n", "Ben", "Jen"), "?r"]]}) == ("Jen Bitdiddle",)
    assert q1(eng, {"find": ["?i"], "where": [
        [1, ":name", "?n"], [("index-of", "?n", "Bit"), "?i"]]}) == (4,)
    assert q1(eng, {"find": ["?i"], "where": [
        [1, ":name", "?n"], [("index-of", "?n", "zzz"), "?i"]]}) == (None,)
    assert q1(eng, {"find": ["?p"], "where": [
        [1, ":name", "?n"], [("split", "?n", " "), "?p"]]}) == (["Ben", "Bitdiddle"],)
    assert q1(eng, {"find": ["?j"], "where": [
        [1, ":tags", "?t"], [("join", "-", "?t"), "?j"]]}) == ("a-b-c",)


def test_keyword_accessors(eng):
    # name/namespace over the attribute position
    rows = eng.query_rows({"find": ["?nm", "?ns"], "where": [
        [1, "?a", 60000], [("name", "?a"), "?nm"], [("namespace", "?a"), "?ns"]]})
    assert rows == [("salary", None)]


def test_type_predicates(eng):
    # number? over a struct-typed variable (attr ?a binds mixed types)
    rows = sorted(eng.query_rows({"find": ["?n"], "where": [
        ["?e", ":salary", "?s"], [("number?", "?s")],
        ["?e", ":name", "?n"]]}))
    assert rows == [("Ben Bitdiddle",), ("alyssa",)]
    rows = eng.query_rows({"find": ["?n"], "where": [
        ["?e", ":salary", "?s"], [("double?", "?s")], ["?e", ":name", "?n"]]})
    assert rows == [("alyssa",)]


def test_bit_ops(eng):
    assert q1(eng, {"find": ["?x"], "where": [
        [1, ":salary", "?s"], [("bit-and", "?s", 0xFF), "?x"]]}) == (60000 & 0xFF,)
    assert q1(eng, {"find": ["?x"], "where": [
        [1, ":salary", "?s"], [("bit-shift-right", "?s", 4), "?x"]]}) == (60000 >> 4,)


def test_casts(eng):
    assert q1(eng, {"find": ["?x"], "where": [
        [2, ":salary", "?s"], [("long", "?s"), "?x"]]}) == (40000,)


def test_unknown_function_error(eng):
    with pytest.raises(QueryError) as ei:
        eng.query_rows({"find": ["?x"], "where": [
            [1, ":salary", "?s"], [("*foo", "?s"), "?x"]]})
    assert ei.value.code == "unknown-function"
    assert ei.value.info == {"function": "*foo"}


def test_destructuring_output(eng):
    # Q6 destructuring: [(split ?n " ") [?first ?last]]
    rows = eng.query_rows({
        "find": ["?first", "?last"],
        "where": [[1, ":name", "?n"], [("split", "?n", " "), ["?first", "?last"]]],
    })
    assert rows == [("Ben", "Bitdiddle")]


def test_destructuring_rest(eng):
    rows = eng.query_rows({
        "find": ["?first", "?rest"],
        "where": [[1, ":name", "?n"], [("split", "?n", " "), ["?first", "&", "?rest"]]],
    })
    assert rows == [("Ben", ["Bitdiddle"])]


def test_destructuring_mismatch_filters(eng):
    # three-element pattern against a two-token split -> no rows
    rows = eng.query_rows({
        "find": ["?a"],
        "where": [[1, ":name", "?n"], [("split", "?n", " "), ["?a", "?b", "?c"]]],
    })
    assert rows == []


def test_source_divergence_uniform_and_identical(spark):
    """Entropy of a uniform unigram distribution is ln(V); a source
    whose distribution equals the corpus mixture has KL = 0."""
    import math

    from unifydb_spark.operators.text import source_divergence

    # two sources with IDENTICAL uniform distributions over 4 tokens
    rows = [
        (0, "aa bb cc dd", "s1"),
        (1, "aa bb cc dd", "s2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = {r["source"]: r for r in source_divergence(docs).collect()}
    for s in ("s1", "s2"):
        assert out[s]["n_tokens"] == 4
        assert out[s]["vocab_size"] == 4
        assert abs(out[s]["entropy"] - math.log(4)) < 1e-6
        assert out[s]["kl_vs_corpus"] == 0.0
    # a skewed source diverges; entropy drops below uniform
    rows2 = rows + [(2, "aa aa aa aa aa aa bb", "s3")]
    docs2 = spark.createDataFrame(rows2, "doc_id bigint, text string, source string")
    out2 = {r["source"]: r for r in source_divergence(docs2).collect()}
    assert out2["s3"]["kl_vs_corpus"] > 0.1
    assert out2["s3"]["entropy"] < math.log(4) - 0.3
    assert out2["s1"]["kl_vs_corpus"] > 0.0  # corpus shifted away from s1 too


def test_weighted_sample_k_statistics_and_determinism(spark):
    """A-ES sampling: exactly k per group, deterministic across runs and
    partitionings, and weight-proportional in aggregate (a 10x-weight
    item appears in far more samples across many disjoint draws)."""
    from pyspark.sql import functions as F
    from unifydb_spark.operators.text import weighted_sample_k

    rows = [(g, i, 10.0 if i % 50 == 0 else 1.0)
            for g in ("a", "b") for i in range(200)]
    df = spark.createDataFrame(rows, "g string, id bigint, w double")
    out = weighted_sample_k(df, "g", "id", "w", k=8).collect()
    per = {}
    for r in out:
        per.setdefault(r["g"], []).append(r["id"])
    assert all(len(v) == 8 for v in per.values())
    # deterministic under repartition
    out2 = weighted_sample_k(df.repartition(7), "g", "id", "w", k=8).collect()
    assert {(r["g"], r["id"]) for r in out} == {(r["g"], r["id"]) for r in out2}
    # zero/negative weights never sampled
    df2 = spark.createDataFrame(
        [("z", 1, 0.0), ("z", 2, -1.0), ("z", 3, 1.0)],
        "g string, id bigint, w double",
    )
    got = weighted_sample_k(df2, "g", "id", "w", k=5).collect()
    assert [r["id"] for r in got] == [3]
    # aggregate weight-proportionality: heavy items (w=10, 4 of 200 per
    # group) should take a large share of the k=8 slots
    heavy = sum(1 for r in out if r["id"] % 50 == 0)
    assert heavy >= 4  # e.g. ~half the slots across both groups


def test_vocab_growth_curve(spark):
    from unifydb_spark.operators.text import vocab_growth

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b"), (3, "d a"), (5, "e e e")],
        "doc_id bigint, text string",
    )
    out = {r["doc_seq"]: r for r in vocab_growth(docs).collect()}
    assert out[1]["cum_vocab"] == 3 and out[1]["new_tokens"] == 3
    assert out[2]["cum_vocab"] == 3 and out[2]["new_tokens"] == 0
    assert out[3]["cum_vocab"] == 4  # 'd' is new, 'a' isn't
    assert out[4]["cum_vocab"] == 5 and out[4]["new_tokens"] == 1
    assert out[4]["cum_tokens"] == 3 + 2 + 2 + 3
    # monotone non-decreasing both curves
    seqs = sorted(out)
    for a, b in zip(seqs, seqs[1:]):
        assert out[b]["cum_vocab"] >= out[a]["cum_vocab"]
        assert out[b]["cum_tokens"] > out[a]["cum_tokens"]
