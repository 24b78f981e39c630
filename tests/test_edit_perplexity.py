"""Round-7 text/dedup wave: FastSS edit-distance join, bigram-LM
perplexity scoring, and Monroe log-odds distinctive terms."""

import math

import pytest


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_edit_join_hand_cases(spark):
    from unifydb_spark.operators.dedup import edit_distance_join

    docs = spark.createDataFrame(
        [(1, "abcd"), (2, "abxd"), (3, "abcde"), (4, "zzzz"), (5, "abcd")],
        ["doc_id", "text"],
    )
    out = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_join(docs).collect()
    }
    # substitution, insertion, exact duplicate — transposition (dist 2)
    # and unrelated keys must NOT appear
    assert out == {(1, 2): 1, (1, 3): 1, (1, 5): 0, (2, 5): 1, (3, 5): 1}


def test_edit_join_blocking_is_lossless(spark):
    from unifydb_spark.operators.dedup import edit_distance_join

    # every string of length 1..3 over {a, b}: the deletion-neighborhood
    # blocker must find EXACTLY the brute-force ed<=1 pairs
    strings = []
    for n in (1, 2, 3):
        for i in range(2**n):
            strings.append("".join("ab"[(i >> j) & 1] for j in range(n)))
    rows = [(i, s) for i, s in enumerate(strings)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_join(docs).collect()
    }
    want = {}
    for i, a in rows:
        for j, b in rows:
            if i < j and _lev(a, b) <= 1:
                want[(i, j)] = _lev(a, b)
    assert got == want


def test_doc_perplexity_hand_computed(spark):
    from unifydb_spark.operators.text import doc_perplexity

    docs = spark.createDataFrame(
        [(1, "a a"), (2, "a b")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in doc_perplexity(docs).collect()}
    # corpus bigrams: (<s>,a):2 (a,a):1 (a,b):1; contexts <s>:2 a:2; V=2
    h1 = -(math.log(2.5 / 3.0) + math.log(1.5 / 3.0)) / 2.0
    h2 = -(math.log(2.5 / 3.0) + math.log(1.5 / 3.0)) / 2.0
    assert out[1]["n_tokens"] == 2
    assert out[1]["cross_entropy"] == pytest.approx(h1, abs=1e-6)
    assert out[2]["cross_entropy"] == pytest.approx(h2, abs=1e-6)
    assert out[1]["ppl"] == pytest.approx(math.exp(out[1]["cross_entropy"]), abs=1e-3)


def test_doc_perplexity_surprising_doc_scores_higher(spark):
    from unifydb_spark.operators.text import doc_perplexity

    common = [(i, "the cat sat on the mat") for i in range(1, 9)]
    weird = [(9, "zq xv qq zz vx qz")]
    docs = spark.createDataFrame(common + weird, ["doc_id", "text"])
    out = {r["doc_id"]: r["cross_entropy"] for r in doc_perplexity(docs).collect()}
    assert out[9] > out[1]


def test_distinctive_terms_finds_group_marker(spark):
    from unifydb_spark.operators.text import distinctive_terms

    rows = []
    for i in range(10):
        rows.append((i, "apple apple common words here", "A"))
    for i in range(10, 20):
        rows.append((i, "banana banana common words here", "B"))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = distinctive_terms(docs, top_k=2).collect()
    top = {}
    for r in out:
        top.setdefault(r["source"], []).append(r["term"])
    assert top["A"][0] == "apple" and top["B"][0] == "banana"
    assert all(len(v) == 2 for v in top.values())
    za = {r["term"]: r["z"] for r in out if r["source"] == "A"}
    assert za["apple"] > 0


def test_dedup_eval_planted_duplicates(spark):
    from unifydb_spark.operators.dedup import dedup_eval

    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    rows = [
        (1, base),
        (2, base + " extra"),  # near-dup of 1
        (3, "completely different words about spark catalyst optimizer plans"),
        (4, base),             # exact dup of 1
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup_eval(docs).collect()[0]
    # truth must contain the (1,2),(1,4),(2,4) cluster; LSH must recall
    # exact dups (identical signatures) so n_both >= 1
    assert out["n_truth"] == 3
    assert out["n_both"] >= 1
    assert out["recall"] is not None and 0.0 < out["recall"] <= 1.0
    assert out["precision"] is not None


def test_char_entropy_known_values(spark):
    from unifydb_spark.operators.text import char_entropy

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in char_entropy(docs).collect()}
    assert out[1]["entropy_bits"] == 0.0  # single symbol
    assert out[2]["entropy_bits"] == 1.0  # two equiprobable symbols
    assert out[3]["entropy_bits"] == 2.0  # four equiprobable symbols
    assert out[3]["distinct_chars"] == 4 and out[3]["n_chars"] == 4


def test_common_prefix_detects_boilerplate(spark):
    from unifydb_spark.operators.text import common_prefix_report

    rows = [
        (1, "HEADER v2 | the actual content one", "crawl"),
        (2, "HEADER v2 | different body text here", "crawl"),
        (3, "HEADER v2 | yet another payload", "crawl"),
        (4, "no banner at all", "clean"),
        (5, "other text entirely", "clean"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r["source"]: r for r in common_prefix_report(docs).collect()}
    assert out["crawl"]["lcp"] == "HEADER v2 | "
    assert out["crawl"]["lcp_len"] == 12
    assert out["clean"]["lcp_len"] == 0 and out["clean"]["lcp"] == ""


def test_common_prefix_single_doc_is_whole_prefix(spark):
    from unifydb_spark.operators.text import common_prefix_report

    docs = spark.createDataFrame(
        [(1, "only document", "s")], ["doc_id", "text", "source"]
    )
    out = common_prefix_report(docs).collect()[0]
    assert out["lcp"] == "only document"


def test_novelty_curve_repeats_decay(spark):
    from unifydb_spark.operators.text import novelty_curve

    # first half unique content, second half verbatim repeats of it
    uniq = [(i, f"alpha{i} beta{i} gamma{i} delta{i}") for i in range(10)]
    reps = [(10 + i, uniq[i][1]) for i in range(10)]
    docs = spark.createDataFrame(uniq + reps, ["doc_id", "text"])
    out = {r["bucket"]: r for r in novelty_curve(docs, n_buckets=2).collect()}
    assert out[0]["novelty_rate"] == 1.0  # all first occurrences
    assert out[1]["novelty_rate"] == 0.0  # all repeats


def test_overdispersion_detects_bursts(spark):
    import datetime

    from unifydb_spark.operators.events import overdispersion_check

    def ts(d):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d)

    rows = []
    # steady: 4/day for 12 days (fano ~ 0) ; bursty: 0 or 12 alternating
    for d in range(12):
        for _ in range(4):
            rows.append(("steady", ts(d)))
        if d % 2 == 0:
            for _ in range(12):
                rows.append(("bursty", ts(d)))
    df = spark.createDataFrame(rows, ["event_type", "ts"])
    out = {r["etype"]: r for r in overdispersion_check(df).collect()}
    assert out["steady"]["fano"] == 0.0
    assert not out["steady"]["overdispersed"]
    assert out["bursty"]["fano"] > 5.0
    assert out["bursty"]["overdispersed"]


def test_corpus_card_hand_computed(spark):
    from unifydb_spark.operators.text import corpus_card

    rows = [
        (1, "a b c", "en", "s1"),
        (2, "a b c", "en", "s1"),      # exact dup of 1
        (3, "d e", "fr", "s2"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    out = {r["metric"]: r["value"] for r in corpus_card(docs).collect()}
    assert out["n_docs"] == 3.0
    assert out["n_tokens"] == 8.0
    assert out["exact_dup_rate"] == pytest.approx(1 / 3, abs=1e-6)
    assert out["n_langs"] == 2.0 and out["n_sources"] == 2.0
    assert out["top_lang_share"] == pytest.approx(2 / 3, abs=1e-6)
    assert out["vocab_size"] == 5.0
    assert out["type_token_ratio"] == pytest.approx(5 / 8, abs=1e-6)
