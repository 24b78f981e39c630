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


def test_scd2_intervals_semantics(spark):
    from datetime import datetime

    from unifydb_spark.operators.events import scd2_intervals

    rows = [
        # user 1: a, a, b, a  -> intervals a, b, a (middle run collapses)
        (1, "a", datetime(2026, 1, 1, 0, 0, 0), 1),
        (1, "a", datetime(2026, 1, 2, 0, 0, 0), 2),
        (1, "b", datetime(2026, 1, 3, 0, 0, 0), 3),
        (1, "a", datetime(2026, 1, 4, 0, 0, 0), 4),
        # user 2: single value, stays current
        (2, "x", datetime(2026, 1, 1, 12, 0, 0), 5),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts", "event_id"])
    out = scd2_intervals(ev).orderBy("user_id", "valid_from").collect()
    u1 = [r for r in out if r["user_id"] == 1]
    assert [(r["event_type"], r["valid_from"], r["valid_to"]) for r in u1] == [
        ("a", "2026-01-01 00:00:00", "2026-01-03 00:00:00"),
        ("b", "2026-01-03 00:00:00", "2026-01-04 00:00:00"),
        ("a", "2026-01-04 00:00:00", "9999-12-31 00:00:00"),
    ]
    # intervals chain gaplessly; exactly one current per key
    assert [r["is_current"] for r in u1] == [False, False, True]
    [u2] = [r for r in out if r["user_id"] == 2]
    assert u2["is_current"] and u2["valid_to"] == "9999-12-31 00:00:00"


def test_scd2_intervals_null_attr_transitions(spark):
    """Null-SAFE change detection (r5 advice): transitions into/out of a
    NULL attribute are real history rows, NULL runs compress, and a key
    whose FIRST value is NULL still gets its opening interval."""
    from datetime import datetime

    from unifydb_spark.operators.events import scd2_intervals

    rows = [
        # user 1: a, NULL, NULL, b -> intervals a, NULL, b
        (1, "a", datetime(2026, 1, 1), 1),
        (1, None, datetime(2026, 1, 2), 2),
        (1, None, datetime(2026, 1, 3), 3),
        (1, "b", datetime(2026, 1, 4), 4),
        # user 2: starts NULL, then x
        (2, None, datetime(2026, 1, 1), 5),
        (2, "x", datetime(2026, 1, 2), 6),
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp, event_id bigint"
    )
    out = scd2_intervals(ev).orderBy("user_id", "valid_from").collect()
    u1 = [(r["event_type"], r["valid_from"], r["valid_to"])
          for r in out if r["user_id"] == 1]
    assert u1 == [
        ("a", "2026-01-01 00:00:00", "2026-01-02 00:00:00"),
        (None, "2026-01-02 00:00:00", "2026-01-04 00:00:00"),
        ("b", "2026-01-04 00:00:00", "9999-12-31 00:00:00"),
    ]
    u2 = [(r["event_type"], r["is_current"]) for r in out if r["user_id"] == 2]
    assert u2 == [(None, False), ("x", True)]


def test_table_profile_values_and_single_scan(spark, docs):
    from unifydb_spark.operators.stats import table_profile

    out = {r["col_name"]: r for r in table_profile(docs, ["doc_id", "lang"]).collect()}
    n = docs.count()
    assert out["doc_id"]["n_nonnull"] == n
    assert out["doc_id"]["n_null"] == 0
    assert out["doc_id"]["ndv"] == n  # primary key
    langs = docs.select("lang").distinct().count()
    assert out["lang"]["ndv"] == langs
    # min/max rank on the NATIVE type (r5 advice): lexicographic order
    # over stringified ints reported max(1..500) as '99'
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    assert out["doc_id"]["min_val"] == str(min(ids))
    assert out["doc_id"]["max_val"] == str(max(ids))
    # one table scan: the multi-distinct agg plans as a single FileScan
    plan = _final_plan(table_profile(docs, ["doc_id", "lang"]))
    assert plan.count("FileScan parquet") == 1
    assert "Expand" in plan


def test_exact_quantile_duplicate_run_boundary(spark):
    """Regression: a duplicate run larger than the sliver threshold
    whose LAST element is rank k, with frac > 0 — the interpolation
    partner k+1 is the first value beyond the run, not the run value."""
    from pyspark.sql import functions as F
    from unifydb_spark.operators.stats import exact_quantiles_scalable

    df = spark.range(3001).select(
        F.when(F.col("id") < 3000, F.lit(1.0)).otherwise(F.lit(2.0)).alias("x")
    )
    # n=3001 -> r = p*3000 = 2999.5 -> k0=2999 (last 1.0), frac=0.5
    p = 2999.5 / 3000.0
    [row] = exact_quantiles_scalable(
        df, "x", probs=(p,), buckets=8, exact_threshold=100
    ).collect()
    assert row["value"] == 1.5


def test_group_exact_quantiles_matches_buffering_percentile(spark):
    from pyspark.sql import functions as F
    from unifydb_spark.operators.stats import (
        exact_group_quantiles_scalable,
        group_quantiles,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    probs = (0.25, 0.5, 0.9, 0.99)
    narrow = {
        (r["l_returnflag"], r["quantile"]): r["value"]
        for r in exact_group_quantiles_scalable(
            li, "l_returnflag", "l_extendedprice", probs=probs,
            buckets=64, exact_threshold=50,  # force many narrowing rounds
        ).collect()
    }
    buffered = group_quantiles(
        li, "l_returnflag", "l_extendedprice", probs=probs
    ).collect()
    assert len(narrow) == 3 * len(probs)
    for r in buffered:
        for p, name in [(p, ("p%g" % (p * 100)).replace(".", "_")) for p in probs]:
            assert narrow[(r["l_returnflag"], name)] == r[name], (
                r["l_returnflag"], name
            )


def test_group_exact_quantiles_edges(spark):
    from pyspark.sql import functions as F
    from unifydb_spark.operators.stats import exact_group_quantiles_scalable

    # group 'dup': duplicate run bigger than threshold with boundary rank;
    # group 'tiny': 2 rows (ranks clamp); group 'one': single value
    dup = spark.range(3001).select(
        F.lit("dup").alias("g"),
        F.when(F.col("id") < 3000, F.lit(1.0)).otherwise(F.lit(2.0)).alias("x"),
    )
    tiny = spark.createDataFrame(
        [("tiny", 10.0), ("tiny", 20.0), ("one", 7.0)], ["g", "x"]
    )
    p = 2999.5 / 3000.0
    out = {
        (r["g"], r["quantile"]): r["value"]
        for r in exact_group_quantiles_scalable(
            dup.union(tiny), "g", "x", probs=(0.5, p),
            buckets=8, exact_threshold=100,
        ).collect()
    }
    pname = ("p%g" % (p * 100)).replace(".", "_")
    assert out[("dup", pname)] == 1.5  # interpolates into the value beyond
    assert out[("dup", "p50")] == 1.0
    assert out[("tiny", "p50")] == 15.0
    assert out[("one", "p50")] == 7.0
    assert out[("one", pname)] == 7.0


def test_balanced_sample_exact_counts_and_determinism(spark, docs):
    from unifydb_spark.operators.text import balanced_sample

    import collections

    out = balanced_sample(
        docs.select("doc_id", "source", "lang", "n_chars"), n_per_group=7
    ).collect()
    per = collections.Counter(r["source"] for r in out)
    group_sizes = {
        r["source"]: r["c"]
        for r in docs.groupBy("source").agg(F.count("*").alias("c")).collect()
    }
    for g, c in per.items():
        assert c == min(7, group_sizes[g])
    assert set(per) == set(group_sizes)
    # deterministic: identical selection on rerun
    again = balanced_sample(
        docs.select("doc_id", "source", "lang", "n_chars"), n_per_group=7
    ).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in again)


def test_length_histogram_shares(spark):
    from pyspark.sql import functions as F
    from unifydb_spark.operators.stats import length_histogram

    df = spark.createDataFrame(
        [(l,) for l in [3, 5, 17, 18, 40, 40]], "n bigint"
    )
    out = length_histogram(df, F.col("n"), bin_width=16).orderBy("bin_lo").collect()
    assert [(r["bin_lo"], r["n_docs"], r["n_tokens"]) for r in out] == [
        (0, 2, 8), (16, 2, 35), (32, 2, 80),
    ]
    assert out[-1]["cum_doc_share"] == 1.0
    assert out[-1]["cum_token_share"] == 1.0
    assert out[0]["cum_doc_share"] == round(2 / 6, 6)
    assert out[1]["cum_token_share"] == round(43 / 123, 6)


def test_join_skew_report_strategies(spark):
    from pyspark.sql import functions as F
    from unifydb_spark.operators.stats import join_skew_report

    big = spark.range(10000).select(
        F.when(F.col("id") < 5000, F.lit(7)).otherwise(F.col("id")).alias("k")
    )  # key 7 holds 50% of rows
    small = spark.range(100).select(F.col("id").alias("k"))
    uniform = spark.range(10000).select((F.col("id") % 1000).alias("k"))

    [r] = join_skew_report(big, small, "k", "k", broadcast_rows=50).collect()
    # small side over the broadcast bound, big side skewed -> salt
    assert r["strategy"] == "salt_hot_keys"
    assert r["left_top_share"] > 0.4
    assert r["left_ndv"] == 5001

    [r] = join_skew_report(big, small, "k", "k", broadcast_rows=1000).collect()
    assert r["strategy"] == "broadcast_right"  # broadcast beats salting

    [r] = join_skew_report(uniform, big, "k", "k", broadcast_rows=50).collect()
    # right side is the skewed one now
    assert r["strategy"] == "salt_hot_keys" and r["right_top_share"] > 0.4

    [r] = join_skew_report(
        uniform, uniform, "k", "k", broadcast_rows=50, skew_share=0.01
    ).collect()
    assert r["strategy"] == "shuffle_hash"  # 0.1% per key, no skew


def test_winsorize_scale_semantics(spark):
    import statistics

    from unifydb_spark.operators.stats import winsorize_scale

    vals = list(range(1, 100)) + [10_000.0]  # one huge outlier
    df = spark.createDataFrame(
        [(i, "g", float(v)) for i, v in enumerate(vals)],
        "id bigint, g string, v double",
    )
    out = {r["id"]: r for r in winsorize_scale(
        df, "g", "v", "id", p_lo=0.05, p_hi=0.95).collect()}
    # the outlier is clamped to the p95 quantile, not dropped
    assert len(out) == 100
    clamped = [out[i]["clamped"] for i in range(100)]
    assert max(clamped) < 10_000.0
    assert out[99]["clamped"] == max(clamped)
    # z-scores standardize the clamped values
    zs = [out[i]["zscore"] for i in range(100)]
    m = statistics.mean(clamped)
    sd = statistics.stdev(clamped)
    for i in (0, 50, 99):
        assert abs(zs[i] - (clamped[i] - m) / sd) < 1e-4
    # zero-variance group -> NULL z, clamped = value
    flat = spark.createDataFrame(
        [(i, "f", 5.0) for i in range(10)], "id bigint, g string, v double"
    )
    rows = winsorize_scale(flat, "g", "v", "id").collect()
    assert all(r["zscore"] is None and r["clamped"] == 5.0 for r in rows)


def test_table_diff_statuses_null_safe(spark):
    from unifydb_spark.operators.quality import table_diff

    old = spark.createDataFrame(
        [(1, "a", None), (2, "b", "x"), (3, "c", "y"), (4, "d", "z")],
        "k bigint, c1 string, c2 string",
    )
    new = spark.createDataFrame(
        [(1, "a", None), (2, "b", None), (3, "C", "Y"), (5, "e", "w")],
        "k bigint, c1 string, c2 string",
    )
    out = {r["k"]: (r["status"], r["n_changed_cols"])
           for r in table_diff(old, new, ["k"], ["c1", "c2"]).collect()}
    assert out[1] == ("unchanged", 0)   # NULL == NULL is not a change
    assert out[2] == ("changed", 1)     # value -> NULL IS a change
    assert out[3] == ("changed", 2)
    assert out[4] == ("removed", 0)
    assert out[5] == ("added", 0)


def test_regression_metrics_known_values(spark):
    import math

    from unifydb_spark.operators.stats import regression_metrics

    # y = [1..5], pred = y + 1 -> bias 1, mae 1, rmse 1, r2 = 1 - 5/10
    rows = [(i, "g", float(i), float(i + 1)) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "id bigint, g string, y double, p double")
    [r] = regression_metrics(df, "g", "y", "p").collect()
    assert (r["n"], r["bias"], r["mae"], r["rmse"]) == (5, 1.0, 1.0, 1.0)
    assert abs(r["r2"] - 0.5) < 1e-9
    # perfect predictions
    perf = spark.createDataFrame(
        [(i, "g", float(i), float(i)) for i in range(1, 6)],
        "id bigint, g string, y double, p double",
    )
    [r] = regression_metrics(perf, "g", "y", "p").collect()
    assert (r["rmse"], r["mae"], r["bias"], r["r2"]) == (0.0, 0.0, 0.0, 1.0)
    # constant label -> NULL r2 (no variance to explain)
    flat = spark.createDataFrame(
        [(i, "g", 3.0, 2.0) for i in range(5)],
        "id bigint, g string, y double, p double",
    )
    [r] = regression_metrics(flat, "g", "y", "p").collect()
    assert r["r2"] is None and r["bias"] == -1.0


def test_binary_auc_matches_sklearn_formula(spark):
    """Exact rank-sum AUC vs a brute-force pairwise computation,
    including ties (counted 1/2)."""
    import itertools
    import random

    from unifydb_spark.operators.stats import binary_auc

    rng = random.Random(5)
    rows = [
        (i, "g", rng.random() < 0.4, float(rng.randint(0, 20)))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id bigint, g string, y boolean, s double")
    [r] = binary_auc(df, "g", "y", "s").collect()
    pos = [s for _, _, y, s in rows if y]
    neg = [s for _, _, y, s in rows if not y]
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p, n in itertools.product(pos, neg)
    )
    want = wins / (len(pos) * len(neg))
    assert abs(r["auc"] - want) < 2e-6  # operator rounds to 6 decimals
    assert (r["n_pos"], r["n_neg"]) == (len(pos), len(neg))
    # degenerate: single-class group -> NULL
    one = spark.createDataFrame(
        [(1, "h", True, 1.0), (2, "h", True, 2.0)],
        "id bigint, g string, y boolean, s double",
    )
    [r] = binary_auc(one, "g", "y", "s").collect()
    assert r["auc"] is None


def test_classification_metrics_confusion(spark):
    from unifydb_spark.operators.stats import classification_metrics

    rows = [
        ("g", True, True)] * 6 + [("g", False, True)] * 2 + [
        ("g", True, False)] * 1 + [("g", False, False)] * 11
    df = spark.createDataFrame(rows, "g string, y boolean, p boolean")
    [r] = classification_metrics(df, "g", "y", "p").collect()
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (6, 2, 1, 11)
    assert r["precision"] == 0.75
    assert abs(r["recall"] - 6 / 7) < 1e-6
    assert r["accuracy"] == 0.85
    # no positive predictions -> NULL precision/f1, recall 0
    never = spark.createDataFrame(
        [("h", True, False), ("h", False, False)],
        "g string, y boolean, p boolean",
    )
    [r] = classification_metrics(never, "g", "y", "p").collect()
    assert r["precision"] is None and r["f1"] is None and r["recall"] == 0.0


def test_calibration_curve_semantics(spark):
    from unifydb_spark.operators.stats import calibration_curve

    # scores 0..99, label = score >= 50: a perfectly calibrated hard
    # threshold -> bins below 0.5 have pos_rate 0, above have 1
    rows = [(i, "g", float(i), i >= 50) for i in range(100)]
    df = spark.createDataFrame(rows, "id bigint, g string, s double, y boolean")
    out = {r["bin"]: r for r in calibration_curve(
        df, "g", "y", "s", n_bins=10).collect()}
    assert len(out) == 10
    assert sum(r["n"] for r in out.values()) == 100
    for b in range(5):
        assert out[b]["pos_rate"] == 0.0
    for b in range(5, 10):
        assert out[b]["pos_rate"] == 1.0
    # mean_score inside each bin sits within the bin's span
    for b, r in out.items():
        assert b / 10 <= r["mean_score"] <= (b + 1) / 10
    # degenerate: constant score -> single bin 0
    flat = spark.createDataFrame(
        [(i, "h", 5.0, i % 2 == 0) for i in range(10)],
        "id bigint, g string, s double, y boolean",
    )
    rows = calibration_curve(flat, "h"[:0] or "g", "y", "s").collect()
    assert len(rows) == 1 and rows[0]["bin"] == 0 and rows[0]["n"] == 10


def test_mutual_information_independence_and_identity(spark):
    import math

    from unifydb_spark.operators.stats import mutual_information

    # independent uniform x (2 values) and y (4 values): MI = 0
    rows = [(i, str(i % 2), str(i % 4 // 1)) for i in range(400)]
    # careful: i%2 and i%4 are NOT independent; build a true product grid
    rows = [(i, str(i % 2), str((i // 2) % 4)) for i in range(400)]
    df = spark.createDataFrame(rows, "id bigint, x string, y string")
    [r] = mutual_information(df, "x", "y").collect()
    assert r["mi"] == 0.0 and r["nmi"] == 0.0
    assert abs(r["h_x"] - math.log(2)) < 1e-6
    assert abs(r["h_y"] - math.log(4)) < 1e-6
    # y == x: MI equals the entropy, NMI = 1
    same = spark.createDataFrame(
        [(i, str(i % 3), str(i % 3)) for i in range(300)],
        "id bigint, x string, y string",
    )
    [r] = mutual_information(same, "x", "y").collect()
    assert abs(r["mi"] - math.log(3)) < 1e-6
    assert r["nmi"] == 1.0
    # nulls excluded from the table
    nn = spark.createDataFrame(
        [(1, "a", "p"), (2, None, "q"), (3, "b", None), (4, "b", "q")],
        "id bigint, x string, y string",
    )
    [r] = mutual_information(nn, "x", "y").collect()
    assert r["n"] == 2


def test_group_trend_known_line_and_degenerate(spark):
    from unifydb_spark.operators.stats import group_trend

    # exact line y = 3x + 7 -> slope 3, intercept 7, r2 = 1
    rows = [(i, "g", float(i), 3.0 * i + 7.0) for i in range(20)]
    df = spark.createDataFrame(rows, "id bigint, g string, x double, y double")
    [r] = group_trend(df, "g", "x", "y").collect()
    assert (r["slope"], r["intercept"], r["r2"]) == (3.0, 7.0, 1.0)
    # noise-free anti-correlation
    rows = [(i, "g", float(i), -2.0 * i) for i in range(20)]
    df = spark.createDataFrame(rows, "id bigint, g string, x double, y double")
    [r] = group_trend(df, "g", "x", "y").collect()
    assert (r["slope"], r["intercept"], r["r2"]) == (-2.0, 0.0, 1.0)
    # constant x -> NULL slope; constant y -> slope 0 with NULL r2
    cx = spark.createDataFrame(
        [(i, "g", 5.0, float(i)) for i in range(5)],
        "id bigint, g string, x double, y double",
    )
    [r] = group_trend(cx, "g", "x", "y").collect()
    assert r["slope"] is None
    cy = spark.createDataFrame(
        [(i, "g", float(i), 4.0) for i in range(5)],
        "id bigint, g string, x double, y double",
    )
    [r] = group_trend(cy, "g", "x", "y").collect()
    assert r["slope"] == 0.0 and r["r2"] is None


def test_k_anonymity_report_and_token_drift(spark):
    from unifydb_spark.operators.quality import k_anonymity_report
    from unifydb_spark.operators.text import token_drift

    # 10 rows in group A, 3 in B, 1 in C -> with k=5: B and C at risk
    rows = ([("a", "x")] * 10) + ([("b", "y")] * 3) + [("c", "z")]
    df = spark.createDataFrame(rows, "q1 string, q2 string")
    [r] = k_anonymity_report(df, ["q1", "q2"], k=5).collect()
    assert r["n_rows"] == 14 and r["n_groups"] == 3
    assert r["n_unique_rows"] == 1 and r["n_below_k"] == 2
    assert r["rows_at_risk"] == 4
    assert abs(r["risk_share"] - 4 / 14) < 1e-6
    assert r["min_group"] == 1 and r["median_group"] == 3.0

    old = spark.createDataFrame([(0, "aa bb bb cc")], "doc_id bigint, text string")
    new = spark.createDataFrame([(1, "aa aa dd")], "doc_id bigint, text string")
    drift = {r["tok"]: r for r in token_drift(old, new, top_k=10).collect()}
    # bb: 0.5 -> 0; dd: 0 -> 1/3; aa: 0.25 -> 2/3; cc: 0.25 -> 0
    assert drift["bb"]["p_new"] == 0.0 and drift["bb"]["p_old"] == 0.5
    assert drift["dd"]["p_old"] == 0.0
    assert abs(drift["aa"]["delta"] - (2 / 3 - 0.25)) < 1e-6
    # ranking by |delta|: bb (0.5) first, aa (~0.4167) second
    ordered = sorted(drift.values(), key=lambda r: -abs(r["delta"]))
    assert ordered[0]["tok"] == "bb" and ordered[1]["tok"] == "aa"


def test_trimmed_mean_drops_outlier_and_benford_detects(spark):
    import math

    from unifydb_spark.operators.quality import benford_report
    from unifydb_spark.operators.stats import trimmed_mean

    vals = [float(v) for v in range(1, 100)] + [10_000.0]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)], "id bigint, g string, v double"
    )
    [r] = trimmed_mean(df, "g", "v", 0.05, 0.95).collect()
    assert r["n"] == 100 and r["n_used"] < 100
    assert r["trimmed_mean"] < 60 < r["raw_mean"]  # outlier excluded

    # Benford-conforming data: v = 10^u for uniform-ish u -> low chi2;
    # uniform integers 1000..9999 -> flat first digits, huge chi2
    conforming = spark.createDataFrame(
        [(i, 10 ** (i * 3.0 / 9999)) for i in range(1, 10000)],
        "id bigint, v double",
    )
    flat = spark.createDataFrame(
        [(i, float(1000 + i)) for i in range(9000)], "id bigint, v double"
    )
    chi_c = sum(r["chi2_term"] for r in benford_report(conforming, "v").collect())
    chi_f = sum(r["chi2_term"] for r in benford_report(flat, "v").collect())
    assert chi_c < 100 < chi_f  # flat digits blow up the statistic
    # shares: digit 1 under Benford ~0.301
    d1 = [r for r in benford_report(conforming, "v").collect() if r["digit"] == 1][0]
    assert abs(d1["obs_share"] - math.log10(2)) < 0.02
    # zero/negative excluded
    withz = spark.createDataFrame(
        [(1, 0.0), (2, -5.0), (3, 42.0)], "id bigint, v double"
    )
    rows = benford_report(withz, "v").collect()
    assert sum(r["n"] for r in rows) == 1


def test_lorenz_points_shape(spark):
    from unifydb_spark.operators.stats import lorenz_points

    # equal values: Lorenz = diagonal (value_share == pop_share)
    eq = spark.createDataFrame(
        [(i, "eq", 2.0) for i in range(100)], "id bigint, g string, v double"
    )
    out = lorenz_points(eq, "g", "v", "id", 10).collect()
    assert len(out) == 10
    for r in out:
        assert abs(r["value_share"] - r["pop_share"]) < 1e-6
    assert out[-1]["pop_share"] == 1.0 and out[-1]["value_share"] == 1.0
    # extreme concentration: bottom 90% own nothing
    un = spark.createDataFrame(
        [(i, "un", 0.0) for i in range(90)] + [(i, "un", 10.0) for i in range(90, 100)],
        "id bigint, g string, v double",
    )
    pts = {r["point"]: r for r in lorenz_points(un, "g", "v", "id", 10).collect()}
    assert pts[9]["value_share"] == 0.0
    assert pts[10]["value_share"] == 1.0
    # curve is convex-ish: value_share never exceeds pop_share
    assert all(r["value_share"] <= r["pop_share"] + 1e-9 for r in pts.values())
