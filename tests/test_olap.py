"""OLAP operator tests: grouping sets equal their per-level groupBys,
windowed_share's whole pipeline runs on ONE exchange, topk_per_group
matches a per-group sort+limit."""

import pytest
from pyspark.sql import functions as F

from unifydb_spark.operators.olap import (
    grouping_set_metrics,
    topk_per_group,
    windowed_share,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def lineitem(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


@pytest.fixture()
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def _executed_plan(df) -> str:
    """Final (AQE) executed plan only — toString() appends the pre-AQE
    '== Initial Plan ==' section, which would double-count exchanges."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_cube_matches_per_level_groupbys(spark, lineitem):
    cube = {
        (r["l_returnflag"], r["l_linestatus"], r["gid"]): (
            r["cnt"],
            r["sum_l_extendedprice"],
        )
        for r in grouping_set_metrics(
            lineitem, ["l_returnflag", "l_linestatus"], "l_extendedprice",
            mode="cube",
        ).collect()
    }
    # 4 grouping sets: cells, per-flag, per-status, grand total
    assert sorted({k[2] for k in cube}) == [0, 1, 2, 3]

    def level(cols):
        return {
            tuple(str(r[c]) for c in cols): (
                r["cnt"],
                float(r["s"]),
            )
            for r in lineitem.groupBy(*cols)
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.round(
                    F.sum(F.col("l_extendedprice").cast("decimal(30,10)"))
                    .cast("double"),
                    4,
                ).alias("s"),
            )
            .collect()
        }

    for (rf, ls), v in level(["l_returnflag", "l_linestatus"]).items():
        assert cube[(rf, ls, 0)] == v
    for (rf,), v in level(["l_returnflag"]).items():
        assert cube[(rf, "(all)", 1)] == v
    for (ls,), v in level(["l_linestatus"]).items():
        assert cube[("(all)", ls, 2)] == v
    n = lineitem.count()
    assert cube[("(all)", "(all)", 3)][0] == n


def test_cube_is_single_shuffle(spark, lineitem):
    plan = _executed_plan(
        grouping_set_metrics(
            lineitem, ["l_returnflag", "l_linestatus"], "l_extendedprice",
            mode="cube",
        )
    )
    # one Expand feeding ONE exchange (partial agg before it); no
    # per-grouping-set rescan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Expand" in plan


def test_windowed_share_single_exchange(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from unifydb_spark.values import normalize_event_ts

    ev = normalize_event_ts(spark.read.parquet(f"{SF}/events.parquet"))
    out = windowed_share(ev)
    plan = _executed_plan(out)
    # the up-front repartition(user) is the ONLY exchange: the (user,day)
    # agg and all three user-partitioned windows reuse its distribution
    assert plan.count("Exchange") == 1, plan

    # semantics: running total of the last day == user total; shares sum to 1
    import collections

    rows = out.collect()
    by_user = collections.defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r["day"])
        total = round(sum(r["daily_value"] for r in rs), 2)
        assert abs(rs[-1]["running_value"] - total) < 1e-6
        assert abs(sum(r["share_of_user"] for r in rs) - 1.0) < 1e-3
        for prev, cur in zip(rs, rs[1:]):
            assert (
                abs(cur["day_delta"] - round(cur["daily_value"] - prev["daily_value"], 4))
                < 1e-6
            )


def test_topk_per_group_matches_sort_limit(spark, orders):
    got = {
        (r["o_custkey"], r["rank_in_group"]): r["o_orderkey"]
        for r in topk_per_group(
            orders.select("o_custkey", "o_orderkey", "o_totalprice"),
            ["o_custkey"],
            "o_totalprice",
            "o_orderkey",
            k=3,
        ).collect()
    }
    rows = orders.select("o_custkey", "o_orderkey", "o_totalprice").collect()
    import collections

    groups = collections.defaultdict(list)
    for r in rows:
        groups[r["o_custkey"]].append(r)
    for ck, rs in groups.items():
        rs.sort(key=lambda r: (-r["o_totalprice"], r["o_orderkey"]))
        for i, r in enumerate(rs[:3], start=1):
            assert got[(ck, i)] == r["o_orderkey"]
    assert len(got) == sum(min(3, len(rs)) for rs in groups.values())


def test_topk_no_global_sort(spark, orders):
    df = topk_per_group(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        "o_totalprice",
        "o_orderkey",
        k=3,
    )
    plan = _executed_plan(df)
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan


# ---------------------------------------------------------------------------
# KMV sketch (operators/sketch.py)


def test_kmv_sketch_is_true_bottomk(spark):
    from pyspark.sql import functions as F
    from unifydb_spark.operators.sketch import kmv_sketch

    df = spark.range(1000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.concat(F.lit("key"), F.col("id")).alias("k"),
    )
    sk = kmv_sketch(df, "k", "g", k=16)
    got = {
        (r["grp"], r["pos"]): r["hval"] for r in sk.collect()
    }
    # direct computation: bottom-16 of distinct hashes per group
    direct = df.select(
        F.col("g").alias("grp"),
        F.conv(F.substring(F.md5(F.col("k")), 1, 15), 16, 10)
        .cast("long")
        .alias("hval"),
    ).distinct().collect()
    import collections

    per = collections.defaultdict(list)
    for r in direct:
        per[r["grp"]].append(r["hval"])
    for g, hs in per.items():
        hs.sort()
        for i, h in enumerate(hs[:16], start=1):
            assert got[(g, i)] == h
    assert len(got) == 32


def test_kmv_null_keys_excluded(spark):
    """Null keys have no hash rank (md5(NULL) = NULL) and must be
    excluded from the sketch — Spark's nulls-first window vs DuckDB's
    nulls-last ROW_NUMBER would otherwise put the null at opposite ends
    and break the bit-exact hash-match contract (r5 advice)."""
    from pyspark.sql import functions as F
    from unifydb_spark.operators.sketch import kmv_distinct, kmv_sketch

    df = spark.createDataFrame(
        [("g1", str(i)) for i in range(30)] + [("g1", None)] * 5,
        "g string, k string",
    )
    sk = kmv_sketch(df, "k", "g", k=128)
    assert sk.filter(F.col("hval").isNull()).count() == 0
    assert sk.count() == 30  # the 30 non-null distinct keys, complete
    [r] = kmv_distinct(df, "k", "g", k=128).collect()
    # true_distinct (countDistinct) ignores nulls too -> both sides 30
    assert (r["true_distinct"], r["kmv_est"]) == (30, 30.0)


def test_kmv_distinct_small_group_is_exact_and_large_is_close(spark):
    from pyspark.sql import functions as F
    from unifydb_spark.operators.sketch import kmv_distinct

    small = spark.range(40).select(
        F.lit("small").alias("g"), F.col("id").cast("string").alias("k")
    )
    big = spark.range(20000).select(
        F.lit("big").alias("g"), F.col("id").cast("string").alias("k")
    )
    out = {
        r["g"]: (r["true_distinct"], r["kmv_est"])
        for r in kmv_distinct(small.union(big), "k", "g", k=128).collect()
    }
    assert out["small"] == (40, 40.0)  # sketch complete -> exact
    true_d, est = out["big"]
    assert true_d == 20000
    assert abs(est - true_d) / true_d < 0.3  # ~1/sqrt(128) noise band


def test_kmv_jaccard_exact_when_sketches_complete(spark):
    from pyspark.sql import functions as F
    from unifydb_spark.operators.sketch import kmv_jaccard

    # A = 0..59, B = 30..89 -> |A∩B| = 30, |A∪B| = 90, J = 1/3; both
    # below k=128 so the sketch algebra must be EXACT
    a = spark.range(0, 60).select(
        F.lit("a").alias("g"), F.col("id").cast("string").alias("k")
    )
    b = spark.range(30, 90).select(
        F.lit("b").alias("g"), F.col("id").cast("string").alias("k")
    )
    [r] = kmv_jaccard(a.union(b), "k", "g", k=128).collect()
    assert (r["grp_a"], r["grp_b"]) == ("a", "b")
    assert r["union_k"] == 90
    assert r["overlap"] == 30
    assert abs(r["jaccard_est"] - 1 / 3) < 1e-5
    assert abs(r["est_intersection"] - 30.0) < 1e-6


# ---------------------------------------------------------------------------
# Incremental view maintenance


def test_ivm_merge_equals_full_recompute(spark):
    from unifydb_spark.operators.olap import (
        aggregate_state,
        finalize_aggregate_state,
        merge_aggregate_state,
    )

    df = spark.range(5000).select(
        (F.col("id") % 7).cast("string").alias("k"),
        (F.col("id") % 13).cast("double").alias("x"),
        F.col("id").alias("id"),
    )
    base, delta = df.filter(F.col("id") % 4 != 0), df.filter(F.col("id") % 4 == 0)
    inc = finalize_aggregate_state(
        merge_aggregate_state(aggregate_state(base, ["k"], "x"), delta, ["k"], "x"),
        "x",
    )
    full = finalize_aggregate_state(aggregate_state(df, ["k"], "x"), "x")
    a = {r["k"]: (r["cnt"], r["sum_x"], r["avg_x"]) for r in inc.collect()}
    b = {r["k"]: (r["cnt"], r["sum_x"], r["avg_x"]) for r in full.collect()}
    assert a == b


def test_ivm_merge_handles_new_and_retracted_keys(spark):
    from unifydb_spark.operators.olap import (
        aggregate_state,
        merge_aggregate_state,
    )

    base = spark.createDataFrame([("a", 1.0), ("a", 2.0)], ["k", "x"])
    # delta introduces a brand-new key; base-only keys must survive
    delta = spark.createDataFrame([("b", 10.0)], ["k", "x"])
    out = {
        r["k"]: (r["cnt"], float(r["sum_state"]))
        for r in merge_aggregate_state(
            aggregate_state(base, ["k"], "x"), delta, ["k"], "x"
        ).collect()
    }
    assert out == {"a": (2, 3.0), "b": (1, 10.0)}


def test_kmv_candidate_pruning_precedes_exchange(spark):
    """Scale proof: the per-partition bottom-k pruning (MapInPandas)
    runs BEFORE any exchange, so only the candidate sliver — not the
    raw key stream — is ever shuffled for the exact window."""
    from pyspark.sql import functions as F
    from unifydb_spark.operators.sketch import kmv_sketch

    df = spark.range(50_000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").cast("string").alias("k"),
    )
    sk = kmv_sketch(df, "k", "g", k=32)
    sk.collect()
    plan = sk._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "MapInPandas" in plan
    # the pruning stage reads the raw range scan directly — no exchange
    # between the scan and MapInPandas (candidates are produced locally)
    scan_to_map = plan.split("MapInPandas")[-1]
    assert "Exchange" not in scan_to_map, scan_to_map


def test_pivot_matches_spark_native_pivot(spark):
    from unifydb_spark.operators.olap import pivot_metrics

    df = spark.range(2000).select(
        (F.col("id") % 4).cast("string").alias("row"),
        F.element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("p"),
        (F.col("id") % 11).cast("double").alias("x"),
    )
    ours = {
        r["row"]: (r["cnt"], r["a_x"], r["b_x"], r["c_x"])
        for r in pivot_metrics(df, "row", "p", ["a", "b", "c"], "x").collect()
    }
    native = {
        r["row"]: (r["a"], r["b"], r["c"])
        for r in df.groupBy("row")
        .pivot("p", ["a", "b", "c"])
        .agg(F.round(F.sum(F.col("x").cast("decimal(30,10)")).cast("double"), 4))
        .collect()
    }
    assert set(ours) == set(native)
    for k, (cnt, a, b, c) in ours.items():
        na, nb, nc = native[k]
        assert (a, b, c) == (na or 0.0, nb or 0.0, nc or 0.0)
        assert cnt == 500


def test_pivot_empty_cell_is_zero(spark):
    from unifydb_spark.operators.olap import pivot_metrics

    df = spark.createDataFrame(
        [("r1", "a", 5.0), ("r1", "a", 2.5), ("r2", "b", 1.0)],
        ["row", "p", "x"],
    )
    out = {
        r["row"]: (r["a_x"], r["b_x"])
        for r in pivot_metrics(df, "row", "p", ["a", "b"], "x").collect()
    }
    assert out == {"r1": (7.5, 0.0), "r2": (0.0, 1.0)}


def test_hll_windowed_distinct_tracks_truth(spark):
    """Trailing-window register-max merge must track the exact trailing
    distinct within HLL error (~4.6% at p=9), and must equal the exact
    count when the window population is far below 2.5m (linear-counting
    regime is exact-ish for tiny sets... not exact — so assert relative
    error instead). Window semantics: day d covers (d-6..d]."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F
    from unifydb_spark.operators.sketch import hll_windowed_distinct

    base = datetime(2026, 5, 1)
    rows = []
    # 20 days; day i has users [i*10 .. i*10+49] -> 50/day, overlapping
    # windows share nothing across days (disjoint ids) so the true
    # trailing-7-day distinct is 50 * min(i+1, 7)... only for i >= 6: 350
    for i in range(20):
        for u in range(i * 10, i * 10 + 50):
            rows.append((str(u), base + timedelta(days=i, hours=3)))
    ev = spark.createDataFrame(rows, "uid string, ts timestamp")
    out = {r["day"]: r["hll_est"] for r in hll_windowed_distinct(
        ev, "uid", window_days=7).collect()}
    assert len(out) == 20
    # true trailing distinct: union of days max(0,i-6)..i of [i*10, i*10+50)
    for i in range(20):
        lo = max(0, i - 6) * 10
        hi = i * 10 + 50
        true = hi - lo
        day = (base + timedelta(days=i)).strftime("%Y-%m-%d")
        est = out[day]
        assert abs(est - true) / true < 0.15, (day, est, true)
    # monotone ramp-up: the first 7 days see strictly growing windows
    days = sorted(out)
    assert out[days[6]] > out[days[0]]


def test_cms_join_size_upper_bound_and_accuracy(spark):
    """The inner-product estimate is a one-sided upper bound on the
    true equi-join size, tight when the sketch is collision-light."""
    from pyspark.sql import functions as F
    from unifydb_spark.operators.sketch import cms_join_size

    left = spark.range(1000).select((F.col("id") % 100).alias("k"))   # 10 each
    right = spark.range(300).select((F.col("id") % 150).alias("k"))   # 2 each
    # true join size: keys 0..99 shared, 10 * 2 each = 2000
    true = left.join(right, "k").count()
    assert true == 2000
    [r] = cms_join_size(left, right, "k", "k").collect()
    assert r["est_join_rows"] >= true              # never underestimates
    # expected collision excess per row is ||L||1 * ||R||1 / w; min over
    # d rows stays within a few multiples of it (CMS inner-product bound)
    excess = 1000 * 300 / 256
    assert r["est_join_rows"] <= true + 3 * excess
    # disjoint keys -> only collision mass remains, far below true
    disj = spark.range(300).select((F.col("id") % 150 + 1000).alias("k"))
    [r2] = cms_join_size(left, disj, "k", "k").collect()
    assert r2["est_join_rows"] <= 3 * excess
    assert r2["est_join_rows"] < true


def test_topk_with_others_completeness(spark):
    from pyspark.sql import functions as F
    from unifydb_spark.operators.olap import topk_with_others

    rows = []
    for cat in "abcdefg":
        w = ord(cat) - ord("a") + 1  # g heaviest
        rows += [("g1", cat, float(w))] * w
    rows += [("g2", "x", 1.0), ("g2", "y", 2.0)]  # fewer than k cats
    df = spark.createDataFrame(rows, "g string, cat string, v double")
    out = topk_with_others(df, "g", "cat", "v", k=3).collect()
    g1 = {r["category"]: r for r in out if r["g"] == "g1"}
    # top-3 by sum(v) = w^2: g(49), f(36), e(25); others a-d
    assert [g1[c]["rank"] for c in ("g", "f", "e")] == [1, 2, 3]
    assert g1["(other)"]["rank"] == 4
    assert g1["(other)"]["n"] == 1 + 2 + 3 + 4
    assert g1["(other)"]["sum_value"] == 1.0 + 4 + 9 + 16
    # completeness: rows sum to group totals
    tot = sum(r["sum_value"] for r in out if r["g"] == "g1")
    assert tot == sum(w * w for w in range(1, 8))
    # small group: no (other) row
    g2 = [r["category"] for r in out if r["g"] == "g2"]
    assert sorted(g2) == ["x", "y"]


def test_json_props_metrics_malformed_counted(spark):
    from unifydb_spark.operators.olap import json_props_metrics

    rows = [
        ("a", '{"k": 10}'),
        ("a", '{"k": 20}'),
        ("a", '{oops'),          # malformed json
        ("a", '{"other": 1}'),   # field missing
        ("a", None),             # null props
        ("b", '{"k": 7}'),
    ]
    ev = spark.createDataFrame(rows, "event_type string, props string")
    out = {r["event_type"]: r for r in json_props_metrics(ev).collect()}
    assert out["a"]["n"] == 5
    assert out["a"]["n_bad"] == 3       # malformed + missing + null
    assert out["a"]["sum_field"] == 30
    assert out["a"]["avg_field"] == 15.0  # avg over PRESENT values only
    assert out["b"]["n_bad"] == 0 and out["b"]["sum_field"] == 7


def test_rank_features_semantics(spark):
    from unifydb_spark.operators.olap import rank_features

    rows = [(i, "g", float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "id bigint, g string, v double")
    out = {r["id"]: r for r in rank_features(df, "g", "v", "id", 10).collect()}
    # distinct values 0..99: ntile = exact deciles, pct_rank = i/99,
    # cume = (i+1)/100
    for i in (0, 9, 10, 55, 99):
        assert out[i]["tile"] == i // 10 + 1
        assert abs(out[i]["pct_rank"] - i / 99) < 1e-6
        assert abs(out[i]["cume"] - (i + 1) / 100) < 1e-6
    # ties: equal values share pct_rank/cume but split tiles by id
    tied = spark.createDataFrame(
        [(i, "g", 1.0) for i in range(10)], "id bigint, g string, v double"
    )
    rows2 = rank_features(tied, "g", "v", "id", 2).collect()
    assert all(r["pct_rank"] == 0.0 and r["cume"] == 1.0 for r in rows2)
    assert sorted(r["tile"] for r in rows2) == [1] * 5 + [2] * 5


def test_join_fanout_exact_product(spark):
    """r123: rows_out = sum over shared keys of cl*cr; max_key_out is
    the worst key; the candidate join is never executed but the
    numbers match an actual join."""
    from unifydb_spark.operators.olap import join_fanout_report

    l = spark.createDataFrame(
        [(1,), (1,), (2,), (3,)], "k bigint"
    )
    r = spark.createDataFrame(
        [(1,), (1,), (1,), (3,), (9,)], "k bigint"
    )
    rep = join_fanout_report(l, r, "k", "k").collect()[0].asDict()
    assert rep["n_left"] == 4 and rep["n_right"] == 5
    assert rep["n_keys_both"] == 2
    assert rep["rows_out"] == 2 * 3 + 1 * 1
    assert rep["max_key_out"] == 6
    actual = l.join(r, "k").count()
    assert actual == rep["rows_out"]


def test_group_skyline_scoped_dominance(spark):
    """r128: dominance is scoped within each group - a point dominated
    globally can still be on its own group's skyline."""
    from pyspark.sql import functions as F

    from unifydb_spark.operators.olap import group_skyline_2d

    rows = [
        ("a", 1, 10, 10.0),   # a's best - kept
        ("a", 2, 5, 5.0),     # dominated within a
        ("b", 3, 6, 6.0),     # b's best - kept though a#1 dominates it
        ("b", 4, 6, 6.0),     # duplicate point, higher id - dropped
        ("b", 5, 7, 1.0),     # higher x, lower y - kept
    ]
    df = spark.createDataFrame(rows, "g string, pid bigint, x bigint, y double")
    got = sorted(
        r["pid"]
        for r in group_skyline_2d(df, "g", "x", "y", "pid").collect()
    )
    assert got == [1, 3, 5]
