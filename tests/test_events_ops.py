"""Sessionization + as-of join unit tests on a hand-built event log."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from unifydb_spark.operators.events import asof_latest, sessionize


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions (gap at 00:05 -> 01:00)
        (1, _ts(0), 1, "click", 1.0, None),
        (2, _ts(5), 1, "purchase", 2.0, None),
        (3, _ts(59), 1, "click", 3.0, None),  # 54 min gap -> new session
        (4, _ts(59), 1, "purchase", 4.0, None),  # same minute, same session
        # user 2: one session, purchase with no prior click
        (5, _ts(10), 2, "purchase", 5.0, None),
        (6, _ts(11), 2, "click", 6.0, None),
    ]
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )


def test_sessionize(events):
    out = {
        (r["user_id"], r["session_seq"]): r
        for r in sessionize(events, gap_minutes=30).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    assert out[(1, 1)]["n_events"] == 2
    assert out[(1, 2)]["n_events"] == 2
    assert out[(1, 2)]["session_start"] == _ts(59)
    assert float(out[(2, 1)]["sum_value"]) == 11.0


def test_sessionize_bucketed_matches_plain(events):
    """Bucketed pre-sessionization == plain sessionize on the hand-built
    log, including the crafted cross-boundary case: with 1-hour buckets,
    user 1's session at 00:59 has its same-minute pair inside one bucket
    and the 30-min gap rule must NOT resurrect the 00:05->00:59 split as
    a merge."""
    from unifydb_spark.operators.events import sessionize_bucketed

    plain = {
        (r["user_id"], r["session_seq"]): (
            r["session_start"], r["session_end"], r["n_events"],
            float(r["sum_value"]),
        )
        for r in sessionize(events, gap_minutes=30).collect()
    }
    bucketed = {
        (r["user_id"], r["session_seq"]): (
            r["session_start"], r["session_end"], r["n_events"],
            float(r["sum_value"]),
        )
        for r in sessionize_bucketed(
            events, gap_minutes=30, bucket_hours=1
        ).collect()
    }
    assert plain == bucketed


def test_sessionize_bucketed_boundary_merge(spark):
    """A session SPANNING a bucket boundary (consecutive events <= gap
    but in different buckets, including a skip over an empty bucket when
    bucket < gap) merges back to exactly the plain result."""
    from unifydb_spark.operators.events import sessionize, sessionize_bucketed

    rows = [
        # user 7: events straddling the 01:00 bucket edge, 10 min apart
        (1, dt.datetime(2024, 1, 1, 0, 55), 7, "click", 1.0, None),
        (2, dt.datetime(2024, 1, 1, 1, 5), 7, "click", 2.0, None),
        # ...then a real 40-min gap -> second session
        (3, dt.datetime(2024, 1, 1, 1, 45), 7, "click", 4.0, None),
        # user 8: 25-min gap that SKIPS an entire 15-min bucket
        (4, dt.datetime(2024, 1, 1, 2, 1), 8, "click", 8.0, None),
        (5, dt.datetime(2024, 1, 1, 2, 26), 8, "click", 16.0, None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    key = lambda r: (
        r["user_id"], r["session_seq"], r["session_start"],
        r["session_end"], r["n_events"], float(r["sum_value"]),
    )
    plain = sorted(key(r) for r in sessionize(ev, gap_minutes=30).collect())
    # 0.25h buckets are SMALLER than the 30-min gap: user 8's 25-min
    # hop skips an entire empty bucket and must still merge
    for bucket_hours in (0.25, 1, 24):
        got = sorted(
            key(r)
            for r in sessionize_bucketed(
                ev, gap_minutes=30, bucket_hours=bucket_hours
            ).collect()
        )
        assert got == plain, f"bucket_hours={bucket_hours}"


def test_asof_latest(events):
    out = {r["event_id"]: r for r in asof_latest(events).collect()}
    assert set(out) == {2, 4, 5}
    assert out[2]["ref_event_id"] == 1  # purchase@5 -> click@0
    assert out[2]["lag_us"] == 5 * 60 * 1_000_000
    assert out[4]["ref_event_id"] == 3  # same-ts click IS prior (row order)
    assert out[5]["ref_event_id"] is None  # no prior click for user 2
    assert out[5]["lag_us"] is None


def test_rolling_user_stats(events):
    from unifydb_spark.operators.events import rolling_user_stats

    rows = {
        r["event_id"]: r
        for r in rolling_user_stats(events, window_rows=2).collect()
    }
    # user 1, events 1..4 (values 1,2,3,4), trailing-2 window
    assert rows[1]["seq"] == 1 and rows[1]["roll_n"] == 1
    assert rows[1]["roll_avg"] == 1.0 and rows[1]["delta"] is None
    assert rows[2]["roll_n"] == 2 and rows[2]["roll_avg"] == 1.5
    assert rows[2]["delta"] == 1.0
    assert rows[3]["roll_avg"] == 2.5  # (2+3)/2
    assert rows[4]["seq"] == 4 and rows[4]["roll_avg"] == 3.5
    # user 2 restarts the sequence
    assert rows[5]["seq"] == 1 and rows[5]["delta"] is None
    assert rows[6]["roll_avg"] == 5.5 and rows[6]["delta"] == 1.0


def test_funnel_ordering_matters(spark):
    from unifydb_spark.operators.events import funnel

    rows = [
        # user 1: full ordered funnel
        (1, _ts(0), 1, "view", 0.0, None),
        (2, _ts(1), 1, "click", 0.0, None),
        (3, _ts(2), 1, "purchase", 0.0, None),
        # user 2: click BEFORE the first view -> stage stops at 1
        (4, _ts(0), 2, "click", 0.0, None),
        (5, _ts(1), 2, "view", 0.0, None),
        # user 3: no funnel events at all
        (6, _ts(0), 3, "error", 0.0, None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    out = {r["user_id"]: r for r in funnel(ev).collect()}
    assert out[1]["stage"] == 3 and out[1]["t3_us"] is not None
    assert out[2]["stage"] == 1 and out[2]["t2_us"] is None
    assert out[3]["stage"] == 0 and out[3]["t1_us"] is None


def test_retention_cohorts(spark):
    import datetime as dtm

    from unifydb_spark.operators.events import retention_cohorts

    def day(d, h=12):
        return dtm.datetime(2024, 1, d, h)

    rows = [
        (1, day(1), 1, "click", 0.0, None),   # u1 cohort day 1
        (2, day(1, 13), 1, "view", 0.0, None),  # same day, still 1 user
        (3, day(3), 1, "click", 0.0, None),   # u1 active at offset 2
        (4, day(3), 2, "click", 0.0, None),   # u2 cohort day 3
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    out = {
        (str(r["cohort_day"]), r["day_offset"]): r["n_users"]
        for r in retention_cohorts(ev).collect()
    }
    assert out[("2024-01-01", 0)] == 1
    assert out[("2024-01-01", 2)] == 1
    assert out[("2024-01-03", 0)] == 1
    assert len(out) == 3


def test_range_join_binned_equals_theta_join(spark):
    """Binned equi-join must equal the naive theta-join on adversarial
    intervals: zero-length, bin-boundary-aligned ends, multi-bin spans,
    and points exactly on start/end (containment is start <= ts < end)."""
    import datetime as dtm

    from pyspark.sql import functions as F

    from unifydb_spark.operators.events import range_join_binned

    def ts(h, m=0, s=0):
        return dtm.datetime(2024, 1, 1 + h // 24, h % 24, m, s)

    points = spark.createDataFrame(
        [(i, ts(h, m)) for i, (h, m) in enumerate(
            [(0, 0), (0, 30), (1, 0), (23, 59), (24, 0), (25, 0), (47, 59), (48, 0)]
        )],
        "pid bigint, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (100, ts(0), ts(0)),        # zero-length -> matches nothing
            (101, ts(0), ts(1)),        # [00:00, 01:00): boundary end excluded
            (102, ts(0, 30), ts(24)),   # spans the bin boundary
            (103, ts(23), ts(25)),      # crosses midnight
            (104, ts(0), ts(48)),       # multi-bin (3 bins at 24h width)
        ],
        "iid bigint, start_ts timestamp, end_ts timestamp",
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join_binned(points, intervals, bin_hours=24).collect()
    }
    want = {
        (r["pid"], r["iid"])
        for r in points.crossJoin(intervals)
        .filter((F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts")))
        .collect()
    }
    assert got == want
    assert (100 not in {i for _, i in got}) and (7, 104) not in got


def test_range_join_binned_fuzz_equals_theta(spark):
    """Randomized (seeded) intervals and points across bin widths: the
    binned equi-join must always equal the theta-join."""
    import datetime as dtm
    import random

    from pyspark.sql import functions as F

    from unifydb_spark.operators.events import range_join_binned

    rng = random.Random(1234)
    base = dtm.datetime(2024, 3, 1)

    def t(minutes):
        return base + dtm.timedelta(minutes=minutes)

    points = spark.createDataFrame(
        [(i, t(rng.randrange(0, 5000))) for i in range(120)],
        "pid bigint, ts timestamp",
    )
    ivs = []
    for j in range(40):
        start = rng.randrange(0, 5000)
        ivs.append((j, t(start), t(start + rng.randrange(0, 900))))
    intervals = spark.createDataFrame(
        ivs, "iid bigint, start_ts timestamp, end_ts timestamp"
    )
    want = {
        (r["pid"], r["iid"])
        for r in points.crossJoin(intervals)
        .filter(
            (F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts"))
        )
        .collect()
    }
    for bin_hours in (1, 6, 24):
        got = {
            (r["pid"], r["iid"])
            for r in range_join_binned(
                points, intervals, bin_hours=bin_hours
            ).collect()
        }
        assert got == want, f"bin_hours={bin_hours}"


def test_rolling_metrics_range_frame(spark):
    """Time-RANGE trailing window: exact 24h lookback (inclusive now,
    exclusive -24h instant), timestamp peers share one frame, DECIMAL
    sums exact."""
    from datetime import datetime

    from pyspark.sql import functions as F
    from unifydb_spark.operators.events import rolling_metrics

    t0 = datetime(2026, 3, 1, 12, 0, 0)
    rows = [
        # user 1: events at 0h, +23h59m59s (inside), +24h (first drops out)
        (1, 1, datetime(2026, 3, 1, 12, 0, 0), 10.0),
        (2, 1, datetime(2026, 3, 2, 11, 59, 59), 5.0),
        (3, 1, datetime(2026, 3, 2, 12, 0, 0), 2.0),
        # user 2: two events at the SAME instant -> peers, same frame
        (4, 2, t0, 1.5),
        (5, 2, t0, 2.5),
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, value double"
    )
    out = {
        r["event_id"]: (r["n_win"], r["sum_win"])
        for r in rolling_metrics(ev, window_hours=24).collect()
    }
    assert out[1] == (1, 10.0)
    assert out[2] == (2, 15.0)      # 12:00:00 event still inside at 11:59:59+24h? no: e1 at -23:59:59 -> inside
    assert out[3] == (2, 7.0)       # e1 exactly 24h old -> excluded; e2 inside
    assert out[4] == (2, 4.0)       # peers see each other
    assert out[5] == (2, 4.0)


def test_rate_anomaly_dense_spine_and_flags(spark):
    """A day with ZERO events must appear (dense spine) and flag against
    a steady baseline; warm-up days (< 2 history) yield NULL z."""
    from datetime import datetime, timedelta

    from unifydb_spark.operators.events import rate_anomaly

    base = datetime(2026, 6, 1)
    rows = []
    # type 'a': 10 events/day for days 0-9, except day 7 has NONE and
    # day 9 has 100 (spike)
    for dday in range(10):
        n = 0 if dday == 7 else (100 if dday == 9 else 10)
        for i in range(n):
            rows.append(("a", base + timedelta(days=dday, minutes=i)))
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r["day"]: r for r in rate_anomaly(ev, lookback_days=7).collect()}
    assert len(out) == 10
    d7 = (base + timedelta(days=7)).strftime("%Y-%m-%d")
    d9 = (base + timedelta(days=9)).strftime("%Y-%m-%d")
    d0 = base.strftime("%Y-%m-%d")
    assert out[d7]["n_events"] == 0  # the dropped day exists in the output
    # steady 10s before day 7 -> zero variance -> no z, no flag (an
    # exactly-constant baseline cannot standardize); the SPIKE day has
    # variance in its window (it saw the 0) and must flag
    assert out[d9]["is_anomaly"] and out[d9]["zscore"] > 3
    assert out[d0]["zscore"] is None  # no history at all
    assert not out[d0]["is_anomaly"]


def test_interval_union_overlap_semantics(spark):
    from datetime import datetime

    from unifydb_spark.operators.events import interval_union_time

    M = 60_000_000  # one minute in us
    t = datetime(2026, 7, 1, 12, 0, 0)

    def ts(mins):
        return datetime(2026, 7, 1, 12, 0, 0).replace(minute=0) \
            .replace(minute=0)  # placeholder, replaced below

    from datetime import timedelta

    def at(mins):
        return t + timedelta(minutes=mins)

    rows = [
        # user 1: [0,10) + [5,15) overlap -> covered 15; [20,25) disjoint
        (1, at(0), at(10)),
        (1, at(5), at(15)),
        (1, at(20), at(25)),
        # user 2: touching [0,5) + [5,10) merge seamlessly -> 10
        (2, at(0), at(5)),
        (2, at(5), at(10)),
        # user 3: identical duplicated interval -> counted once
        (3, at(0), at(7)),
        (3, at(0), at(7)),
    ]
    iv = spark.createDataFrame(
        rows, "user_id bigint, start_ts timestamp, end_ts timestamp"
    )
    out = {r["user_id"]: r for r in interval_union_time(iv).collect()}
    assert out[1]["covered_us"] == 20 * M
    assert out[1]["span_us"] == 25 * M
    assert out[1]["n_intervals"] == 3
    assert out[2]["covered_us"] == 10 * M == out[2]["span_us"]
    assert out[3]["covered_us"] == 7 * M
    # covered <= span universally
    assert all(r["covered_us"] <= r["span_us"] for r in out.values())


def test_event_transitions_matrix(spark):
    from datetime import datetime, timedelta

    from unifydb_spark.operators.events import event_transitions

    t0 = datetime(2026, 8, 1)
    seqs = {1: ["a", "b", "a", "b", "c"], 2: ["a", "a", "b"]}
    rows, eid = [], 0
    for u, types in seqs.items():
        for i, et in enumerate(types):
            rows.append((eid, u, et, t0 + timedelta(minutes=i)))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    )
    out = {(r["from_type"], r["to_type"]): (r["n"], r["p"])
           for r in event_transitions(ev).collect()}
    # transitions: u1 a->b, b->a, a->b, b->c; u2 a->a, a->b
    # from 'a': a->b x3, a->a x1; from 'b': b->a x1, b->c x1
    assert out[("a", "b")] == (3, 0.75)
    assert out[("a", "a")] == (1, 0.25)
    assert out[("b", "a")] == (1, 0.5)
    assert out[("b", "c")] == (1, 0.5)
    assert len(out) == 4  # no cross-user transition (u1 'c' -> u2 'a')
    # row-stochastic: per from_type, probabilities sum to 1
    import collections

    sums = collections.defaultdict(float)
    for (f, _t), (_n, p) in out.items():
        sums[f] += p
    assert all(abs(s - 1.0) < 1e-9 for s in sums.values())


def test_gini_and_association_rules(spark):
    from pyspark.sql import functions as F
    from unifydb_spark.operators.events import association_rules
    from unifydb_spark.operators.stats import gini_coefficient

    # perfectly equal values -> gini 0; one owner of all mass -> ~1-1/n
    eq = spark.createDataFrame(
        [(i, "eq", 5.0) for i in range(100)], "id bigint, g string, v double"
    )
    uneq = spark.createDataFrame(
        [(i, "un", 0.0) for i in range(99)] + [(99, "un", 1000.0)],
        "id bigint, g string, v double",
    )
    out = {r["g"]: r["gini"] for r in gini_coefficient(
        eq.union(uneq), "g", "v", "id").collect()}
    assert out["eq"] == 0.0
    assert abs(out["un"] - (1 - 1 / 100)) < 1e-6

    # baskets: {a,b} x3, {a} x1, {b,c} x1 -> n_baskets 5
    rows = []
    for b in range(3):
        rows += [(b, "a"), (b, "b")]
    rows += [(3, "a"), (4, "b"), (4, "c")]
    ev = spark.createDataFrame(rows, "user_id bigint, event_type string")
    rules = {(r["antecedent"], r["consequent"]): r
             for r in association_rules(ev, min_support=0.0).collect()}
    ab = rules[("a", "b")]
    assert ab["n_both"] == 3
    assert ab["support"] == 0.6          # 3/5 baskets
    assert ab["confidence"] == 0.75      # 3/4 a-baskets
    assert abs(ab["lift"] - 0.75 / (4 / 5)) < 1e-6
    ba = rules[("b", "a")]
    assert ba["confidence"] == 0.75      # 3/4 b-baskets
    assert ("c", "a") not in rules       # never co-occur


def test_session_paths_and_token_pmi(spark):
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F
    from unifydb_spark.operators.events import session_paths
    from unifydb_spark.operators.text import token_pmi

    t0 = datetime(2026, 8, 2)
    rows, eid = [], 0
    # 3 users do a>b>c in one session; 1 user does a>b then (gap) c
    for u in range(3):
        for i, et in enumerate(["a", "b", "c"]):
            rows.append((eid, u, et, t0 + timedelta(minutes=i))); eid += 1
    rows.append((eid, 9, "a", t0)); eid += 1
    rows.append((eid, 9, "b", t0 + timedelta(minutes=1))); eid += 1
    rows.append((eid, 9, "c", t0 + timedelta(hours=5))); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    )
    out = {r["path"]: r for r in session_paths(ev, top_k=10).collect()}
    assert out["a>b>c"]["n_sessions"] == 3
    assert out["a>b"]["n_sessions"] == 1      # gap split the session
    assert out["c"]["n_sessions"] == 1
    assert out["a>b>c"]["avg_len"] == 3.0

    # PMI: x,y always together; x,z never -> (x,y) high PMI, (x,z) absent
    docs = spark.createDataFrame(
        [(i, "x y filler%d" % (i % 7)) for i in range(20)]
        + [(100 + i, "z other%d" % (i % 5)) for i in range(20)],
        "doc_id bigint, text string",
    )
    got = {(r["tok_a"], r["tok_b"]): r["pmi"]
           for r in token_pmi(docs, min_df=2, max_df_frac=1.0,
                              min_pair=2, top_k=50).collect()}
    import math

    assert abs(got[("x", "y")] - math.log(20 * 40 / (20 * 20))) < 1e-6
    assert ("x", "z") not in got


def test_survival_curve_km_semantics(spark):
    """Kaplan-Meier hand-check: 10 subjects, events at t=1 (2), t=3 (3),
    censored at t=2 (1), remaining 4 censored at t=5.
    S(1) = 8/10; at t=3 n_risk = 7 -> S(3) = 0.8 * 4/7."""
    from unifydb_spark.operators.events import survival_curve

    rows = (
        [(1.0, True)] * 2 + [(2.0, False)] + [(3.0, True)] * 3
        + [(5.0, False)] * 4
    )
    df = spark.createDataFrame(rows, "duration double, observed boolean")
    out = {r["duration"]: r for r in survival_curve(df).collect()}
    assert out[1.0]["n_risk"] == 10 and out[1.0]["n_events"] == 2
    assert abs(out[1.0]["survival"] - 0.8) < 1e-6
    assert out[2.0]["n_risk"] == 8 and out[2.0]["n_censored"] == 1
    assert abs(out[2.0]["survival"] - 0.8) < 1e-6  # censoring: no drop
    assert out[3.0]["n_risk"] == 7
    assert abs(out[3.0]["survival"] - 0.8 * 4 / 7) < 1e-6
    assert out[5.0]["survival"] == out[3.0]["survival"]
    # everyone-converts tail: survival hits exactly 0
    allc = spark.createDataFrame(
        [(1.0, True)] * 3 + [(2.0, True)] * 2, "duration double, observed boolean"
    )
    rows2 = {r["duration"]: r["survival"] for r in survival_curve(allc).collect()}
    assert rows2[2.0] == 0.0 and rows2[1.0] == 0.4


def test_exp_smoothing_matches_recursion(spark):
    """r119: the closed form equals the textbook recursion s_t =
    a*x_t + (1-a)*s_{t-1} with s_0 = x_0."""
    import datetime

    from unifydb_spark.operators.events import exp_smoothing

    xs = [10.0, 20.0, 5.0, 40.0, 15.0]
    rows = [
        (i, 1, datetime.datetime(2024, 6, 1 + i), "m", x)
        for i, x in enumerate(xs)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, ts timestamp, "
        "event_type string, value double",
    )
    out = {r["day"]: r["level"]
           for r in exp_smoothing(ev, alpha=0.3).collect()}
    a, s = 0.3, xs[0]
    exp = {f"2024-06-0{1}": round(s, 6)}
    for i, x in enumerate(xs[1:], start=1):
        s = a * x + (1 - a) * s
        exp[f"2024-06-0{1 + i}"] = round(s, 6)
    for day, lv in exp.items():
        assert abs(out[day] - lv) < 1e-5, (day, out[day], lv)


def test_bounce_report_counts(spark):
    """r130: a lone event is a bounce; a 3-event burst is one session
    with 3 events; rates follow."""
    import datetime

    from unifydb_spark.operators.events import bounce_report

    base = datetime.datetime(2024, 7, 1, 12, 0)
    rows = [
        (0, 1, base, "view", 1.0),                       # bounce
        (1, 2, base, "view", 1.0),                       # session of 3
        (2, 2, base + datetime.timedelta(minutes=5), "click", 1.0),
        (3, 2, base + datetime.timedelta(minutes=10), "buy", 1.0),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, ts timestamp, "
        "event_type string, value double",
    )
    r = bounce_report(ev).collect()[0].asDict()
    assert r["day"] == "2024-07-01"
    assert r["n_sessions"] == 2 and r["n_bounces"] == 1
    assert r["bounce_rate"] == 0.5 and r["mean_events"] == 2.0
    assert r["median_duration_s"] == 300.0  # (0 + 600) / 2


def test_sessionize_bucketed_property_fuzz(spark):
    """Property pin of the r139 exactness argument: bucketed
    pre-sessionization is row-identical to plain sessionize for ANY
    events, gap, and bucket size — including the boundary cases the
    argument leans on (consecutive gap EXACTLY == g at a bucket edge
    merges on both paths; gap == g+1us splits on both)."""
    import datetime as dt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from unifydb_spark.operators.events import sessionize, sessionize_bucketed

    gap_min = 2
    gap_s = gap_min * 60
    base = dt.datetime(2024, 3, 1, 0, 0, 0)

    # offsets in SECONDS, drawn to hit exact-gap and bucket-edge
    # boundaries often: multiples of the gap and of the bucket length
    offset = st.one_of(
        st.integers(min_value=0, max_value=4 * 3600),
        st.sampled_from(
            [0, gap_s, gap_s + 1, gap_s - 1, 1800, 3600, 3600 + gap_s,
             7200, 7200 + 1, 2 * gap_s, 3 * 3600]
        ),
    )

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(min_value=1, max_value=3), offset),
            min_size=1,
            max_size=25,
        ),
        st.sampled_from([0.5, 1.0, 3.0]),
    )
    def check(pairs, bucket_hours):
        rows = [
            (
                u,
                base + dt.timedelta(seconds=off),
                i,  # unique event_id tiebreaker
                float((i * 7) % 13) / 4.0,
            )
            for i, (u, off) in enumerate(pairs)
        ]
        ev = spark.createDataFrame(
            rows, ["user_id", "ts", "event_id", "value"]
        )
        plain = sorted(
            map(tuple, sessionize(ev, gap_minutes=gap_min).collect())
        )
        bucketed = sorted(
            map(
                tuple,
                sessionize_bucketed(
                    ev, gap_minutes=gap_min, bucket_hours=bucket_hours
                ).collect(),
            )
        )
        assert plain == bucketed

    check()


def test_sessionize_auto_routes_by_measured_skew(spark):
    """VERDICT r10 ask #6: the auto default routes PLAIN under uniform
    keys and BUCKETED when one user exceeds the hot-share threshold —
    and both routes return the identical result (r139's invariance)."""
    import datetime as dt

    from unifydb_spark.operators.events import (
        hot_key_share,
        sessionize,
        sessionize_auto,
        sessionize_bucketed,
    )

    base = dt.datetime(2024, 1, 1)
    uniform = [
        (i % 40, base + dt.timedelta(minutes=7 * i), i, 1.0)
        for i in range(400)
    ]
    # one user owns ~60% of events, spread over days (bucketable)
    skewed = [
        (0 if i % 5 < 3 else i % 5, base + dt.timedelta(minutes=41 * i), i, 1.0)
        for i in range(400)
    ]
    cols = ["user_id", "ts", "event_id", "value"]
    udf_ = spark.createDataFrame(uniform, cols)
    sdf = spark.createDataFrame(skewed, cols)

    assert hot_key_share(udf_, ["user_id"]) <= 0.05
    assert hot_key_share(sdf, ["user_id"]) > 0.05

    def rows(df):
        return sorted(map(tuple, df.collect()))

    # uniform -> plain route, identical to sessionize
    assert rows(sessionize_auto(udf_)) == rows(sessionize(udf_))
    # skewed -> bucketed route, identical to BOTH variants
    got = rows(sessionize_auto(sdf, bucket_hours=6))
    assert got == rows(sessionize_bucketed(sdf, 30, 6))
    assert got == rows(sessionize(sdf))


def test_hot_key_share_fallback_scales_on_estimated_corpus(spark):
    """ADVICE r11: the exact fallback triggers on the ESTIMATED CORPUS
    size (sample rows / fraction), not the raw sample size — a corpus
    just under the old 20k-sample bar no longer pays both a sampled AND
    a full exact scan. Tiny corpora still get the exact pass."""
    from unifydb_spark.operators.events import hot_key_share

    # tiny corpus (est corpus 100/0.5 = 200 < 20k): exact fallback, so
    # the share is the true 40/100 regardless of sampling noise
    rows = [(0 if i % 5 < 2 else i,) for i in range(100)]
    tiny = spark.createDataFrame(rows, ["user_id"])
    assert abs(hot_key_share(tiny, ["user_id"], 0.5) - 0.4) < 1e-9

    # 30k-row corpus sampled at 50%: est corpus 30k >= 20k, so the probe
    # TRUSTS the ~15k-row sample (old rule: 15k < 20k -> full rescan).
    # The sampled estimate must still rank the 33% hot key clearly.
    big_rows = [(0 if i % 3 == 0 else i,) for i in range(30_000)]
    big = spark.createDataFrame(big_rows, ["user_id"])
    share = hot_key_share(big, ["user_id"], 0.5)
    assert 0.25 < share < 0.42  # sampled, noisy — but decisively hot
