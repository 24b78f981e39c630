"""Drift / significance / time-series operators added in round 7:
exact two-sample KS, chi-square independence, Cohen's kappa, PSI,
daily-count autocorrelation, and integer-exact CUSUM changepoints."""

import datetime
import math

import pytest
from pyspark.sql import functions as F


def test_ks_test_hand_computed(spark):
    from unifydb_spark.operators.stats import ks_test

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 3.0), ("b", 4.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = ks_test(df, "v", "g", "a", "b").collect()[0]
    # ECDF diff peaks at 2/3, first reached at v=2
    assert out["n_a"] == 3 and out["n_b"] == 3
    assert out["ks_d"] == pytest.approx(0.666667)
    assert out["ks_at"] == 2.0


def test_ks_test_identical_distributions_zero(spark):
    from unifydb_spark.operators.stats import ks_test

    rows = [("a", float(i % 5)) for i in range(50)] + [
        ("b", float(i % 5)) for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = ks_test(df, "v", "g", "a", "b").collect()[0]
    assert out["ks_d"] == 0.0


def test_ks_test_ties_across_groups_exact(spark):
    from unifydb_spark.operators.stats import ks_test

    # all mass of each group at one value; b strictly above a
    rows = [("a", 1.0)] * 4 + [("b", 2.0)] * 4
    df = spark.createDataFrame(rows, ["g", "v"])
    out = ks_test(df, "v", "g", "a", "b").collect()[0]
    assert out["ks_d"] == 1.0 and out["ks_at"] == 1.0


def test_chi_square_independent_is_zero(spark):
    from unifydb_spark.operators.stats import chi_square_independence

    # product structure => exact independence => chi2 == 0
    rows = [
        (x, y)
        for x in ("p", "q")
        for y in ("u", "v", "w")
        for _ in range(4)
    ]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = chi_square_independence(df, "x", "y").collect()[0]
    assert out["chi2"] == 0.0
    assert out["dof"] == 2
    assert out["cramers_v"] == 0.0


def test_chi_square_perfect_association(spark):
    from unifydb_spark.operators.stats import chi_square_independence

    # x determines y => chi2 = n, V = 1 for a 2x2
    rows = [("p", "u")] * 5 + [("q", "v")] * 7
    df = spark.createDataFrame(rows, ["x", "y"])
    out = chi_square_independence(df, "x", "y").collect()[0]
    assert out["chi2"] == pytest.approx(12.0)
    assert out["cramers_v"] == pytest.approx(1.0)
    assert out["dof"] == 1


def test_cohens_kappa_perfect_and_chance(spark):
    from unifydb_spark.operators.stats import cohens_kappa

    df = spark.createDataFrame(
        [(True, True)] * 6 + [(False, False)] * 4, ["a", "b"]
    )
    out = cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
    assert out["kappa"] == pytest.approx(1.0)
    assert out["po"] == pytest.approx(1.0)

    # independent raters at 50/50: po == pe == 0.5 -> kappa 0
    rows = [(a, b) for a in (True, False) for b in (True, False)] * 3
    out2 = cohens_kappa(
        spark.createDataFrame(rows, ["a", "b"]), F.col("a"), F.col("b")
    ).collect()[0]
    assert out2["kappa"] == pytest.approx(0.0)


def _ts(day: int, hour: int = 0):
    return datetime.datetime(2024, 1, 1, hour, 0, 0) + datetime.timedelta(
        days=day
    )


def test_psi_zero_when_halves_identical(spark):
    from unifydb_spark.operators.stats import psi_report

    # same value multiset in each half => p == q in every bin => psi 0
    rows = []
    for half, day in ((0, 0), (1, 9)):
        for i in range(40):
            rows.append((_ts(day), float(i % 10)))
    df = spark.createDataFrame(rows, ["ts", "value"])
    out = psi_report(df, "value", "ts", n_bins=5).collect()
    assert len(out) == 5
    assert all(r["psi"] == 0.0 for r in out)
    assert all(r["term"] == 0.0 for r in out)
    assert all(r["n_ref"] == r["n_cur"] == 8 for r in out)


def test_psi_detects_shift(spark):
    from unifydb_spark.operators.stats import psi_report

    rows = [(_ts(0), float(i % 5)) for i in range(50)] + [
        (_ts(9), 5.0 + float(i % 5)) for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["ts", "value"])
    out = psi_report(df, "value", "ts", n_bins=10).collect()
    assert out[0]["psi"] > 1.0  # disjoint supports => large PSI
    n_ref_total = sum(r["n_ref"] for r in out)
    n_cur_total = sum(r["n_cur"] for r in out)
    assert n_ref_total == 50 and n_cur_total == 50


def test_daily_acf_alternating_series(spark):
    from unifydb_spark.operators.events import daily_acf

    # counts 1,2,1,2,1,2 over six consecutive days
    rows = []
    for d in range(6):
        for _ in range(1 if d % 2 == 0 else 2):
            rows.append((_ts(d, 12),))
    df = spark.createDataFrame(rows, ["ts"])
    out = {r["lag"]: r for r in daily_acf(df, max_lag=3).collect()}
    # mean 1.5, den 1.5; lag1: 5 pairs each -0.25 => -5/6
    assert out[1]["acf"] == pytest.approx(-0.833333)
    assert out[2]["acf"] == pytest.approx(0.666667)
    assert out[1]["n_pairs"] == 5 and out[2]["n_pairs"] == 4


def test_daily_acf_dense_spine_counts_missing_days_as_zero(spark):
    from unifydb_spark.operators.events import daily_acf

    # events only on days 0 and 2: spine makes day 1 an explicit zero
    rows = [(_ts(0),), (_ts(2),)]
    df = spark.createDataFrame(rows, ["ts"])
    out = {r["lag"]: r for r in daily_acf(df, max_lag=1).collect()}
    # series 1,0,1: mean 2/3, den 2/3; lag1 num = 2*(1/3)(-2/3)=-4/9
    assert out[1]["n_pairs"] == 2
    assert out[1]["acf"] == pytest.approx(-0.666667)


def test_daily_acf_constant_series_null(spark):
    from unifydb_spark.operators.events import daily_acf

    rows = [(_ts(d),) for d in range(5)]
    df = spark.createDataFrame(rows, ["ts"])
    out = daily_acf(df, max_lag=2).collect()
    assert all(r["acf"] is None for r in out)


def test_cusum_flags_sustained_step(spark):
    from unifydb_spark.operators.events import cusum_shift

    # 10 quiet days (1/day), then 10 loud days (5/day): mu = 3;
    # the positive CUSUM accumulates ~2-mu/20 per loud day and must
    # cross h = mu within a few days; quiet days never flag
    rows = []
    for d in range(10):
        rows.append((_ts(d),))
    for d in range(10, 20):
        for _ in range(5):
            rows.append((_ts(d),))
    df = spark.createDataFrame(rows, ["ts"])
    out = cusum_shift(df).collect()
    assert len(out) == 20
    flagged = [r for r in out if r["flag_pos"]]
    assert flagged and all(r["d"] >= out[10]["d"] for r in flagged)
    assert not any(r["flag_pos"] for r in out[:10])
    # monotone accumulation on the loud run
    assert out[19]["cusum_pos"] > out[12]["cusum_pos"] > 0


def test_cusum_no_flags_on_stationary_series(spark):
    from unifydb_spark.operators.events import cusum_shift

    rows = []
    for d in range(12):
        for _ in range(3):
            rows.append((_ts(d),))
    out = cusum_shift(spark.createDataFrame(rows, ["ts"])).collect()
    assert not any(r["flag_pos"] or r["flag_neg"] for r in out)
    # with x == mu every day, deviation is only the slack: cusum stays 0
    assert all(r["cusum_pos"] == 0.0 for r in out)


def test_theil_decomposition_identity(spark):
    from unifydb_spark.operators.stats import theil_decomposition

    # two groups, known values: verify T = sum(within) + sum(between)
    # against a direct python computation
    rows = [("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 6.0), ("b", 10.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = theil_decomposition(df, "g", "v").collect()
    xs = [v for _, v in rows]
    mu = sum(xs) / len(xs)
    t_direct = sum((x / mu) * math.log(x / mu) for x in xs) / len(xs)
    t_from_parts = sum(r["contrib_within"] + r["contrib_between"] for r in out)
    assert t_from_parts == pytest.approx(t_direct, abs=1e-5)
    # equal-value group has zero within-inequality
    eq = theil_decomposition(
        spark.createDataFrame([("c", 5.0)] * 4, ["g", "v"]), "g", "v"
    ).collect()[0]
    assert eq["theil_g"] == 0.0


def test_wilson_rates_known_values(spark):
    from unifydb_spark.operators.stats import wilson_rates
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("g", i < 8) for i in range(10)], ["grp", "s"]
    )
    out = wilson_rates(df, "grp", F.col("s")).collect()[0]
    assert out["n"] == 10 and out["k"] == 8 and out["rate"] == 0.8
    # Wilson 95% interval for 8/10: approx [0.49, 0.94]
    assert 0.47 < out["ci_lo"] < 0.51
    assert 0.92 < out["ci_hi"] < 0.96
    assert out["ci_lo"] < out["rate"] < out["ci_hi"]


def test_wilson_rates_extreme_p_stays_in_unit_interval(spark):
    from unifydb_spark.operators.stats import wilson_rates
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("g", True)] * 3, ["grp", "s"])
    out = wilson_rates(df, "grp", F.col("s")).collect()[0]
    assert out["rate"] == 1.0
    assert 0.0 <= out["ci_lo"] < 1.0 and out["ci_hi"] <= 1.0


def test_hill_tail_pareto_recovers_alpha(spark):
    from unifydb_spark.operators.stats import hill_tail

    # deterministic Pareto(alpha=2) sample via inverse CDF on a fixed
    # grid: x = (1-u)^(-1/2), u = (i+0.5)/n
    n = 2000
    rows = [
        (i, (1.0 - (i + 0.5) / n) ** -0.5) for i in range(n)
    ]
    df = spark.createDataFrame(rows, ["id", "v"])
    out = hill_tail(df, "v", "id", k=200).collect()[0]
    assert out["k"] == 200
    assert out["alpha"] == pytest.approx(2.0, rel=0.15)


def test_hill_tail_boundary_ties_use_fixed_k(spark):
    from unifydb_spark.operators.stats import hill_tail

    # many ties at the k+1 boundary: ln(1)=0 terms keep H = sum/k exact
    rows = [(i, 1.0) for i in range(50)] + [(100 + i, 10.0) for i in range(5)]
    df = spark.createDataFrame(rows, ["id", "v"])
    out = hill_tail(df, "v", "id", k=10).collect()[0]
    # top-11: five 10.0s and six 1.0s; x_(k+1)=1.0; H = 5*ln(10)/10
    assert out["x_kplus1"] == 1.0
    assert out["hill_h"] == pytest.approx(5 * math.log(10.0) / 10.0, abs=1e-6)


def test_hill_tail_fewer_than_k_positive_values(spark):
    """ADVICE r7: with n_pos < k+1 the divisor is the observed number of
    top-order statistics (n_pos - 1), not the requested k — a constant-k
    divisor would silently underestimate H and inflate alpha."""
    from unifydb_spark.operators.stats import hill_tail

    rows = [(0, 100.0), (1, 10.0), (2, 10.0), (3, 1.0)]
    df = spark.createDataFrame(rows, ["id", "v"])
    out = hill_tail(df, "v", "id", k=200).collect()[0]
    # top-4 (all positives): x_(k+1) -> min = 1.0; 3 order statistics
    # above it; H = (ln(100) + 2*ln(10)) / 3
    assert out["x_kplus1"] == 1.0
    want = (math.log(100.0) + 2 * math.log(10.0)) / 3.0
    assert out["hill_h"] == pytest.approx(want, abs=1e-6)


def test_psi_between_windows_identical_days_zero(spark):
    from unifydb_spark.operators.stats import psi_between_windows

    rows = []
    for day in ("2024-01-01", "2024-01-02"):
        for b in range(4):
            rows.append((day, b, 10))
    counts = spark.createDataFrame(rows, ["day", "bin", "n"])
    out = psi_between_windows(counts, n_bins=4).collect()
    assert len(out) == 1  # only the day with a predecessor
    assert out[0]["day"] == "2024-01-02"
    assert out[0]["psi_vs_prev"] == 0.0
    assert out[0]["n_day"] == 40


def test_psi_between_windows_shift_detected(spark):
    from unifydb_spark.operators.stats import psi_between_windows

    rows = [("2024-01-01", 0, 100), ("2024-01-02", 3, 100)]
    counts = spark.createDataFrame(rows, ["day", "bin", "n"])
    out = psi_between_windows(counts, n_bins=4).collect()[0]
    assert out["psi_vs_prev"] > 3.0  # disjoint bins => large PSI


def test_ddsketch_relative_error_bound(spark):
    from unifydb_spark.operators.sketch import ddsketch_quantiles

    # deterministic lognormal-ish spread via quadratic growth
    rows = [("g", 1.0 + (i * i) % 9973 / 10.0) for i in range(5000)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    out = ddsketch_quantiles(
        df, "grp", "v", rel_err=0.01, probs=(0.5, 0.9, 0.99)
    ).collect()
    xs = sorted(v for _, v in rows)
    for r in out:
        k = max(1, math.ceil(r["p"] * len(xs)))
        true = xs[k - 1]
        assert abs(r["est"] - true) / true <= 0.0101, (r["p"], r["est"], true)


def test_ddsketch_merge_invariance_under_partitioning(spark):
    from unifydb_spark.operators.sketch import ddsketch_quantiles

    rows = [("g", float(1 + i % 97)) for i in range(2000)]
    a = ddsketch_quantiles(
        spark.createDataFrame(rows, ["grp", "v"]).repartition(1), "grp", "v"
    ).collect()
    b = ddsketch_quantiles(
        spark.createDataFrame(rows, ["grp", "v"]).repartition(32), "grp", "v"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_lift_curve_perfect_ranking(spark):
    from unifydb_spark.operators.stats import lift_curve

    # scores perfectly separate: top 20% of scores are ALL the positives
    rows = [(i, float(1000 - i), i < 20) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "score", "y"])
    out = {r["bucket"]: r for r in lift_curve(df, "score", "y", "id").collect()}
    assert out[0]["rate"] == 1.0 and out[1]["rate"] == 1.0
    assert out[1]["cum_capture"] == 1.0  # all positives inside 2 deciles
    assert out[0]["cum_lift"] == 5.0  # 100% rate vs 20% base
    assert all(out[b]["n_pos"] == 0 for b in range(2, 10))


def test_lift_curve_random_scores_lift_one(spark):
    from unifydb_spark.operators.stats import lift_curve

    # label independent of score: every decile's lift ~= 1 exactly when
    # positives are spread uniformly by construction
    rows = [(i, float(i % 10), i % 5 == 0) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "score", "y"])
    out = lift_curve(df, "score", "y", "id").collect()
    assert out[-1]["cum_capture"] == 1.0
    assert out[-1]["cum_lift"] == 1.0


def test_active_users_hand_computed(spark):
    from unifydb_spark.operators.events import active_users

    # user 1 active days 0,1; user 2 active day 1 only
    rows = [(1, _ts(0)), (1, _ts(1)), (1, _ts(1, 5)), (2, _ts(1))]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {r["d"]: r for r in active_users(df).collect()}
    d0 = min(out)
    assert out[d0]["dau"] == 1 and out[d0]["wau"] == 1 and out[d0]["mau"] == 1
    assert out[d0 + 1]["dau"] == 2
    assert out[d0 + 1]["wau"] == 2  # both users within trailing 7d
    assert out[d0 + 1]["stickiness"] == 1.0


def test_active_users_trailing_window_expires(spark):
    from unifydb_spark.operators.events import active_users

    # user 1 on day 0, user 2 on day 10: WAU at day 10 must NOT count
    # user 1 (outside trailing 7), MAU must (within trailing 30)
    rows = [(1, _ts(0)), (2, _ts(10))]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {r["d"]: r for r in active_users(df).collect()}
    d0 = min(out)
    assert out[d0 + 10]["wau"] == 1
    assert out[d0 + 10]["mau"] == 2
    assert out[d0 + 5]["dau"] == 0 and out[d0 + 5]["wau"] == 1


def test_new_vs_returning(spark):
    from unifydb_spark.operators.events import new_vs_returning

    rows = [(1, _ts(0)), (2, _ts(0)), (1, _ts(1)), (3, _ts(1))]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {r["d"]: r for r in new_vs_returning(df).collect()}
    d0 = min(out)
    assert out[d0]["new_users"] == 2 and out[d0]["returning"] == 0
    assert out[d0 + 1]["new_users"] == 1 and out[d0 + 1]["returning"] == 1
    assert out[d0 + 1]["new_frac"] == 0.5


def test_engagement_curve_shares(spark):
    from unifydb_spark.operators.events import engagement_curve

    # 3 users with 1 active day, 1 user with 3 active days
    rows = [(1, _ts(0)), (2, _ts(0)), (3, _ts(1)),
            (4, _ts(0)), (4, _ts(1)), (4, _ts(2))]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {r["active_days"]: r for r in engagement_curve(df).collect()}
    assert out[1]["users"] == 3 and out[3]["users"] == 1
    assert out[1]["user_share"] == 0.75
    assert out[3]["cum_share"] == 1.0


def test_seasonal_anomaly_weekday_cadence_not_flagged(spark):
    from unifydb_spark.operators.events import seasonal_anomaly

    # perfect weekly cadence: weekdays 5/day, weekend-position days
    # 1/day over 4 weeks — NO day should be anomalous under the
    # weekday-profile baseline (r25's trailing window would flag them)
    rows = []
    for d in range(28):
        n = 1 if d % 7 in (5, 6) else 5
        for _ in range(n):
            rows.append(("click", _ts(d)))
    df = spark.createDataFrame(rows, ["event_type", "ts"])
    out = seasonal_anomaly(df).collect()
    assert len(out) == 28
    assert not any(r["anomaly"] for r in out)
    assert all(r["z"] is None or abs(r["z"]) < 1e-9 for r in out)


def test_seasonal_anomaly_flags_weekday_break(spark):
    from unifydb_spark.operators.events import seasonal_anomaly

    # same cadence but one weekday explodes 30x; small natural jitter
    # keeps the leave-one-out variance nonzero
    rows = []
    for d in range(35):
        n = 5 + (d % 3) if d % 7 < 5 else 1
        if d == 14:
            n = 150
        for _ in range(n):
            rows.append(("click", _ts(d)))
    df = spark.createDataFrame(rows, ["event_type", "ts"])
    out = {r["d"]: r for r in seasonal_anomaly(df).collect()}
    d0 = min(out)
    assert out[d0 + 14]["anomaly"]
    normal = [r for d, r in out.items() if d != d0 + 14]
    assert sum(1 for r in normal if r["anomaly"]) == 0


def test_peak_concurrency_hand_case(spark):
    from unifydb_spark.operators.events import peak_concurrency

    # intervals: [0,10) [5,15) [9,12) overlap 3-deep at t=9; [20,30)
    rows = [
        (_ts(0, 0), _ts(0, 10)),
        (_ts(0, 5), _ts(0, 15)),
        (_ts(0, 9), _ts(0, 12)),
        (_ts(0, 20), _ts(1, 6)),
    ]
    df = spark.createDataFrame(rows, ["s", "e"])
    out = peak_concurrency(df, "s", "e").collect()[0]
    assert out["peak"] == 3 and out["n_intervals"] == 4
    # peak first reached when the third interval opens (hour 9)
    import calendar

    assert out["peak_at"] == calendar.timegm(_ts(0, 9).timetuple())


def test_peak_concurrency_touching_intervals_do_not_overlap(spark):
    from unifydb_spark.operators.events import peak_concurrency

    # [0,5) and [5,10): half-open — end before start at t=5, peak 1
    rows = [(_ts(0, 0), _ts(0, 5)), (_ts(0, 5), _ts(0, 10))]
    df = spark.createDataFrame(rows, ["s", "e"])
    out = peak_concurrency(df, "s", "e").collect()[0]
    assert out["peak"] == 1


def test_cohort_ltv_hand_case(spark):
    from unifydb_spark.operators.olap import cohort_ltv
    import datetime

    rows = [
        (1, datetime.date(2024, 1, 5), 100.0),
        (1, datetime.date(2024, 2, 7), 50.0),
        (2, datetime.date(2024, 1, 20), 30.0),
        (3, datetime.date(2024, 2, 1), 80.0),
    ]
    df = spark.createDataFrame(rows, ["o_custkey", "o_orderdate", "o_totalprice"])
    out = {(r["cohort"], r["age"]): r for r in cohort_ltv(df).collect()}
    jan = out[("2024-01", 0)]
    assert jan["cohort_size"] == 2 and jan["revenue"] == 130.0
    assert jan["cum_ltv_per_customer"] == 65.0
    jan1 = out[("2024-01", 1)]
    assert jan1["revenue"] == 50.0
    assert jan1["cum_ltv_per_customer"] == 90.0  # (130+50)/2
    feb = out[("2024-02", 0)]
    assert feb["cohort_size"] == 1 and feb["revenue"] == 80.0


def test_weighted_quantiles_hand_case(spark):
    from unifydb_spark.operators.stats import weighted_quantiles

    # values 1 (weight 1), 2 (weight 1), 10 (weight 8): by count the
    # median is 2; by WEIGHT the median is 10 (cumw hits 5/10 there)
    rows = [("g", 1.0, 1), ("g", 2.0, 1), ("g", 10.0, 8)]
    df = spark.createDataFrame(rows, ["grp", "v", "w"])
    out = {r["p"]: r for r in weighted_quantiles(df, "grp", "v", "w").collect()}
    assert out[0.5]["value"] == 10.0
    assert out[0.25]["value"] == 10.0  # cum 2/10 < 2.5 until 10
    assert out[0.5]["w_total"] == 10


def test_weighted_quantiles_uniform_weights_match_unweighted_rank(spark):
    from unifydb_spark.operators.stats import weighted_quantiles

    rows = [("g", float(v), 1) for v in range(1, 11)]
    df = spark.createDataFrame(rows, ["grp", "v", "w"])
    out = {r["p"]: r["value"] for r in weighted_quantiles(df, "grp", "v", "w").collect()}
    # lower order statistic at ceil(p*n)
    assert out[0.25] == 3.0 and out[0.5] == 5.0 and out[0.75] == 8.0


def test_day_overlap_hand_case(spark):
    from unifydb_spark.operators.events import day_overlap

    # day0: {1,2,3}; day1: {2,3,4}; day2: {9}
    rows = [(1, _ts(0)), (2, _ts(0)), (3, _ts(0)),
            (2, _ts(1)), (3, _ts(1)), (4, _ts(1)),
            (9, _ts(2))]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {r["d"]: r for r in day_overlap(df).collect()}
    d0 = min(out) - 1
    assert out[d0 + 1]["returned"] == 2
    assert out[d0 + 1]["jaccard"] == 0.5  # 2 / (3+3-2)
    assert out[d0 + 1]["return_rate"] == pytest.approx(2 / 3, abs=1e-6)
    assert out[d0 + 2]["returned"] == 0 and out[d0 + 2]["jaccard"] == 0.0


def test_embedding_health_collapse_vs_spread(spark):
    from unifydb_spark.operators.similarity import embedding_health

    # 'collapsed': all vectors identical -> anisotropy 1;
    # 'spread': vectors cancel pairwise -> mean 0 -> anisotropy 0
    rows = []
    for i in range(6):
        rows.append((i, [1.0, 0.0, 0.0, 0.0], "collapsed"))
    for i in range(6, 12):
        sign = 1.0 if i % 2 == 0 else -1.0
        rows.append((i, [sign, 0.0, 0.0, 0.0], "spread"))
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {r["label"]: r for r in embedding_health(df).collect()}
    assert out["collapsed"]["anisotropy"] == 1.0
    assert out["collapsed"]["avg_norm"] == 1.0
    assert out["spread"]["anisotropy"] == 0.0
    assert out["spread"]["mean_norm"] == 0.0


def test_temporal_split_audit_counts_and_leakage(spark):
    from unifydb_spark.operators.quality import temporal_split_audit

    # 10 hourly events on one day: cuts at 70% / 90% of the [0, 9]h
    # span; user 1 appears in train AND test (leak), user 9 only test
    rows = [(1, _ts(0, h)) for h in range(7)]
    rows += [(5, _ts(0, 7)), (1, _ts(0, 8)), (9, _ts(0, 9))]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {r["split"]: r for r in temporal_split_audit(df).collect()}
    # span 9h: train <= 6.3h -> hours 0-6; valid <= 8.1h -> 7,8; test 9
    assert out["train"]["n_rows"] == 7 and out["train"]["users"] == 1
    assert out["valid"]["n_rows"] == 2
    assert out["test"]["n_rows"] == 1 and out["test"]["users"] == 1
    # user 9 is test-only: no leakage rows
    assert out["_leakage"]["n_rows"] == 0 and out["_leakage"]["users"] == 0


def test_temporal_split_audit_flags_leaking_user(spark):
    from unifydb_spark.operators.quality import temporal_split_audit

    rows = [(1, _ts(0, h)) for h in range(9)] + [(1, _ts(0, 9))]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {r["split"]: r for r in temporal_split_audit(df).collect()}
    assert out["_leakage"]["users"] == 1
    assert out["_leakage"]["n_rows"] == out["test"]["n_rows"]
