"""Distribution-statistics operators: grouped exact/approximate quantiles.

Exact quantiles (`group_quantiles`) use Spark's `percentile` aggregate —
it buffers the group's values, so it is the CORRECTNESS formulation: right
for per-group cardinalities up to ~10^7 (per-source document lengths,
per-label score distributions). At 100 TB with billions of values per
group, switch to `group_quantiles_approx` (KLL-sketch `percentile_approx`,
bounded memory, mergeable partials) — same shape, rank error <= 1/accuracy;
its output is not bit-reproducible across partitionings, so the exact
variant remains the oracle-checked one.

Interpolation parity: Spark `percentile` and DuckDB `quantile_cont` both
compute the linear-interpolated value at rank p*(n-1) — verified identical
to the last ulp, rounded at the boundary anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PROBS = (0.25, 0.5, 0.9, 0.99)


def _pname(p: float) -> str:
    return ("p%g" % (p * 100)).replace(".", "_")


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: tuple = DEFAULT_PROBS,
) -> DataFrame:
    """Per-group count/min/max + exact interpolated quantiles (rounded
    DOUBLE). One shuffle on group_col; partials are per-group value
    buffers (see module docstring for the scale boundary)."""
    v = F.col(value_col).cast("double")
    aggs = [
        F.count(v).alias("n"),
        F.round(F.min(v), 4).alias("v_min"),
        F.round(F.max(v), 4).alias("v_max"),
    ] + [F.round(F.percentile(v, F.lit(p)), 4).alias(_pname(p)) for p in probs]
    return df.groupBy(group_col).agg(*aggs)


def group_quantiles_sql(
    table: str,
    group_col: str,
    value_col: str,
    probs: tuple = DEFAULT_PROBS,
) -> str:
    v = f"CAST({value_col} AS DOUBLE)"
    qs = ",\n               ".join(
        f"ROUND(quantile_cont({v}, {p}), 4) AS {_pname(p)}" for p in probs
    )
    return f"""
        SELECT {group_col}, COUNT({v}) AS n,
               ROUND(MIN({v}), 4) AS v_min, ROUND(MAX({v}), 4) AS v_max,
               {qs}
        FROM {table} GROUP BY {group_col} ORDER BY {group_col}
    """


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    threshold: float = 3.0,
) -> DataFrame:
    """Per-group robust outlier flags: z = (v - median) / IQR, flagged
    when |z| > threshold. Median/quartiles are the exact interpolated
    `percentile` aggregates (DuckDB `quantile_cont` parity is
    ulp-identical, see module docstring), so the z-score is a
    deterministic double on both engines — no mean/stddev streaming-order
    drift, and robust statistics are what you actually want for anomaly
    flags on heavy-tailed telemetry.

    Shape: one shuffle for the per-group quantiles (tiny result — one row
    per group), broadcast back onto the events; at 100 TB swap the exact
    percentile for the mergeable `percentile_approx` sketch and the plan
    is unchanged. Groups with IQR = 0 yield NULL z / no flag."""
    v = F.col(value_col).cast("double")
    stats = df.groupBy(group_col).agg(
        F.percentile(v, F.lit(0.5)).alias("_med"),
        F.percentile(v, F.lit(0.25)).alias("_q1"),
        F.percentile(v, F.lit(0.75)).alias("_q3"),
    )
    iqr = F.col("_q3") - F.col("_q1")
    z = F.when(iqr != 0.0, (v - F.col("_med")) / iqr)
    return (
        df.join(F.broadcast(stats), group_col)
        .withColumn("robust_z", F.round(z, 4))
        .withColumn(
            "is_outlier",
            F.coalesce(F.abs(z) > float(threshold), F.lit(False)),
        )
        .drop("_med", "_q1", "_q3")
    )


def robust_outliers_sql(
    table: str,
    group_col: str,
    value_col: str,
    threshold: float = 3.0,
    select_cols: str = "*",
) -> str:
    v = f"CAST({value_col} AS DOUBLE)"
    return f"""
        WITH s AS (
          SELECT {group_col},
                 quantile_cont({v}, 0.5) AS med,
                 quantile_cont({v}, 0.25) AS q1,
                 quantile_cont({v}, 0.75) AS q3
          FROM {table} GROUP BY 1
        )
        SELECT {select_cols},
               ROUND(CASE WHEN q3 - q1 <> 0
                          THEN ({v} - med) / (q3 - q1) END, 4) AS robust_z,
               COALESCE(CASE WHEN q3 - q1 <> 0
                             THEN abs(({v} - med) / (q3 - q1)) > {threshold}
                        END, FALSE) AS is_outlier
        FROM {table} JOIN s USING ({group_col})
    """


def group_quantiles_approx(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: tuple = DEFAULT_PROBS,
    accuracy: int = 10_000,
) -> DataFrame:
    """The 100 TB formulation: mergeable `percentile_approx` sketches,
    O(accuracy) state per group regardless of group size. Not
    bit-reproducible across partitionings -> pytest-checked against the
    exact quantiles with a rank-error bound, not oracle-hashed."""
    v = F.col(value_col).cast("double")
    aggs = [F.count(v).alias("n")] + [
        F.percentile_approx(v, F.lit(p), F.lit(accuracy)).alias(_pname(p))
        for p in probs
    ]
    return df.groupBy(group_col).agg(*aggs)


# ---------------------------------------------------------------------------
# Exact global quantiles WITHOUT a global sort (iterative histogram
# narrowing) — the 100 TB path where group_quantiles' per-group value
# buffer no longer fits

def _order_stat_pair(vals: DataFrame, k: int, lo: float, hi: float,
                     buckets: int, exact_threshold: int):
    """Resolve the 0-based order statistics (k, k+1) of the `v` column
    by iterative histogram narrowing: each round is ONE combinable
    aggregation returning <= `buckets` rows of (count, min, max) to the
    driver (a bounded artifact, like the bloom bitmap), shrinking the
    candidate interval until few enough values remain to sort exactly.

    Two properties make this exact despite float bucket math:
    - bucket(v) = floor((v - lo) / width) is MONOTONE in v under IEEE
      rounding (subtraction, positive division, floor all preserve
      order), so each bucket's rows are a contiguous value range;
    - the next interval snaps to the chosen bucket's ACTUAL min/max
      (from the same aggregation), so the range filter [bmin, bmax]
      selects exactly the bucket's rows and `n_lt_lo` (the count of
      values before the interval) stays exact. bmin == bmax means every
      remaining candidate is one double — duplicates-heavy data resolves
      in that round instead of stalling.

    Rounds are O(log_buckets(n / exact_threshold)): 3 aggregations
    narrow 10^12 rows to a 10^5 sliver at buckets=4096."""
    v = F.col("v")
    n_lt_lo = 0
    while True:
        cand = vals.filter((v >= lo) & (v <= hi))
        if lo == hi:
            return lo, lo
        n_cand = cand.count()
        if n_cand <= exact_threshold:
            ordered = [r["v"] for r in cand.orderBy("v").collect()]
            v0 = ordered[k - n_lt_lo]
            # the adjacent order statistic k+1 is almost always in the
            # same sliver; when k is the sliver's last element, it is
            # the minimum beyond the interval (one more tiny job)
            if k + 1 - n_lt_lo < len(ordered):
                v1 = ordered[k + 1 - n_lt_lo]
            else:
                nxt = vals.filter(v > hi).agg(F.min("v")).collect()
                v1 = nxt[0][0] if nxt[0][0] is not None else v0
            return v0, v1
        width = (hi - lo) / buckets
        bexpr = F.greatest(
            F.lit(0),
            F.least(F.floor((v - lo) / width).cast("int"), F.lit(buckets - 1)),
        )
        hist = {
            r["b"]: (r["c"], r["bmin"], r["bmax"])
            for r in cand.groupBy(bexpr.alias("b"))
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.min("v").alias("bmin"),
                F.max("v").alias("bmax"),
            )
            .collect()
        }
        acc = n_lt_lo
        for b in sorted(hist):
            c, bmin, bmax = hist[b]
            if acc + c > k:
                lo, hi, n_lt_lo = bmin, bmax, acc
                break
            acc += c


def exact_quantiles_scalable(
    df: DataFrame,
    value_col: str,
    probs: tuple = DEFAULT_PROBS,
    buckets: int = 4096,
    exact_threshold: int = 100_000,
) -> DataFrame:
    """Exact linear-interpolated quantiles of a column with NO global
    sort and NO per-executor value buffer: min/max + iterative histogram
    narrowing resolve the two order statistics around each target rank,
    then interpolate exactly as `percentile`/`quantile_cont` do
    (rank r = p*(n-1); value = (1-frac)*x[floor(r)] + frac*x[floor(r)+1]).

    Every cluster-side step is a combinable aggregation; everything the
    driver ever holds is <= `buckets` histogram rows or the final
    <= `exact_threshold` sliver. Compare: Spark's own `percentile` is
    exact but buffers ALL values per group; `percentile_approx` is
    bounded-memory but approximate and partitioning-dependent. This is
    the third point of the triangle — exact AND bounded — at the cost of
    O(log_buckets(n)) extra scans of a single column projection (each
    narrower than the last after predicate pushdown on v).

    Returns one row per prob: (quantile, value) — value rounded to 4
    decimals like group_quantiles."""
    from unifydb_spark.resources import tracked_persist

    # one narrow column, scanned by every narrowing round — persist it
    # (released by the caller's resource scope, like every operator)
    vals = tracked_persist(
        df.select(F.col(value_col).cast("double").alias("v")).filter(
            F.col("v").isNotNull()
        )
    )
    first = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    ).collect()[0]
    n, lo, hi = first["n"], first["lo"], first["hi"]
    spark = df.sparkSession
    if n == 0:
        return spark.createDataFrame([], "quantile string, value double")
    targets = []
    pairs: dict[int, tuple] = {}
    for p in probs:
        r = p * (n - 1)
        k0 = int(r)
        frac = r - k0
        targets.append((p, k0, frac))
        pairs[k0] = None
    for k0 in pairs:
        if k0 >= n - 1:
            # top rank: both stats are the max
            pairs[k0] = (hi, hi)
        else:
            pairs[k0] = _order_stat_pair(
                vals, k0, lo, hi, buckets, exact_threshold
            )
    rows = [
        (
            _pname(p),
            float(
                round(
                    (1.0 - frac) * pairs[k0][0] + frac * pairs[k0][1], 4
                )
            ),
        )
        for (p, k0, frac) in targets
    ]
    return spark.createDataFrame(rows, "quantile string, value double")


def exact_quantiles_scalable_sql(
    table: str, value_col: str, probs: tuple = DEFAULT_PROBS
) -> str:
    v = f"CAST({value_col} AS DOUBLE)"
    selects = " UNION ALL ".join(
        f"SELECT '{_pname(p)}' AS quantile,"
        f" ROUND(quantile_cont({v}, {p}), 4) AS value FROM {table}"
        for p in probs
    )
    return f"SELECT * FROM ({selects}) ORDER BY quantile"


def table_profile(df: "DataFrame", cols: "Sequence[str]") -> "DataFrame":
    """ANALYZE-style column statistics in ONE pass: per column, the
    non-null count, null count, exact distinct count, and min/max
    (stringified — engine-neutral for integer/string columns; round
    doubles before profiling them). This is the table-statistics input
    a cost-based planner (or a human sizing a join) reads: ndv drives
    join-order and broadcast decisions, null fraction flags unusable
    keys, min/max bound partition pruning.

    Plan shape: one aggregation; Spark rewrites the multi-column
    DISTINCT aggregate into an Expand (one input row -> one row per
    distinct-column) + a single partially-aggregated shuffle — the
    exact same machinery as grouping sets, so cost is c x scan volume
    pre-combine but only O(ndv) on the wire, never a second table
    scan per column. The wide 1-row result is then unpivoted with
    stack() — driver-free."""
    from pyspark.sql import functions as F

    aggs = [F.count(F.lit(1)).alias("_total")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__n"),
            F.countDistinct(c).alias(f"{c}__ndv"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__ndv, {c}__min, {c}__max" for c in cols
    )
    return wide.selectExpr(
        "_total",
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, n_nonnull, ndv, min_val, max_val)",
    ).select(
        "col_name",
        F.col("n_nonnull").cast("bigint").alias("n_nonnull"),
        (F.col("_total") - F.col("n_nonnull")).cast("bigint").alias("n_null"),
        F.col("ndv").cast("bigint").alias("ndv"),
        "min_val",
        "max_val",
    )


def table_profile_sql(table: str, cols: "Sequence[str]") -> str:
    parts = [
        f"""
        SELECT '{c}' AS col_name,
               CAST(COUNT({c}) AS BIGINT) AS n_nonnull,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv,
               MIN(CAST({c} AS VARCHAR)) AS min_val,
               MAX(CAST({c} AS VARCHAR)) AS max_val
        FROM {table}
        """
        for c in cols
    ]
    return " UNION ALL ".join(parts) + " ORDER BY col_name"
