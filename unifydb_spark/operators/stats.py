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
