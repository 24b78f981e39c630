"""Data-quality validation: declarative constraint checks compiled to a
one-row-per-check report (check_name, n_violations, n_checked).

The pre-training gate every pipeline needs before mixing a new source:
null/range predicates, key uniqueness, referential integrity. Each check
is a full-scan aggregate — map-side-combinable, no wide rows, no
collect — and independent checks on the same table share the scan when
Spark caches it. At 100 TB each check is one pass; uniqueness and
referential checks add one shuffle each (groupBy on the key / left-anti
join, broadcastable when the parent's key set is small). The report
itself is O(checks) rows.

The reference has no validation operators (SURVEY §2.6) — pipeline
extension.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _report_row(name: str, viol: DataFrame, checked: DataFrame) -> DataFrame:
    """Shape (1-row violations frame) x (1-row count frame) into the
    report schema."""
    return (
        viol.crossJoin(checked)
        .select(
            F.lit(name).alias("check_name"),
            F.col("n_violations").cast("long").alias("n_violations"),
            F.col("n_checked").cast("long").alias("n_checked"),
        )
    )


def check_predicate(df: DataFrame, name: str, violation: Column) -> DataFrame:
    """Rows where `violation` is true are defects."""
    agg = df.agg(
        F.coalesce(F.sum(F.when(violation, 1)), F.lit(0)).alias(
            "n_violations"
        ),
        F.count(F.lit(1)).alias("n_checked"),
    )
    return agg.select(
        F.lit(name).alias("check_name"),
        F.col("n_violations").cast("long"),
        F.col("n_checked").cast("long"),
    )


def check_unique(df: DataFrame, name: str, cols: list) -> DataFrame:
    """n_violations = surplus rows beyond the first per duplicated key
    (so 0 means the key is unique)."""
    dup = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
    )
    viol = dup.agg(
        F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("n_violations")
    )
    checked = df.agg(F.count(F.lit(1)).alias("n_checked"))
    return _report_row(name, viol, checked)


def check_referential(
    child: DataFrame, fk: str, parent: DataFrame, pk: str, name: str
) -> DataFrame:
    """Non-null child fk values with no parent pk — left-anti join,
    broadcast when the parent key set is small."""
    orphans = child.filter(F.col(fk).isNotNull()).join(
        parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
    )
    viol = orphans.agg(F.count(F.lit(1)).alias("n_violations"))
    checked = child.agg(F.count(F.lit(1)).alias("n_checked"))
    return _report_row(name, viol, checked)


def dq_report(checks: list) -> DataFrame:
    """Union the per-check one-row frames into the report."""
    return reduce(DataFrame.unionByName, checks)
