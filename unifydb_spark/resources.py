"""Lifecycle tracking for operator-internal persisted DataFrames.

Operators persist shared intermediates (shingle relations, signature
tables, term-frequency matrices) because their returned plan references
the intermediate more than once and Catalyst cannot reuse the exchange
across different aggregations. The persist is correct, but Spark's
CacheManager never releases those entries on its own: a long-lived
session (the HTTP server, a notebook) accumulates executor storage with
every operator call.

The contract here: operators route such persists through
`tracked_persist`; anything that materializes results and is done with
the operator output calls `release_persisted()` (bench.py between
queries, the server after a request, tests at teardown). Iterative
operators whose loop intermediates are NOT referenced by the returned
frame (graph fixpoints, k-means) instead unpersist inline via
try/finally — they need no caller cooperation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_tracked: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() a shared intermediate and register it for scoped release."""
    df = df.persist()
    _tracked.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every tracked intermediate (non-blocking); returns the
    number released. Safe to call at any time: results already
    materialized are unaffected, lazy plans recompute without the cache."""
    n = 0
    while _tracked:
        df = _tracked.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
