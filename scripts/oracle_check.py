"""Local replica of the driver's CORRECTNESS gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() twin on DuckDB
over the same parquet, and compare the way the driver does — pandas frames,
columns sorted by name, rows sorted by all columns, values compared via
their string representation with NO float tolerance and NO container
normalization.

Evidence for this semantics (round-1 forensics): the driver hash-failed
DECIMAL columns (Spark collects decimal.Decimal objects -> '1.5000000000',
DuckDB .df() gives float64 -> '1.5') and DuckDB HUGEINT sums (float64
'3.0' vs Spark int64 '3'), but hash-PASSED a raw timestamp column even
though Spark pandas dtype is datetime64[ns] and DuckDB's is
datetime64[us] — str(Timestamp) is identical for both. An array<string>
column crashed its canonicalizer inside pandas sort_values
(Categorical factorize: "unhashable type: 'list'"), so list-valued
output columns are a hard error here too.

Usage:  python scripts/oracle_check.py [sf_dir] [query ...]

Set ORACLE_TIMEOUT_S=<seconds> to bound each entry (Spark jobs cancelled
via cancelAllJobs, DuckDB via connection.interrupt()); expired entries
print `TIMEOUT <name> <phase>` and the sweep continues — how the full
sf1 sweep records oracle-side blowups honestly instead of hanging.
"""

from __future__ import annotations

import os
import sys
import threading
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonical frame: columns sorted by name, rows sorted
    by all columns (raises TypeError on unhashable cell values, exactly
    like the driver's canonicalizer), index dropped."""
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame):
    """Returns (rows_match, schema_match, hash_match, detail)."""
    rows_match = len(spark_pdf) == len(oracle_pdf)
    schema_match = sorted(spark_pdf.columns) == sorted(oracle_pdf.columns)
    if not rows_match or not schema_match:
        return rows_match, schema_match, False, (
            f"rows {len(spark_pdf)} vs {len(oracle_pdf)}, "
            f"cols {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
        )
    a = canon(spark_pdf).astype(str)
    b = canon(oracle_pdf).astype(str)
    if a.equals(b):
        return True, True, True, f"{len(a)} rows exact"
    # locate the first differing cell for the report
    for col in a.columns:
        neq = a[col].values != b[col].values
        if neq.any():
            i = int(neq.argmax())
            return True, True, False, (
                f"col {col!r} row {i}: spark {a[col].iloc[i]!r} "
                f"vs oracle {b[col].iloc[i]!r} "
                f"(dtypes {spark_pdf[col].dtype} vs {oracle_pdf[col].dtype})"
            )
    return True, True, False, "frames differ (order only?)"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        # match bench.py's driver sizing: at sf1-scale sweeps the default
        # 1g driver rejects AQE auto-broadcasts ("not enough memory to
        # build and broadcast") that are fine under a realistic budget
        .config(
            "spark.driver.memory",
            __import__("os").environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # driver testdata = single parquet files; scratch data written by
        # Spark (e.g. fixtures/sf1, scripts/gen_scale_data.py) =
        # directories of part files — glob those for DuckDB
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    timeout_s = float(os.environ.get("ORACLE_TIMEOUT_S", "0")) or None

    def timed_phase(fn, on_timeout):
        """Run fn under the budget. Returns (result, exception, fired):
        `fired` is True iff the cancellation path actually ran — the ONLY
        evidence that classifies an outcome as TIMEOUT. A genuine failure
        that merely took longer than the budget keeps its exception
        (ADVICE r9: elapsed time alone must not mask real errors), and a
        success that outlived the budget is reported as a pass with an
        EXPIRED warning rather than silently trusted or discarded."""
        fired = threading.Event()
        if timeout_s is None:
            try:
                return fn(), None, False
            except Exception as e:  # noqa: BLE001 — reported per-query
                return None, e, False
        def _fire():
            fired.set()
            try:
                on_timeout()
            except Exception:
                pass
        timer = threading.Timer(timeout_s, _fire)
        timer.start()
        try:
            out = fn()
            return out, None, fired.is_set()
        except Exception as e:  # noqa: BLE001
            return None, e, fired.is_set()
        finally:
            timer.cancel()

    n_pass = n_fail = n_timeout = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        spark_pdf, exc, expired = timed_phase(
            lambda: fn(spark, sf_dir).toPandas(),
            spark.sparkContext.cancelAllJobs,
        )
        if exc is not None:
            if expired:
                print(f"TIMEOUT {name} spark ({timeout_s:.0f}s budget; "
                      f"cancellation fired)")
                n_timeout += 1
            else:
                print(f"FAIL {name}: spark error: {type(exc).__name__}: "
                      f"{str(exc)[:300]}")
                n_fail += 1
            continue
        if expired:
            print(f"WARN {name}: completed after the {timeout_s:.0f}s budget "
                  f"expired ({time.time()-t0:.1f}s) — result kept, run is "
                  "over budget")
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only: {len(spark_pdf)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        oracle_pdf, exc, expired = timed_phase(
            lambda: con.execute(oracles[name]).df(), con.interrupt
        )
        if exc is not None:
            if expired:
                print(f"TIMEOUT {name} duckdb-oracle ({timeout_s:.0f}s budget; "
                      f"interrupt fired)")
                n_timeout += 1
            else:
                print(f"FAIL {name}: duckdb error: {exc}")
                n_fail += 1
            continue
        try:
            rm, sm, hm, msg = compare(spark_pdf, oracle_pdf)
        except Exception:
            print(f"FAIL {name}: canonicalizer error (driver would err too):\n"
                  + traceback.format_exc(limit=2))
            n_fail += 1
            continue
        if rm and sm and hm:
            print(f"PASS {name}: {msg} ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows_match={rm} schema_match={sm} "
                  f"hash_match={hm}: {msg}")
            n_fail += 1
    if n_timeout:
        print(f"\n{n_pass} pass, {n_fail} fail, {n_timeout} timeout")
    else:
        print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
