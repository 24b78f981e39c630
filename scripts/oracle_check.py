"""Local replica of the driver's t2 correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() twin on DuckDB
over the same parquet, compare row count + schema-ish + order-insensitive
values. Usage:  python scripts/oracle_check.py [sf_dir] [query ...]"""

from __future__ import annotations

import datetime
import math
import sys
import time
from decimal import Decimal

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, float) and v.is_integer():
        return v
    return v


def rows_key(r):
    return str(r)


def compare(name, spark_rows, oracle_rows):
    a = sorted([tuple(norm(v) for v in r) for r in spark_rows], key=rows_key)
    b = sorted([tuple(norm(v) for v in r) for r in oracle_rows], key=rows_key)
    if len(a) != len(b):
        return False, f"row count {len(a)} vs {len(b)}"
    worst = 0.0
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False, f"arity {len(ra)} vs {len(rb)}"
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if va != vb:
                    d = abs(va - vb)
                    rel = d / max(abs(va), abs(vb), 1e-300)
                    worst = max(worst, rel)
                    if rel > 1e-9:
                        return False, f"value {va!r} vs {vb!r} (rel {rel:.2e})"
            elif va != vb:
                return False, f"value {va!r} vs {vb!r}"
    note = f" (max float rel diff {worst:.1e})" if worst else ""
    return True, f"{len(a)} rows exact{note}"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only: {len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[name])
            orows = cur.fetchall()
            ocols = [d[0] for d in cur.description]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns {scols} vs {ocols}")
            n_fail += 1
            continue
        # align column order by name (the driver sorts columns by name)
        sidx = [scols.index(c) for c in sorted(scols)]
        oidx = [ocols.index(c) for c in sorted(ocols)]
        srows2 = [tuple(r[i] for i in sidx) for r in srows]
        orows2 = [tuple(r[i] for i in oidx) for r in orows]
        ok, msg = compare(name, srows2, orows2)
        if ok:
            print(f"PASS {name}: {msg} ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
