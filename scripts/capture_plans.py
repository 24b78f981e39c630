"""Capture `.explain('formatted')` output for named queries() entries to
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence the
judge checks plan claims against (OPTIMIZATION_r15.md deliverable).

Usage: python scripts/capture_plans.py <tag> <suffix> <query> [query ...]
e.g.   python scripts/capture_plans.py r15 before r149_ivf_pq_trained
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")


def main():
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("capture-plans")
        .config("spark.sql.shuffle.partitions",
                str(max(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from unifydb_spark.resources import release_persisted

    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        n_ex = buf.getvalue().count("Exchange")
        print(f"wrote {path} ({n_ex} Exchange nodes)")
        release_persisted()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
