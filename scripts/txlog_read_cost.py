"""Reproduce the SCALE.md round-10 commit-log read-cost table.

Builds an N-commit log (pure-Python write path, no JVM until the
checkpoint), then times `_live_files` head reads in four log states:

1. N manifests, no checkpoint        — full O(N) manifest parse
2. checkpointed + _last_checkpoint   — parse starts at the checkpoint
3. checkpointed, pointer deleted     — degraded full scan (same answer)
4. after aggressive vacuum           — log truncated to the checkpoint

The point being measured: a manifest-per-commit log's read cost grows
O(total commits) FOREVER without the pointer; with it, reads parse only
(commits since last checkpoint), and vacuum-time log truncation bounds
the directory listing itself. See txlog.py module docstring and
tests/test_txlog.py::test_last_checkpoint_pointer_bounds_manifest_reads
for the correctness half (a corrupt/stale pointer only costs a full
scan, never a wrong answer).

Usage: python scripts/txlog_read_cost.py [n_commits] [reps]
       (defaults 500, 50; run on an idle host, same discipline as
       bench.py)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unifydb_spark.txlog import LogParquetBackend


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    d = tempfile.mkdtemp(prefix="txlog_read_cost_")
    b = LogParquetBackend(None, os.path.join(d, "facts"))

    t0 = time.time()
    for i in range(1, n + 1):
        b.append(
            [(i, "n", "long", i, None, None, None, None, None, None, i, True)]
        )
    print(f"built {n}-commit log in {time.time() - t0:.1f}s")

    def mean_ms() -> float:
        t = time.time()
        for _ in range(reps):
            b._live_files()
        return (time.time() - t) / reps * 1000

    pre = mean_ms()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    b.spark = spark
    b.checkpoint()
    with_ptr = mean_ms()
    os.unlink(b._lc_path)  # same log, pointer gone
    degraded = mean_ms()
    # restore the pointer before vacuum (checkpoint wrote it; vacuum's
    # truncation is independent of it)
    b._write_last_checkpoint(b.log_version())
    b.vacuum(retain_before_checkpoint=False, retention_seconds=0.0)
    truncated = mean_ms()

    print(
        f"_live_files mean ms over {reps} reps:\n"
        f"  {n} manifests, no checkpoint : {pre:8.2f}\n"
        f"  checkpoint + pointer         : {with_ptr:8.2f}\n"
        f"  checkpoint, pointer deleted  : {degraded:8.2f}\n"
        f"  after log truncation         : {truncated:8.2f}"
        f"  ({len(b._list_versions())} manifests listed)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
