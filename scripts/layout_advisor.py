"""Facts-table physical layout advisor (VERDICT r9 ask #8).

Measures — with the repo's OWN zone-map advisor (operators/layout.py
zonemap_eq_prune_profile, the r63 machinery) — how many blocks each
pattern-workload predicate class must scan under the candidate
checkpoint sort orders, and prints the table SCALE.md records. This is
the measurement that justifies `LogParquetBackend.checkpoint()`'s
default `sort_cols=("a", "e", "tx")`.

Candidates (the reference's covering B-tree orders re-expressed as one
physical sort, src/unifydb/storage.clj:57-68, plus Z-order):
  - avet  = (a, e, tx)  — attribute-major (AVET-shaped)
  - eavt  = (e, a, tx)  — entity-major (EAVT-shaped)
  - taev  = (tx, a, e)  — log/insertion order
  - zorder= bit-interleave(attr-id, e) — the multi-dimension compromise

Workloads, from the q01-q18 pattern-query shapes:
  A. attribute equality `a = <attr>` — EVERY pattern clause in the
     q01-q18 Datalog workload constrains the attribute (compile.py
     compile_pattern pushes `a = const` into the scan), so this class
     is ~all scan predicates;
  B. bound-entity equality `e = <id>` — pull (q18) and bound-call
     (r137 magic-seeded) lookups.

Usage: python scripts/layout_advisor.py [sf_dir]  (default sf0.01)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def zorder_key(aid_col, e_col, aid_bits: int = 6, e_bits: int = 16):
    """Bit-interleaved Z-order key: aid's low `aid_bits` bits spread
    over the even positions of e's low `e_bits` bits (classic Morton
    order restricted to the cardinalities at hand: tens of attributes,
    entity keys dense within table bases)."""
    z = F.lit(0).cast("long")
    for i in range(max(aid_bits, e_bits)):
        if i < e_bits:
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(e_col, i).bitwiseAND(F.lit(1)), 2 * i)
            )
        if i < aid_bits:
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(aid_col, i).bitwiseAND(F.lit(1)), 2 * i + 1
                )
            )
    return z


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("layout-advisor")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from unifydb_spark.operators.layout import zonemap_eq_prune_profile
    from unifydb_spark.resources import tracked_persist
    from unifydb_spark.sources.tables import TableFactView

    facts = TableFactView(spark, sf_dir).facts_df().select("e", "a", "tx")
    # dictionary-encode a for the Z-order arm (small broadcast dict)
    attr_ids = (
        facts.select("a").distinct().orderBy("a")
        .withColumn("aid", F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.orderBy("a")) - 1)
    )
    facts = tracked_persist(
        facts.join(F.broadcast(attr_ids), "a").withColumn(
            "zkey", zorder_key(F.col("aid"), F.col("e"))
        )
    )
    n = facts.count()
    attrs = [r["a"] for r in attr_ids.collect()]
    # 50 deterministic entity probes spread across the id space
    ents = [
        r["e"]
        for r in facts.select("e").distinct()
        .orderBy(F.md5(F.col("e").cast("string"))).limit(50).collect()
    ]
    layouts = [
        ("avet(a,e,tx)", ["a", "e", "tx"]),
        ("eavt(e,a,tx)", ["e", "a", "tx"]),
        ("taev(tx,a,e)", ["tx", "a", "e"]),
        ("zorder(a,e)", ["zkey", "tx"]),
    ]
    print(f"facts rows: {n}  attrs: {len(attrs)}  blocks: 64\n")
    results = {}
    for pred_col, values, tag in (
        ("a", attrs, "A: attr-equality (all pattern clauses)"),
        ("e", ents, "B: bound-entity equality (pull / bound calls)"),
    ):
        prof = zonemap_eq_prune_profile(
            facts, pred_col, values, layouts, n_blocks=64
        )
        agg = {
            r["layout"]: (float(r["mb"]), float(r["mr"]) / n)
            for r in prof.groupBy("layout").agg(
                F.avg("blocks_scanned").alias("mb"),
                F.avg("rows_scanned").alias("mr"),
            ).collect()
        }
        print(tag)
        print("| layout | mean blocks scanned /64 | mean row frac |")
        print("|---|---|---|")
        for label, _ in layouts:
            mb, mr = agg[label]
            print(f"| {label} | {mb:.1f} | {mr:.4f} |")
            results.setdefault(label, []).append((mb, mr))
        print()
    # headline: the q01-q18 scan mix is ~all attr-equality (workload A);
    # B must not collapse. Winner = best A, reporting B alongside.
    best = min(results, key=lambda l: results[l][0][0])
    print(f"winner on workload A (the pattern-scan mix): {best}")
    print("checkpoint default sort_cols should cluster on:",
          "(a, e, tx)" if best.startswith("avet") else best)
    return 0


if __name__ == "__main__":
    sys.exit(main())
