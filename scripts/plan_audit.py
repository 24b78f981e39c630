"""Automated physical-plan audit over every __spark_entry__.queries()
entry: flags the scale anti-patterns a human reviewer greps for —
cartesian products, nested-loop joins outside the deliberate
bounded-broadcast allowlist, row-at-a-time Python UDFs — and reports
exchange (shuffle) counts per query.

Usage:  python scripts/plan_audit.py [sf_dir] [query ...]
Exit code 1 if any query has an unexplained smell.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

# Deliberate bounded-broadcast cross joins (ANN centroid/query assignment:
# one side is a broadcast of <= n_centroids/n_queries rows by construction)
BNLJ_ALLOWED = {
    "q26_embedding_neardup",
    "q27_cosine_topk",
    "q28_ivf_topk",
    # r146/r148: compose q28's coarse-assignment/probe cross joins — the
    # broadcast side is the <= auto_k(n) centroid set, bounded by the
    # auto_k `hi` clamp by construction
    "r146_ivf_pq_topk",
    "r148_ivf_pq_refine",
    "q72_kmeans",
    # q61: the corpus doc-count N joins in as a broadcast ONE-ROW cross
    # join (never a driver collect) — bounded by construction
    "q61_tfidf_top_terms",
    # q71: each report row is a (1-row violations) x (1-row total) cross
    # join — bounded by construction
    "q71_dq_report",
    # q49: per-source weights (n_sources rows) x the 1-row weight total —
    # bounded by construction, never a driver collect
    "q49_corpus_mix",
    # q92: the exact recount joins the 1-row corpus total for the
    # integer-rational threshold compare — bounded by construction
    "q92_heavy_hitters",
    # q94: N and avgdl ride one broadcast 1-row cross join (the same
    # corpus-constant shape as q61's tfidf) — bounded by construction
    "q94_bm25_search",
    # q90: composes q27's brute-force side — the 8-row query set rides
    # the same bounded broadcast cross join as q27/q28 (centroid/query
    # assignment), bounded by construction
    "q90_ann_recall",
    # r141: each layout's 64-row zone-map rollup cross-joins the
    # broadcast 6-row probe-value list (n_blocks x n_values, both
    # constants) — bounded by construction, never scales with data
    "r141_layout_eq_advisor",
    # r03: the group-pair frame is a broadcast self-join of the
    # DISTINCT group list (n_event_types rows) under a < predicate —
    # bounded by construction
    "r03_kmv_overlap",
    # r05: the total row count N joins in as a broadcast ONE-ROW cross
    # join (same corpus-constant shape as q61/q94) — bounded by
    # construction
    "r05_curriculum_profile",
    # r17: the corpus token total joins in as a broadcast ONE-ROW cross
    # join (same corpus-constant shape as q61/q94) — bounded by
    # construction
    "r17_source_divergence",
    # r21: the report is a (1-row left stats) x (1-row right stats)
    # cross join — bounded by construction, same shape as q71
    "r21_join_skew_report",
    # r25: the day spine is (exploded 1-row min/max bounds) x (distinct
    # event types) — a calendar x dimension cross join, bounded by
    # construction and never touching raw rows
    "r25_rate_anomaly",
    # r35: the corpus total and the marginal-entropy scalars ride 1-row
    # broadcast cross joins over the contingency-table-sized relations
    # (same corpus-constant shape as q61/q94/r17) — bounded by
    # construction
    "r35_mutual_information",
    # r41: each vintage's token total rides a broadcast ONE-ROW cross
    # join onto its vocab-sized count relation (q61/r17 shape) —
    # bounded by construction
    "r41_token_drift",
    # r45: the digit-count total rides a broadcast ONE-ROW cross join
    # onto the 9-row digit relation — bounded by construction
    "r45_benford_report",
    # r54: the contingency total (1 row) rides a broadcast cross join
    # onto the contingency-table-sized cell relation — bounded by
    # construction (q61/r17 corpus-constant shape)
    "r54_chi_square",
    # r56: the global min/max bounds and the half totals are 1-row
    # broadcast cross joins (bounds onto raw rows is a pure-Column
    # probe, totals onto the n_bins relation) — bounded by construction
    "r56_psi_drift",
    # r57/r58: the (n, S) series scalars ride 1-row broadcast cross
    # joins onto the calendar-sized day spine — bounded by construction
    "r57_daily_acf",
    "r58_cusum_shift",
    # r60/r61: the next-token vocabulary size / corpus token total ride
    # broadcast ONE-ROW cross joins (q61/r17 corpus-constant shape) —
    # bounded by construction
    "r60_doc_perplexity",
    "r61_distinctive_terms",
    # r64: the global min/max bounds (1 row) broadcast onto raw rows as
    # a pure-Column bin probe, and the cell total (1 row) onto the
    # n_x*n_y cell relation — bounded by construction (r56 shape)
    "r64_hist2d",
    # r66: the corpus (n, S) total rides a broadcast ONE-ROW cross join
    # onto the group-sized relation — bounded by construction
    "r66_theil_decomposition",
    # r68: the x_(k+1) boundary (1 row) broadcast onto the k+1-row
    # top relation — bounded by construction
    "r68_hill_tail",
    # r69: the n_bins spine (12 rows) broadcast onto the distinct-days
    # relation — calendar x bins, bounded by construction (r18/r25
    # spine shape)
    "r69_stream_psi",
    # r73: the depth*keys probe relation broadcast onto the
    # distinct-windows relation — calendar x probes, bounded by
    # construction (r69 shape)
    "r73_stream_cms",
    # r76: the user total (1 row) rides a broadcast cross join onto the
    # active-days histogram relation — bounded by construction
    "r76_engagement_curve",
    # r97: the 1-row (total tokens, sqrt-sum) aggregate broadcast onto
    # the sources-sized counts relation — bounded by construction
    # (q71 report shape)
    "r97_temperature_mix",
    # r99: composes r60's doc_perplexity — the next-token vocabulary
    # size rides the same broadcast ONE-ROW cross join (q61/r17
    # corpus-constant shape) — bounded by construction
    "r99_ccnet_buckets",
    # r100: the (n_target, n_raw) feature totals (1 row) ride a
    # broadcast cross join onto the <= n_buckets-row bucket-count
    # relation — bounded by construction (q61/r17 shape)
    "r100_dsir_weights",
    # r105: the report is a (1-row full-data mean) x (1-row CI from the
    # R-sized replicate relation) cross join — bounded by construction
    # (q71 report shape)
    "r105_bootstrap_ci",
    # r107: the day bounds (1 row) broadcast onto raw rows (r56 shape),
    # and the report is pooled x arm0 x arm1 — three 1-row relations —
    # bounded by construction
    "r107_cuped_lift",
    # r108: same shapes as r107 (bounds onto raw rows; pooled x n0 x n1
    # 1-row report) — bounded by construction
    "r108_ab_health",
    # r110: the grand transition total (1 row) rides a broadcast cross
    # join onto the types-sized per-state relation — bounded by
    # construction (q61/r17 shape)
    "r110_transition_entropy",
    # r116: the corpus row count N (1 row) rides a broadcast cross join
    # onto the anchor index before the k-probe explode — bounded by
    # construction (q61/r17 shape)
    "r116_negative_samples",
    # r124: the report is (1-row conditional entropy) x (1-row unigram
    # entropy) — bounded by construction (q71 report shape)
    "r124_entropy_rate",
    # r125: the corpus doc count N (1 row) rides a broadcast cross join
    # onto the top_n-sized term relation — bounded by construction
    # (q61/r17 shape)
    "r125_term_burstiness",
    # r127: the total-positives row (1 row) rides a broadcast cross
    # join onto the score-cardinality-bounded histogram relation —
    # bounded by construction (q61/r17 shape)
    "r127_threshold_tuning",
    # r129: the corpus totals (1 row) ride a broadcast cross join onto
    # the slice-cardinality-bounded cell relation — bounded by
    # construction (q61/r17 shape)
    "r129_slice_report",
    # r131: the class totals (1 row) ride a broadcast cross join onto
    # the feature-cardinality-bounded histogram relation — bounded by
    # construction (r127 shape)
    "r131_gini_split",
    # r133: composes one r131 pipeline per feature — the per-feature
    # class totals and the base-impurity scalar (1 row each) ride
    # broadcast cross joins onto histogram-/features-sized relations —
    # bounded by construction (r131/q71 shapes)
    "r133_feature_ranking",
    # r78: the reference date and the quantile-edge row (1 row each)
    # ride broadcast cross joins onto orders / the customer relation —
    # bounded by construction (r44 trimmed-mean shape)
    "r78_rfm_segments",
    # r80: the day spine is (exploded 1-row bounds) x (distinct event
    # types) — calendar x dimension, bounded by construction (r25
    # shape)
    "r80_seasonal_anomaly",
    # r81: the 1-row peak and 1-row interval-count relations ride
    # broadcast cross joins onto the boundary relation — bounded by
    # construction (q71 report shape)
    "r81_peak_concurrency",
    # r86: the day spine is (exploded 1-row bounds) x (distinct event
    # types) — calendar x dimension, bounded by construction (r25/r80
    # shape)
    "r86_overdispersion",
    # r89: three 1-row scalar relations (base stats, top-lang count,
    # vocab size) cross-join into the 11-row card — bounded by
    # construction (q71 report shape)
    "r89_corpus_card",
    # r91: the 1-row [min, max] epoch bounds broadcast onto raw rows as
    # a pure-Column split probe — bounded by construction (r56 shape)
    "r91_temporal_split_audit",
}
# Arrow-batched pandas UDFs on the hot path by design (deep seq-pattern
# unifier; cc-cmp sequence sort keys)
ARROW_UDF_ALLOWED = {"q50_seq_rest_pattern"}
# Streaming queries return a memory-sink scan; their real plan ran inside
# the stream — nothing to audit post-hoc
STREAMING = {
    "q33_stream_windowed_metrics",
    "q40_stream_stateful_latest",
    "q54_stream_dedup",
    "q55_stream_sessionize",
    "q42_stream_interval_join",
    "q88_stream_user_stats",
    "r20_stream_windowed_distinct",
    # the TWS twins follow their primaries' rule (q40/q88: the plan of
    # record ran inside the stream; the returned frame is the memory-sink
    # rank fold)
    "r134_stream_latest_tws",
    "r135_user_stats_tws",
    # r65 is NOT skipped: its batch fold (memory-sink counts -> rank
    # window) is auditable, same rule as r69/r73 (ADVICE r7).
}


def audit(name: str, plan: str) -> list[str]:
    smells = []
    if "CartesianProduct" in plan:
        smells.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
        smells.append("BroadcastNestedLoopJoin (not in bounded allowlist)")
    if "BatchEvalPython" in plan:
        smells.append("row-at-a-time Python UDF (BatchEvalPython)")
    if "ArrowEvalPython" in plan and name not in ARROW_UDF_ALLOWED:
        smells.append("pandas UDF outside allowlist (ArrowEvalPython)")
    return smells


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    bad = 0
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        if name in STREAMING:
            print(f"SKIP {name}: streaming (plan ran inside the stream)")
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:200]}")
            bad += 1
            continue
        n_exchange = len(re.findall(r"Exchange hashpartitioning", plan))
        n_bcast = len(re.findall(r"BroadcastExchange", plan))
        smells = audit(name, plan)
        if smells:
            print(f"SMELL {name}: {'; '.join(smells)} "
                  f"[{n_exchange} shuffles, {n_bcast} broadcasts]")
            bad += 1
        else:
            print(f"OK   {name} [{n_exchange} shuffles, {n_bcast} broadcasts]")
    print(f"\n{bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
