"""Round-12 scale evidence for SCALE_SF1.json (`round12` key).

Sections (each a CLI arg; default: all the sf0.1-scale ones):
  buckets   — IVF bucket balance, lowid vs kmeans coarse, at sf0.1 and on
              the clustered skew fixture (VERDICT r11 ask #1's histogram)
  overlap   — trained vs untrained coarse: r146/r149 overlap sums per SF
  dial      — trained-coarse nprobe dial at sf0.1 (vs the untrained flat
              dial recorded in round11_sf1.recall_dials_sf0.1)
  drift     — append-under-distribution-shift recall drift + rebuild
              restoration + the maybe_maintain trigger record (ask #3)
  route     — source_cap_auto route decision on the r152 hot-domain remap
  sf1       — oracle_check-style exactness for r149..r152 at fixtures/sf1
              (needs scripts/gen_scale_data.py output)
  bench_sf1 — ANN ladder timings at sf1: train-once vs prepared search
              (ask #6)

Writes/merges JSON into SCALE_SF1.json under "round12".
Usage: python scripts/round12_evidence.py [section ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = "fixtures/sf1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "SCALE_SF1.json")


def _spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "96g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def _release(spark):
    from unifydb_spark.resources import release_persisted

    release_persisted()
    spark.catalog.clearCache()


def sec_buckets(spark) -> dict:
    from pyspark.sql import functions as F

    from unifydb_spark.operators.similarity import (
        ivf_bucket_stats,
        ivf_coarse_assign,
    )

    out = {}
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    for mode in ("lowid", "kmeans"):
        st = ivf_bucket_stats(ivf_coarse_assign(emb, None, coarse=mode)).collect()[0]
        out[f"sf0.1_{mode}"] = {k: v for k, v in st.asDict().items()}
        _release(spark)
    # the clustered skew fixture (tests/test_scale_proofs.py's shape):
    # low ids all inside one dominant cluster
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, 16)) * 4.0
    sizes = [560, 240, 120, 80]
    rows, vid = [], 0
    for c, n in zip(centers, sizes):
        for _ in range(n):
            rows.append((vid, (c + rng.normal(size=16) * 0.3).tolist()))
            vid += 1
    clustered = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for mode in ("lowid", "kmeans"):
        st = ivf_bucket_stats(
            ivf_coarse_assign(clustered, 4, coarse=mode, coarse_iters=3)
        ).collect()[0]
        out[f"clustered_{mode}"] = {k: v for k, v in st.asDict().items()}
        _release(spark)
    out["note"] = (
        "testdata embeddings are near-uniform so both modes balance; on the "
        "clustered fixture (low ids all in the dominant cluster) training "
        "is what removes the hot bucket"
    )
    return out


def sec_overlap(spark) -> dict:
    from unifydb_spark.operators.similarity import ivf_pq_topk

    out = {}
    for sf in ("0.001", "0.01", "0.1"):
        emb = spark.read.parquet(f"/root/testdata/sf{sf}/embeddings.parquet")
        row = {}
        for mode in ("lowid", "kmeans"):
            res = ivf_pq_topk(emb, coarse=mode).collect()
            row[mode] = int(sum(r["n_overlap"] for r in res))
            _release(spark)
        out[f"sf{sf}"] = {**row, "of": 80}
    return out


def sec_dial(spark) -> dict:
    from unifydb_spark.operators.similarity import ivf_pq_topk

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    dial, cands = {}, {}
    for nprobe in (1, 2, 4, 8):
        res = ivf_pq_topk(emb, nprobe=nprobe, coarse="kmeans").collect()
        dial[str(nprobe)] = int(sum(r["n_overlap"] for r in res))
        cands[str(nprobe)] = int(
            round(sum(r["n_candidates"] for r in res) / len(res))
        )
        _release(spark)
    return {
        "nprobe_dial_trained": dial,
        "candidates_per_query": cands,
        "of": 80,
        "untrained_baseline": "flat (round11_sf1.recall_dials_sf0.1: 56 at "
        "every nprobe with 78/80 in the rank-1 bucket)",
    }


def sec_drift(spark) -> dict:
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from unifydb_spark.operators.similarity import (
        _dot,
        _read_index_meta,
        ivf_pq_index_append,
        ivf_pq_index_maybe_maintain,
        ivf_pq_index_write,
        ivf_pq_search,
    )

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    n = emb.count()
    half = n // 2
    base = emb.filter(F.col("vec_id") < half)
    shifted = emb.filter(F.col("vec_id") >= half).withColumn(
        "embedding",
        F.transform(
            F.col("embedding"),
            lambda x, i: x + F.when(i < 8, F.lit(3.0)).otherwise(F.lit(0.0)),
        ),
    )
    corpus = base.union(shifted)
    queries = shifted.filter(F.col("vec_id") < half + 20)
    v = corpus.select("vec_id", "embedding")
    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
    )
    dots = q.crossJoin(v).select(
        "query_id",
        F.col("vec_id").alias("nid"),
        _dot(F.col("qvec"), F.col("embedding")).alias("s"),
    )
    wt = Window.partitionBy("query_id").orderBy(F.col("s").desc(), "nid")
    exact = {
        (r["query_id"], r["nid"])
        for r in dots.withColumn("rn", F.row_number().over(wt))
        .filter("rn <= 10")
        .collect()
    }

    def overlap(idx):
        res = ivf_pq_search(queries, idx, nprobe=4, topk=10).collect()
        return int(sum(1 for r in res if (r["query_id"], r["neighbor_id"]) in exact))

    path = tempfile.mkdtemp(prefix="r12_drift_")
    idx = ivf_pq_index_write(base, path, coarse="kmeans")
    ivf_pq_index_append(shifted, idx)
    frozen = overlap(idx)
    below = ivf_pq_index_maybe_maintain(corpus, idx, rebuild_threshold=0.6)
    trig = ivf_pq_index_maybe_maintain(corpus, idx, rebuild_threshold=0.5)
    rebuilt = overlap(idx)
    meta = _read_index_meta(path)
    _release(spark)
    return {
        "scenario": f"base {half} vectors; append {n - half} offset-shifted "
        "(+3.0 on 8 dims) against frozen codebooks; 20 appended-slice "
        "queries, overlap@10 vs exact over the union corpus (max 200)",
        "frozen_overlap": frozen,
        "rebuilt_overlap": rebuilt,
        "below_threshold_report": below,
        "trigger_report": trig,
        "meta_after_rebuild": {
            "n_base": meta["n_base"], "n_appended": meta["n_appended"]
        },
    }


def sec_route(spark) -> dict:
    from pyspark.sql import functions as F

    from unifydb_spark.operators.events import hot_key_share

    out = {}
    for sf in ("0.01", "0.1"):
        docs = spark.read.parquet(f"/root/testdata/sf{sf}/documents.parquet")
        remapped = docs.withColumn(
            "source",
            F.when(F.col("doc_id") % 10 < 3, F.lit("hot-domain")).otherwise(
                F.col("source")
            ),
        )
        share = float(hot_key_share(remapped, ["source"], 0.02, 7))
        out[f"sf{sf}"] = {
            "hot_key_share": round(share, 4),
            "threshold": 0.05,
            "route": "salted(n_salts=32)" if share > 0.05 else "plain",
        }
        _release(spark)
    return out


NEW_ENTRIES = [
    "r149_ivf_pq_trained",
    "r150_ivf_pq_search",
    "r151_ann_fn_bind",
    "r152_source_cap_auto",
    "r153_ivf_pq_refine_trained",
    "r154_ivf_pq_sampled_train",
]


def sec_sampled(spark) -> dict:
    """The train-on-a-sample trade (r154) and the trained-refine ladder
    (r153), measured: overlap sums at the three graded SFs."""
    from unifydb_spark.operators.similarity import (
        ivf_pq_refine_topk,
        ivf_pq_topk,
    )

    out = {}
    for sf in ("0.001", "0.01", "0.1"):
        emb = spark.read.parquet(f"/root/testdata/sf{sf}/embeddings.parquet")
        row = {}
        for label, stride in (("full_train", 1), ("stride4_train", 4)):
            res = ivf_pq_topk(
                emb, coarse="kmeans", coarse_sample_stride=stride
            ).collect()
            row[label] = int(sum(r["n_overlap"] for r in res))
            _release(spark)
        res = ivf_pq_refine_topk(emb, coarse="kmeans").collect()
        row["refine_trained"] = int(sum(r["n_overlap"] for r in res))
        _release(spark)
        out[f"sf{sf}"] = {**row, "of": 80}
    return out


def sec_sf1(spark) -> dict:
    # driver-exact replica: reuse oracle_check's compare over fixtures/sf1
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    import subprocess

    prior = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            prior = (
                json.load(f).get("round12", {}).get("sf1", {})
            )
    out = dict(prior)
    env = dict(os.environ, ORACLE_TIMEOUT_S="900")
    for name in [n for n in NEW_ENTRIES if n not in prior]:
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "scripts/oracle_check.py", SF1, name],
            capture_output=True, text=True, env=env,
        )
        line = [l for l in p.stdout.splitlines() if name in l]
        out[name] = {
            "line": line[0] if line else p.stdout.strip()[-200:],
            "sec": round(time.time() - t0, 1),
        }
    return out


def sec_bench_sf1(spark) -> dict:
    import tempfile

    from pyspark.sql import functions as F

    from unifydb_spark.operators.similarity import (
        ivf_pq_index_write,
        ivf_pq_search,
        ivf_pq_topk,
    )

    emb = spark.read.parquet(f"{SF1}/embeddings.parquet")
    out = {"n_vectors": emb.count()}
    t0 = time.time()
    res = ivf_pq_topk(emb, coarse="kmeans").collect()
    out["r149_inline_train_plus_eval_sec"] = round(time.time() - t0, 1)
    out["r149_overlap"] = int(sum(r["n_overlap"] for r in res))
    out["r149_candidate_fraction"] = round(
        sum(r["n_candidates"] for r in res) / (len(res) * res[0]["n_total"]), 4
    )
    _release(spark)
    path = tempfile.mkdtemp(prefix="r12_sf1_idx_")
    t0 = time.time()
    idx = ivf_pq_index_write(emb, path, coarse="kmeans")
    out["index_build_sec"] = round(time.time() - t0, 1)
    _release(spark)
    queries = emb.filter(F.col("vec_id") < 8)
    reps = []
    for _ in range(3):
        t0 = time.time()
        ivf_pq_search(queries, idx, nprobe=4, topk=10).count()
        reps.append(time.time() - t0)
        _release(spark)
    out["prepared_search_sec_median"] = round(sorted(reps)[1], 2)
    out["prepared_search_reps"] = [round(x, 2) for x in reps]
    return out


SECTIONS = {
    "buckets": sec_buckets,
    "overlap": sec_overlap,
    "dial": sec_dial,
    "drift": sec_drift,
    "route": sec_route,
    "sampled": sec_sampled,
    "sf1": sec_sf1,
    "bench_sf1": sec_bench_sf1,
}


def main():
    names = sys.argv[1:] or ["buckets", "overlap", "dial", "drift", "route"]
    spark = _spark()
    blob = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            doc = json.load(f)
    else:
        doc = {}
    doc.setdefault("round12", {})
    for name in names:
        t0 = time.time()
        print(f"== {name} ==", flush=True)
        blob[name] = SECTIONS[name](spark)
        print(json.dumps(blob[name], indent=1, default=str), flush=True)
        print(f"== {name} done in {time.time()-t0:.1f}s ==", flush=True)
        doc["round12"][name] = blob[name]
        with open(OUT, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=False, default=str)
    print("merged into", OUT)


if __name__ == "__main__":
    main()
