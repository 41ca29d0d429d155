"""Per-query profiling for the bench headline set (guide §1):

For each headline query at $SPARK_GRAFT_SF_DIR (default sf0.1):
  - build_sec: DataFrame construction time (driver-side plan building)
  - first_sec: first noop materialization (includes codegen/planning)
  - best_sec:  best of N repeats (the bench's measurement)
  - n_jobs/n_stages/n_tasks: scheduler work per materialization
  - exchanges/pyevals/bhj/smj: plan-shape counters from the executed plan

Usage: python3 scripts/profile_bench.py [query1,query2,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    status = sc.statusTracker()

    qs = entry_mod.queries()
    headline = [
        "q01_pricing_summary", "q05_regional_revenue", "q10_chunk_fixed",
        "q11_window_numbering", "q13_log_retention", "q15_exact_dedup",
        "q16_ngram_jaccard", "q17_simhash", "q18_minhash_lsh",
        "q19_knn_top1", "q20_ann_lsh", "q21_quality_scores",
        "q24_tumbling_window", "q31_media_features", "q35_sessionize",
        "q36_polygon_area", "q38_cost_rollup", "q43_windowed_counts",
        "q46_embedding_neardup", "q47_ivf_ann", "q50_doc_analysis_pages",
        "q52_multimodal_chunks",
    ]
    if only:
        headline = [h for h in headline if h in only]

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    # warm
    materialize(spark.range(1_000_000).selectExpr("sum(id) as s"))
    materialize(entry_mod._t(spark, sf_dir, "lineitem").limit(1000))

    results = {}
    for name in headline:
        sc.setJobDescription(f"profile:{name}")
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        build_sec = time.time() - t0

        jobs_before = len(status.getJobIdsForGroup(None) or [])
        t0 = time.time()
        materialize(df)
        first_sec = time.time() - t0

        best = None
        for _ in range(3):
            t0 = time.time()
            materialize(qs[name](spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)

        # count jobs/stages for ONE materialization
        jb = sc._jsc.sc().statusTracker().getJobIdsForGroup(None)
        n_before = len(jb)
        t0 = time.time()
        materialize(qs[name](spark, sf_dir))
        one_sec = time.time() - t0
        ja = sc._jsc.sc().statusTracker().getJobIdsForGroup(None)
        n_jobs = len(ja) - n_before

        plan = df._jdf.queryExecution().executedPlan().toString()
        counters = {
            "exchanges": plan.count("Exchange"),
            "bcast": plan.count("BroadcastExchange"),
            "pyeval": plan.count("EvalPython") + plan.count("MapInPandas")
            + plan.count("FlatMapCoGroupsInPandas") + plan.count("FlatMapGroupsInPandas"),
            "smj": plan.count("SortMergeJoin"),
            "bhj": plan.count("BroadcastHashJoin"),
            "shj": plan.count("ShuffledHashJoin"),
        }
        results[name] = {
            "build_sec": round(build_sec, 3),
            "first_sec": round(first_sec, 3),
            "best_sec": round(best, 3),
            "one_sec": round(one_sec, 3),
            "n_jobs": n_jobs,
            **counters,
        }
        print(json.dumps({name: results[name]}), flush=True)

    print("TOTAL best:", round(sum(r["best_sec"] for r in results.values()), 3))
    spark.stop()


if __name__ == "__main__":
    main()
