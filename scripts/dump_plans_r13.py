"""Dump .explain('formatted') for every bench headline query into
plans/r13/<query>_<suffix>.txt (judge evidence for OPTIMIZATION_r13.md).

Usage: python3 scripts/dump_plans_r13.py before|after [q1,q2,...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "q01_pricing_summary", "q05_regional_revenue", "q10_chunk_fixed",
    "q11_window_numbering", "q13_log_retention", "q15_exact_dedup",
    "q16_ngram_jaccard", "q17_simhash", "q18_minhash_lsh",
    "q19_knn_top1", "q20_ann_lsh", "q21_quality_scores",
    "q24_tumbling_window", "q31_media_features", "q35_sessionize",
    "q36_polygon_area", "q38_cost_rollup", "q43_windowed_counts",
    "q46_embedding_neardup", "q47_ivf_ann", "q50_doc_analysis_pages",
    "q52_multimodal_chunks",
]


def main() -> None:
    suffix = sys.argv[1]
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("dump-plans-r13")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    qs = entry_mod.queries()
    names = [h for h in HEADLINE if only is None or h in only]
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange-ish nodes)")
    spark.stop()


if __name__ == "__main__":
    main()
