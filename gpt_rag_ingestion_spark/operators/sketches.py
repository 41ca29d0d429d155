"""Distinct-count sketching (beyond-reference, LLM-pipeline family).

The classic cardinality question over a 100 TB corpus — "how many
distinct tokens / shingles / urls per partition of the data?" — is
usually answered with HyperLogLog (`approx_count_distinct`), but HLL
results are implementation-defined and cannot be verified against
another engine.  The KMV (k-minimum-values) estimator (Bar-Yossef et
al. 2002; Beyer et al., "On synopses for distinct-value estimation
under multiset operations", SIGMOD 2007) is different: its synopsis is
the k smallest hash values of the set — a deterministic function of the
input given a fixed hash — so estimates reproduce bit-identically in
any engine with the same hash (md5 here).

Estimator: with U_(k) = the k-th smallest of n distinct uniform hashes
scaled to (0, 1], E[n] ≈ (k-1) / U_(k).  All arithmetic below stays in
exact integers: the 32-bit hash h and estimate
``(k-1) * 2^32 div (h_k + 1)``.

Scale: the sketch aggregation is algebraic — per-partition k-mins merge
into global k-mins (the union of two KMV synopses truncated to k is the
synopsis of the union set) — so Spark runs it as one shuffle of
(group, hash) pairs; at extreme cardinality, pre-aggregate per-partition
k-mins with a partial window before the exchange (same result by the
merge property).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Output: (group_col, kth_hash, est_distinct, exact_distinct) — the
    exact count rides along for calibration/testing; a production sketch
    drops it (it is the expensive part, not the synopsis).
    """
    h32 = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    hashes = df.select(F.col(group_col), h32.alias("h")).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    ranked = hashes.withColumn("rn", F.row_number().over(w))
    per_group = ranked.groupBy(group_col).agg(
        F.max(F.when(F.col("rn") <= k, F.col("h"))).alias("kth_hash"),
        F.count(F.lit(1)).alias("exact_distinct"),
    )
    est = F.when(
        F.col("exact_distinct") <= k, F.col("exact_distinct")
    ).otherwise(F.expr(f"({k} - 1) * 4294967296 div (kth_hash + 1)"))
    return per_group.select(
        group_col,
        F.col("kth_hash"),
        est.cast("long").alias("est_distinct"),
        F.col("exact_distinct"),
    )
