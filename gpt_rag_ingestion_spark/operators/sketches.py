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


def count_min_frequencies(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    depth: int = 4,
    width: int = 256,
    top_k: int = 20,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) built
    relationally, evaluated against exact counts for the ``top_k``
    most frequent tokens.

    Construction: each token occurrence votes into ``depth``
    counters — bucket_j = int32(md5("cm{j}:" || token)) % width — so
    the whole sketch is ONE groupBy over (row, bucket): depth*width
    cells regardless of corpus size.  The estimate for a token is the
    min over its ``depth`` cells; CMS guarantees estimate >= truth,
    with overshoot bounded by collisions (e*N/width w.p. 1-1/e^depth).

    md5-derived buckets keep the construction engine-portable (exact
    same sketch in any engine with md5 — oracle-checkable), unlike
    seeded-random hash families.

    100 TB: the counter table is depth x width cells — broadcast
    scale — built with one shuffle of (j, bucket) pairs; heavy-hitter
    estimation then needs only the distinct-token stream against the
    broadcast counters.  This is the mergeable-summary pattern: shards
    build local sketches, cell-wise addition merges them."""
    from gpt_rag_ingestion_spark.operators.dedup import tokenize

    toks = tokenize(df, text_col, id_col).select("token")

    def bucket(j: int):
        h = F.md5(F.concat(F.lit(f"cm{j}:"), F.col("token")))
        return (
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width
        ).alias("bucket")

    votes = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), bucket(j))
                    for j in range(depth)
                ]
            )
        ).alias("jb")
    ).select("jb.j", "jb.bucket")
    counters = votes.groupBy("j", "bucket").agg(
        F.count(F.lit(1)).alias("cell")
    )

    true_counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("true_count"))
    probes = true_counts.select(
        "token",
        "true_count",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), bucket(j))
                    for j in range(depth)
                ]
            )
        ).alias("jb"),
    ).select("token", "true_count", "jb.j", "jb.bucket")
    est = (
        probes.join(F.broadcast(counters), on=["j", "bucket"])
        .groupBy("token", "true_count")
        .agg(F.min("cell").alias("cms_count"))
    )
    # Global top-k over the whole vocabulary: TakeOrdered per-partition
    # heaps, never an unpartitioned window over every distinct token.
    from gpt_rag_ingestion_spark.operators.ranking import global_top_k

    ranked = global_top_k(
        est, [F.desc("true_count"), F.asc("token")], top_k, rank_col="rank"
    )
    return ranked.select("rank", "token", "true_count", "cms_count")
