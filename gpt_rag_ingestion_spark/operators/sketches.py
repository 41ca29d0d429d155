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


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.95),
    bins: int = 128,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Mergeable histogram quantile sketch: values bucket into
    ``bins`` equal-width bins over [lo, hi] (clamped), one groupBy
    builds per-group bin counts, and the q-quantile estimate is the
    LOWER EDGE of the first bin whose cumulative count reaches
    ceil(q * n).  Error is bounded by one bin width; the bin-count
    table is the mergeable state (cell-wise addition — same
    shard-then-reduce deployment as KMV/count-min), and everything is
    integer arithmetic on a fixed grid, so estimates reproduce exactly
    in any engine (unlike t-digest/GK, whose states are
    implementation-defined).

    Output: one row per (group, quantile): (group, q_permille,
    est_value, n)."""
    span = float(hi) - float(lo)
    if span <= 0:
        raise ValueError("hi must exceed lo")
    v = F.col(value_col).cast("double")
    bin_expr = F.least(
        F.lit(bins - 1),
        F.greatest(
            F.lit(0),
            F.floor((v - F.lit(float(lo))) / F.lit(span) * bins).cast("int"),
        ),
    )
    counts = (
        df.select(F.col(group_col), bin_expr.alias("bin"))
        .groupBy(group_col, "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    cum = counts.withColumn("cum", F.sum("c").over(w_cum)).withColumn(
        "n", F.sum("c").over(w_all)
    )
    outs = []
    for q in quantiles:
        pm = int(round(q * 1000))
        # rank = ceil(q*n) in exact integer arithmetic: (n*pm + 999) div 1000
        rank = F.expr(f"(n * {pm} + 999) div 1000")
        hit = (
            cum.filter(F.col("cum") >= rank)
            .groupBy(group_col)
            .agg(F.min("bin").alias("bin"), F.max("n").alias("n"))
        )
        outs.append(
            hit.select(
                F.col(group_col),
                F.lit(pm).alias("q_permille"),
                (F.lit(float(lo)) + F.col("bin") * F.lit(span) / bins).alias(
                    "est_value"
                ),
                F.col("n"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def kmv_set_algebra(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """KMV sketch SET ALGEBRA (Beyer et al. 2007): estimate
    |A ∪ B| and |A ∩ B| for every pair of groups from k-minimum-value
    synopses alone — the sets themselves are never compared.

    Per pair: merge the two synopses, keep the k smallest hashes K∪;
    est_union from the kth hash (the plain KMV estimator on the merged
    synopsis — KMV's defining mergeability), and est_intersection =
    ρ·est_union where ρ = |{h ∈ K∪ present in BOTH synopses}| / k
    (integer arithmetic).  Exact counts ride along for calibration,
    as in ``kmv_distinct``; production drops them.

    Scale: after the one distinct pass over (group, value), everything
    runs on the synopsis relation — k rows per group — so comparing
    every pair of 10k sources costs pairs × k tiny rows, not a
    corpus-sized set join.  All hashes are md5-derived: the same
    estimates in any engine (oracle-checked)."""
    h32 = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    hashes = df.select(F.col(group_col).alias("g"), h32.alias("h")).distinct()
    w = Window.partitionBy("g").orderBy("h")
    syn = (
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("g", "h")
    )
    groups = syn.select("g").distinct()
    pairs = (
        groups.select(F.col("g").alias("g_a"))
        .crossJoin(groups.select(F.col("g").alias("g_b")))
        .filter(F.col("g_a") < F.col("g_b"))
    )
    # per-pair merged synopsis with membership flags
    ph = (
        pairs.join(
            syn, (F.col("g") == F.col("g_a")) | (F.col("g") == F.col("g_b"))
        )
        .groupBy("g_a", "g_b", "h")
        .agg(
            F.max((F.col("g") == F.col("g_a")).cast("int")).alias("in_a"),
            F.max((F.col("g") == F.col("g_b")).cast("int")).alias("in_b"),
        )
    )
    wp = Window.partitionBy("g_a", "g_b").orderBy("h")
    wc = Window.partitionBy("g_a", "g_b")
    ranked = ph.withColumn("rn", F.row_number().over(wp)).withColumn(
        "n_all", F.count(F.lit(1)).over(wc)
    )
    stats = ranked.groupBy("g_a", "g_b").agg(
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("kth"),
        F.max("n_all").alias("n_all"),
        F.sum(
            F.when(
                (F.col("rn") <= k) & (F.col("in_a") == 1) & (F.col("in_b") == 1),
                1,
            ).otherwise(0)
        ).alias("rho_num"),
    )
    est_union = F.when(F.col("n_all") <= k, F.col("n_all")).otherwise(
        F.expr(f"({k} - 1) * 4294967296 div (kth + 1)")
    )
    with_u = stats.select(
        F.col("g_a").alias(f"{group_col}_a"),
        F.col("g_b").alias(f"{group_col}_b"),
        est_union.cast("long").alias("est_union"),
        "rho_num",
        "n_all",
    )
    # ρ is the match share of K∪, whose size is min(k, n_all) — dividing
    # by k when the merged synopsis is not full would underestimate
    return with_u.select(
        f"{group_col}_a",
        f"{group_col}_b",
        "est_union",
        F.expr(
            f"(rho_num * est_union) div least(cast(n_all as bigint), {k})"
        ).alias("est_intersection"),
    )


def cms_join_size(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Join-cardinality estimation from count-min sketches: |A ⋈ B| =
    Σ_v fA(v)·fB(v), estimated as min over rows j of the sketch
    inner product Σ_b cellA[j,b]·cellB[j,b] (AMS/CMS inner-product
    estimator, upper-bounds the truth like point CMS estimates).

    This is the statistic a cost-based planner wants BEFORE running a
    join (broadcast vs shuffle vs skew handling) — computed from two
    depth×width synopses built in one aggregation pass per side, so
    the decision costs sketch-size work regardless of table size.
    Exact count rides along for calibration; md5 buckets make the
    estimate oracle-checkable.  Output: one row
    (est_rows, exact_rows)."""
    def counters(df: DataFrame, key: str, name: str) -> DataFrame:
        k = F.col(key).cast("string")
        votes = df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            (
                                F.conv(
                                    F.substring(
                                        F.md5(F.concat(F.lit(f"cm{j}:"), k)),
                                        1, 8,
                                    ),
                                    16, 10,
                                ).cast("long")
                                % width
                            ).alias("bucket"),
                        )
                        for j in range(depth)
                    ]
                )
            ).alias("jb")
        ).select("jb.j", "jb.bucket")
        return votes.groupBy("j", "bucket").agg(
            F.count(F.lit(1)).alias(name)
        )
    ca = counters(left, left_key, "ca")
    cb = counters(right, right_key, "cb")
    per_j = (
        ca.join(cb, on=["j", "bucket"])
        .groupBy("j")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("ip"))
    )
    est = per_j.agg(F.min("ip").alias("est_rows"))
    exact = (
        left.select(F.col(left_key).alias("_k"))
        .join(right.select(F.col(right_key).alias("_k")), "_k")
        .agg(F.count(F.lit(1)).alias("exact_rows"))
    )
    return est.crossJoin(exact)
