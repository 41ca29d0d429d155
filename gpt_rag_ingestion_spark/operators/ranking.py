"""Distributed global ranking — the scale-safe replacements for
``Window.orderBy(...)`` with no partition spec.

An unpartitioned window moves the ENTIRE input through one task
(Spark even warns: "No Partition Defined for Window operation").
That is fine on 20 rows and fatal on 20 billion.  Two patterns cover
every global-ranking need of the engine:

* ``global_top_k`` — when only the best k rows are wanted.  Spark
  compiles ``orderBy(...).limit(k)`` to ``TakeOrderedAndProject``:
  each partition keeps its local top-k, the driver merges k-sized
  heaps — no global sort, no single-partition shuffle.  Ranking the
  k survivors is then a window over at most k rows.

* ``distributed_row_number`` — when every row needs its global rank.
  Classic three-step: range-repartition on the sort key (partitions
  are globally ordered), rank inside each partition with an ordinary
  partitioned window, then add each partition's start offset
  (exclusive prefix sum of per-partition counts — at most one tiny
  driver-side list of #partitions numbers, the ONLY driver data).

Both produce exactly the rank a global ``row_number`` would assign
whenever ``order`` is a total order (pass a unique tiebreaker).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_top_k(
    df: DataFrame,
    order: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-``k`` rows by ``order`` with a 1-based ``rank_col``.

    ``orderBy + limit`` → TakeOrderedAndProject (per-partition heaps,
    never a full sort); the ranking window then sees <= k rows.  The
    constant partition spec keeps the window a normal hash-partitioned
    exchange instead of the warn-worthy empty spec.
    """
    top = df.orderBy(*order).limit(k)
    w = Window.partitionBy(F.lit(1)).orderBy(*order)
    return top.withColumn(rank_col, F.row_number().over(w).cast("int"))


def distributed_row_number(
    df: DataFrame,
    order: Sequence[Column],
    rank_col: str = "rn",
    num_partitions: int | None = None,
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Global 1-based ``row_number`` over ``order`` without an
    unpartitioned window.

    Range-repartitions on the sort key so partition i holds rows that
    all sort before partition i+1, ranks locally, then shifts each
    partition by the total count of earlier partitions.  The offset
    table is #partitions entries — broadcast-joined, never a literal
    in the plan.

    ``bucket_expr`` (monotonically non-decreasing along ``order``) is
    the single-exchange fast path — see ``distributed_running_sum``.
    """
    if bucket_expr is not None:
        with_pid = df.withColumn("__pid", bucket_expr)
    else:
        parted = (
            df.repartitionByRange(num_partitions, *order)
            if num_partitions
            else df.repartitionByRange(*order)
        )
        with_pid = parted.withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid").orderBy(*order)
    local = with_pid.withColumn("__local_rn", F.row_number().over(w))

    counts = sorted(
        (r["__pid"], r["n"])
        for r in local.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, running = [], 0
    for pid, n in counts:
        offsets.append((pid, running))
        running += n
    spark = df.sparkSession
    # explicit schema: empty inputs yield an empty offset list, which
    # createDataFrame cannot infer a schema from
    off_df = spark.createDataFrame(offsets, "__pid int, __offset long")
    return (
        local.join(F.broadcast(off_df), "__pid")
        .withColumn(rank_col, (F.col("__local_rn") + F.col("__offset")).cast("long"))
        .drop("__pid", "__local_rn", "__offset")
    )


def grouped_row_number(
    df: DataFrame,
    group_cols: Sequence[str],
    order: Sequence[Column],
    rank_col: str = "rn",
    n_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group 1-based ``row_number`` (and optional per-group total
    ``n_col``) WITHOUT ``Window.partitionBy(group)`` — the scale-safe
    form when the group key is LOW-CARDINALITY (e.g. 5 event types
    over a 100 TB fact table): a plain partitioned window would sort
    ~1/|groups| of the table inside ONE task.

    The ``distributed_row_number`` recipe, grouped: range-repartition
    on (group, order) so each group's rows land in globally ordered
    partition runs, rank inside (group, partition) with an ordinary
    window, then shift by the per-(group, partition) exclusive prefix
    of counts.  The offset table is |groups| x |partitions| rows —
    computed with a window over THAT tiny relation and broadcast back,
    so no task ever sorts more than one range partition and nothing
    beyond the offset table leaves the executors.

    ``order`` must be a total order within each group (pass a unique
    tiebreaker) for ranks to be deterministic."""
    keys = [F.col(c) for c in group_cols]
    parted = (
        df.repartitionByRange(num_partitions, *keys, *order)
        if num_partitions
        else df.repartitionByRange(*keys, *order)
    )
    with_pid = parted.withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy(*group_cols, "__pid").orderBy(*order)
    local = with_pid.withColumn("__local_rn", F.row_number().over(w))

    counts = local.groupBy(*group_cols, "__pid").agg(
        F.count(F.lit(1)).alias("__grp_part_cnt")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.withColumn(
        "__offset",
        F.coalesce(F.sum("__grp_part_cnt").over(w_off), F.lit(0)),
    )
    if n_col is not None:
        w_tot = Window.partitionBy(*group_cols)
        offs = offs.withColumn(
            n_col, F.sum("__grp_part_cnt").over(w_tot).cast("long")
        )
    offs = offs.drop("__grp_part_cnt")
    # NULL is a legitimate group value: join with null-safe equality
    # (a name-list equi-join silently drops NULL-keyed groups)
    offs_r = offs.select(
        F.col("__pid").alias("__o_pid"),
        *[F.col(c).alias(f"__o_{i}") for i, c in enumerate(group_cols)],
        "__offset",
        *([n_col] if n_col is not None else []),
    )
    cond = F.col("__pid") == F.col("__o_pid")
    for i, c in enumerate(group_cols):
        cond = cond & F.col(c).eqNullSafe(F.col(f"__o_{i}"))
    out = (
        local.join(F.broadcast(offs_r), cond)
        .withColumn(
            rank_col,
            (F.col("__local_rn") + F.col("__offset")).cast("long"),
        )
        .drop(
            "__pid", "__o_pid", "__local_rn", "__offset",
            *[f"__o_{i}" for i in range(len(group_cols))],
        )
    )
    return out


def exact_ntile(rank_col: str, n_col: str, buckets: int) -> Column:
    """The SQL-standard ``ntile(buckets)`` as pure integer arithmetic
    over a precomputed (rank, group size) pair: the first ``n % b``
    buckets hold ``n div b + 1`` rows, the rest ``n div b`` — so a
    distributed rank (``grouped_row_number`` / ``distributed_row_
    number``) replaces the ntile window outright.  ``greatest(q, 1)``
    guards the n < buckets case, where every row is alone in its
    bucket and only the first branch can fire."""
    b = int(buckets)
    q = f"({n_col} div {b})"
    r = f"({n_col} % {b})"
    boundary = f"({r} * ({q} + 1))"
    return F.expr(
        f"CASE WHEN {rank_col} <= {boundary} "
        f"THEN ({rank_col} + {q}) div ({q} + 1) "
        f"ELSE {r} + ({rank_col} - {boundary} + greatest({q}, 1) - 1) "
        f"div greatest({q}, 1) END"
    )


def per_key_capped_rank(
    rows: DataFrame,
    key_col: str,
    id_col: str,
    cap: int,
    prior_counts: DataFrame | None = None,
    rank_col: str = "_rank",
    buckets_hex_chars: int = 2,
) -> DataFrame:
    """Deterministic per-key sampling rank for CAP enforcement, skew-
    immune: (id, rank) where rank is exactly
    ``row_number() over (partition by key order by md5(id), id)`` —
    but computed without a raw per-key window, which serializes a
    dominant key's entire row set through one task at web scale.

    Two phases:
    1. count rows per key (map-side-combined aggregate; a hot key
       costs one row per task) and SKIP keys that cannot exceed
       ``cap`` — their rows are simply ABSENT from the output (their
       rank is <= cap by construction; treat a missing rank as
       under-cap).
    2. for over-cap keys only, rank decomposed by an order-aligned
       md5-prefix bucket (16^``buckets_hex_chars``-way): each window
       task holds at most 1/256 of a hot key; per-bucket offsets (a
       broadcast-sized table: over-cap keys x 256) recompose the exact
       global per-key rank.

    ``prior_counts`` — (key_col, n_ranked) — offsets ranks by earlier
    batches' ranked-row counts, making the cap cumulative across a
    stream (see plans/web_corpus_job + streaming/micro_batch)."""
    counts = rows.groupBy(key_col).agg(F.count(F.lit(1)).alias("_n"))
    if prior_counts is not None:
        prior = prior_counts.select(
            key_col, F.col("n_ranked").alias("_prior")
        ).join(F.broadcast(counts.select(key_col)), key_col, "left_semi")
        counts = counts.join(prior, key_col, "left").withColumn(
            "_prior", F.coalesce(F.col("_prior"), F.lit(0))
        )
    else:
        counts = counts.withColumn("_prior", F.lit(0).cast("long"))
    over = counts.filter(F.col("_n") + F.col("_prior") > cap).select(
        key_col, "_prior"
    )
    local = (
        rows.join(F.broadcast(over), key_col)
        .withColumn("_key", F.md5(F.col(id_col).cast("string")))
        .withColumn("_bkt", F.substring("_key", 1, buckets_hex_chars))
    )
    w_local = Window.partitionBy(key_col, "_bkt").orderBy("_key", id_col)
    local = local.withColumn("_lrn", F.row_number().over(w_local))
    bcounts = local.groupBy(key_col, "_bkt").agg(
        F.count(F.lit(1)).alias("_bn")
    )
    w_off = (
        Window.partitionBy(key_col)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = bcounts.withColumn(
        "_off", F.coalesce(F.sum("_bn").over(w_off), F.lit(0))
    ).select(key_col, "_bkt", "_off")
    return (
        local.join(F.broadcast(offs), [key_col, "_bkt"])
        .withColumn(
            rank_col, F.col("_lrn") + F.col("_off") + F.col("_prior")
        )
        .select(id_col, rank_col)
    )


def distributed_running_sum(
    df: DataFrame,
    order: Sequence[Column],
    value_col: str,
    sum_col: str = "running_sum",
    num_partitions: int | None = None,
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Global inclusive running sum of ``value_col`` over ``order`` —
    the range-partition + local-prefix + offset shape of
    ``distributed_row_number``, with the offset being the TOTAL of all
    earlier partitions instead of their row count.  Driver data: one
    (partition, total) pair per partition.

    ``bucket_expr`` is the single-exchange fast path: a column
    expression that is monotonically NON-DECREASING along ``order``
    (e.g. ``F.col("doc_id") // 65536`` for an ascending id order, or a
    negated time bucket for a descending one).  The window then
    partitions directly on the bucket — one hash exchange — instead of
    range-repartitioning first and paying the window's re-exchange on
    partition id (range partitioning does not satisfy a window's
    required hash distribution, so the generic path shuffles twice).
    Project the input to (order, value) before calling — wide columns
    should never ride a prefix sum."""
    if bucket_expr is not None:
        b = df.withColumn("__bucket", bucket_expr)
        w = (
            Window.partitionBy("__bucket")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        local = b.withColumn("__local_sum", F.sum(value_col).over(w))
        totals = sorted(
            (r["__bucket"], r["t"])
            for r in b.groupBy("__bucket")
            .agg(F.sum(value_col).alias("t"))
            .collect()
        )
        key_col = "__bucket"
    else:
        parted = (
            df.repartitionByRange(num_partitions, *order)
            if num_partitions
            else df.repartitionByRange(*order)
        )
        with_pid = parted.withColumn("__bucket", F.spark_partition_id())
        w = (
            Window.partitionBy("__bucket")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        local = with_pid.withColumn("__local_sum", F.sum(value_col).over(w))
        totals = sorted(
            (r["__bucket"], r["t"])
            for r in with_pid.groupBy("__bucket")
            .agg(F.sum(value_col).alias("t"))
            .collect()
        )
        key_col = "__bucket"

    offsets, running = [], 0
    for key, t in totals:
        offsets.append((key, running))
        running += t or 0
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(int(k), int(o)) for k, o in offsets],
        f"{key_col} long, __offset long",
    )
    return (
        local.join(F.broadcast(off_df), key_col)
        .withColumn(sum_col, (F.col("__local_sum") + F.col("__offset")).cast("long"))
        .drop(key_col, "__local_sum", "__offset")
    )


def retrieval_metrics(
    hits: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc",
    rank_col: str = "rank",
    scale: int = 1_000_000,
) -> DataFrame:
    """Offline retrieval-quality evaluation — the metrics loop every
    search deployment runs against its own index (the reference's AI
    Search relevance tuning, done as a relation): per query,

        n_rel      |relevant docs|            (from ``qrels``)
        hits_at_k  |relevant ∩ top-k|
        recall_q   hits_at_k * scale // n_rel
        rr_q       scale // rank of the FIRST relevant hit (0 if none)
                   — mean over queries = MRR * scale
        dcg_q      Σ w[rank] over relevant hits, with the binary-gain
                   DCG weight w[i] = round(scale / log2(i+1))
                   precomputed driver-side as INTEGER literals
        idcg_q     Σ w[1..min(n_rel, k)]  (ideal ordering)
        ndcg_q     dcg_q * scale // idcg_q

    Everything is integer arithmetic over driver-side-constant weight
    tables (k entries), so results are exactly reproducible in any
    engine — the oracle replicates the same VALUES.  Queries with no
    relevant documents are excluded (nDCG undefined).

    Scale shape: ``hits`` is O(queries * k) and ``qrels`` is the
    relevance set; the joins are keyed by (query, doc) and every
    aggregate is per-query — nothing touches the corpus.  Macro
    averages are one further tiny aggregate over the output.
    """
    import math

    w = [round(scale / math.log2(i + 1)) for i in range(1, k + 1)]
    cum = [sum(w[: i + 1]) for i in range(k)]
    w_arr = F.array(*[F.lit(x) for x in w])
    cum_arr = F.array(*[F.lit(x) for x in cum])

    topk = hits.filter(F.col(rank_col) <= k).select(
        query_col, doc_col, rank_col
    )
    rel = qrels.select(query_col, doc_col).distinct()
    rel_hits = topk.join(rel, on=[query_col, doc_col], how="inner")
    agg = rel_hits.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("hits_at_k"),
        F.min(rank_col).alias("_first"),
        F.sum(F.element_at(w_arr, F.col(rank_col).cast("int"))).alias(
            "_dcg"
        ),
    )
    nrel = rel.groupBy(query_col).agg(F.count(F.lit(1)).alias("n_rel"))
    out = nrel.join(agg, on=query_col, how="left")
    idcg = F.element_at(
        cum_arr, F.least(F.col("n_rel"), F.lit(k)).cast("int")
    )
    s = int(scale)
    return out.withColumn("_idcg", idcg).select(
        F.col(query_col),
        F.col("n_rel").cast("long").alias("n_rel"),
        F.coalesce(F.col("hits_at_k"), F.lit(0)).cast("long").alias(
            "hits_at_k"
        ),
        F.when(F.col("_first").isNull(), F.lit(0).cast("long"))
        .otherwise(F.expr(f"CAST({s} AS BIGINT) div _first"))
        .alias("rr_q"),
        F.expr(
            f"CAST(coalesce(hits_at_k, 0) AS BIGINT) * {s} div n_rel"
        ).alias("recall_q"),
        F.coalesce(F.col("_dcg"), F.lit(0)).cast("long").alias("dcg_q"),
        F.col("_idcg").cast("long").alias("idcg_q"),
        F.expr(
            f"CAST(coalesce(_dcg, 0) AS BIGINT) * {s} div _idcg"
        ).alias("ndcg_q"),
    )
