"""Deterministic hash sampling — beyond-reference, corpus-construction
family.

Training-data pipelines constantly need reproducible subsets: ablation
corpora, per-source mixture weights, train/validation/test splits that
survive re-runs and incremental ingest.  ``df.sample()`` is none of
those things (seed × partitioning dependent), and window-rank sampling
(q69-style caps) costs a per-stratum sort.

The hash sampler is the scale-correct primitive: a row is kept iff
``uniform(id) < rate`` where ``uniform`` is the first 8 hex digits of
``md5(salt || id)`` scaled to [0, 1).  Properties that matter at
100 TB:

- **shuffle-free** — a pure narrow map over the scan; the decision is a
  function of the row alone, so Catalyst pushes it right next to the
  parquet reader and no exchange exists in the plan;
- **stable under re-partitioning, incremental loads and engine
  changes** — any engine with md5 draws the same subset (this is how
  the oracle checks it bit-for-bit);
- **nested**: rate 0.10 of rate 0.50 equals rate 0.05 of the original
  (hash prefix property), so staged downsampling composes;
- **disjoint splits for free**: non-overlapping hash ranges give
  train/valid/test partitions with no bookkeeping.

Related art: the "hash-mod sharding" of CCNet/RefinedWeb-style corpus
pipelines and A/B bucketing in analytics engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^32 — the hash prefix is 8 hex digits = 32 bits
_SCALE = 4294967296


def hash_bucket(id_col: Column, salt: str = "") -> Column:
    """32-bit uniform bucket for a row id: first 8 hex digits of
    md5(salt || id), as a long in [0, 2^32)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 8),
        16, 10,
    ).cast("long")


def hash_sample(
    df: DataFrame, id_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows by id hash."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1]: {rate}")
    thresh = int(rate * _SCALE)
    return df.filter(hash_bucket(F.col(id_col), salt) < F.lit(thresh))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the mixture-weighting step
    of corpus construction (e.g. keep 80% of wiki, 10% of web).

    ``rates`` is a small literal map compiled into the plan (no join,
    no shuffle); for thousands of strata pass a broadcast-joined rates
    dimension instead.
    """
    pairs: list[Column] = []
    for k, v in sorted(rates.items()):
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"rate must be in [0,1]: {k}={v}")
        pairs += [F.lit(k), F.lit(int(v * _SCALE))]
    thresh = F.coalesce(
        F.create_map(*pairs)[F.col(strata_col)],
        F.lit(int(default_rate * _SCALE)),
    )
    return df.filter(hash_bucket(F.col(id_col), salt) < thresh)


def split_assign(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split by disjoint hash
    ranges (e.g. {"train": .98, "valid": .01, "test": .01}).  The
    assignment is a total function of the id — stable across runs,
    engines, and data layout."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1: {total}")
    bucket = hash_bucket(F.col(id_col), salt)
    expr: Column | None = None
    lo = 0.0
    items = sorted(fractions.items())
    for name, frac in items[:-1]:
        hi = lo + frac
        cond = bucket < F.lit(int(hi * _SCALE))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo = hi
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)


def split_leakage_guard(
    df: DataFrame,
    split_col: str = "split",
    text_col: str = "text",
    out_col: str = "leaked",
) -> DataFrame:
    """Train/eval LEAKAGE guard: flag every row whose exact content
    digest also appears in ANOTHER split — the held-out set is worthless
    where its members (or their exact copies) sit in train.  Distinct
    from benchmark decontamination (q76): this guards a split of ONE
    corpus against itself, the step right after ``split_assign``.

    Scale shape: one groupBy over 16-byte digests counting distinct
    splits, joined back on the digest — the corpus text never shuffles,
    only (digest, split) pairs.  Group-level splitting (assign by
    source/domain, not doc id) prevents most leakage up front; this
    guard catches what crosses groups (mirrors, syndicated copies)."""
    d = df.withColumn("_dg", F.md5(F.col(text_col)))
    span = d.groupBy("_dg").agg(
        F.count_distinct(F.col(split_col)).alias("_nsplits")
    )
    return (
        d.join(span, "_dg")
        .withColumn(out_col, F.col("_nsplits") > 1)
        .drop("_dg", "_nsplits")
    )


def epoch_expand(
    df: DataFrame,
    weights_q: Column,
    id_col: str = "doc_id",
    salt: str = "epoch-v1",
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Fractional-epoch mixture expansion: repeat every row
    ``floor(w)`` times and give a deterministic hash-chosen ``frac(w)``
    fraction of rows one extra copy.

    This is the upsampling half of training-corpus mixing (mixture
    weights > 1, e.g. "2.4 epochs of wiki"): DoReMi/LLaMA-style recipes
    state per-source epoch counts, and the corpus builder must expand
    them reproducibly — NOT with ``df.sample(withReplacement=True)``,
    which is seed-and-partitioning dependent.

    ``weights_q`` is the per-row weight in 1e-4 units (an integer
    column, e.g. ``lit(23000)`` for 2.3 epochs) so the fractional
    threshold is exact integer arithmetic in any engine.  The extra
    copy goes to rows whose 32-bit id-hash bucket scaled to [0, 10000)
    falls below ``w_q % 10000`` — the same stable-under-everything
    id-hash rule as ``hash_sample``.

    Plan shape: narrow map + ``explode(sequence(...))`` — shuffle-free;
    output carries ``copy_col`` (1-based) so downstream shuffles/packing
    see distinct rows.  Rows with ``weights_q = 0`` whose hash misses
    the fraction emit nothing (sequence guard, not a filter-after-
    explode)."""
    w_q = weights_q.cast("long")
    frac_hit = (
        (hash_bucket(F.col(id_col), salt) * 10000) / F.lit(_SCALE)
    ).cast("long") < (w_q % 10000)
    copies = (w_q / 10000).cast("long") + frac_hit.cast("long")
    idx = F.when(
        copies >= 1, F.sequence(F.lit(1).cast("long"), copies)
    ).otherwise(F.array().cast("array<long>"))
    return df.withColumn(copy_col, F.explode(idx))


def systematic_pps_sample(
    df: DataFrame,
    order_cols: list[str],
    weight_col: str,
    k: int,
    picks_col: str = "n_picks",
    bucket_expr: Column | None = None,
) -> DataFrame:
    """SYSTEMATIC probability-proportional-to-size sampling — the
    corpus-mixture primitive for "draw ~k documents where a doc's
    inclusion probability is proportional to its weight" (tokens,
    bytes, quality mass) with ZERO floating point: lay all weights on
    an integer line in ``order_cols`` order, then take every
    ``total/k``-th point.  A row is selected iff a stride boundary
    falls inside its weight interval, i.e.

        picks = floor(cum * k / total) - floor((cum - w) * k / total)

    (a row heavier than the stride is drawn ``picks`` > 1 times —
    standard PPS-systematic semantics).  Exactly ``k`` picks total,
    bit-reproducible in any engine with 64-bit integers — no RNG, no
    ``pow``, no ulp hazards (this is how the oracle verifies the draw
    exactly; classic reference: Madow 1949 systematic selection).

    Scale shape: ``ranking.distributed_running_sum`` (range-partition
    prefix sum — never an unpartitioned window) + one scalar total
    broadcast into a narrow filter.  Weights must be non-negative
    integers; sum(weight) * k must fit in int64 — guard with the
    caller's token/byte budget."""
    from gpt_rag_ingestion_spark.operators.ranking import (
        distributed_running_sum,
    )

    total = df.agg(F.sum(F.col(weight_col).cast("long"))).first()[0]
    if not total or int(total) <= 0:
        raise ValueError(f"sum({weight_col}) must be positive, got {total}")
    total = int(total)
    order = [F.col(c) for c in order_cols]
    cum = distributed_running_sum(
        df, order, weight_col, sum_col="__cum", bucket_expr=bucket_expr
    )
    # integer `div`, never `/` (long / long is DOUBLE in Spark SQL —
    # a ulp at a stride boundary would flip a pick)
    picks = F.expr(
        f"CAST((__cum * {int(k)}) div {total} "
        f"- ((__cum - CAST({weight_col} AS LONG)) * {int(k)}) "
        f"div {total} AS LONG)"
    )
    return (
        cum.withColumn(picks_col, picks)
        .filter(F.col(picks_col) > 0)
        .drop("__cum")
    )
