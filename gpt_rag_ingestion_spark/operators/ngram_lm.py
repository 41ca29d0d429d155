"""Corpus-trained n-gram LM fluency scoring (CCNet-style buckets).

The canonical web-corpus curation step this engine still lacked: score
each document by how PREDICTABLE its word sequences are under a
language model trained on the corpus itself, then split the corpus
into head / middle / tail quality buckets (CCNet trains KenLM and
buckets by perplexity percentile; The Pile, RedPajama, and FineWeb all
carry a variant of this gate).

Spark-first design — the whole thing is three relational passes, no
Python in the hot path:

1. **Train**: one explode of per-doc word bigrams → two count
   aggregations, c(w1,w2) and c(w1), plus the head-vocabulary size V.
   This is the "train the LM" job: O(corpus tokens) with two compact
   shuffles on string keys, run once (or incrementally re-run per
   ingest wave — counts are additive).
2. **Score**: join each doc's bigrams to the count tables and take
   the ratio of exact integer sums

       score = SUM(c(w1) + V) / SUM(c(w1,w2) + 1)

   — the aggregate INVERSE conditional probability under add-one
   smoothing.  A fluent doc (bigrams common given their heads) scores
   low; gibberish scores high.  Deliberately log-free: log-perplexity
   orders documents the same way but sums irrational doubles, which
   no cross-engine oracle can hash-match; here both sums are exact
   BIGINTs and the single final division is IEEE-exact in any engine.
   (A ``log_perplexity`` column is still exposed for human use —
   derived, not part of the deterministic contract.)
3. **Bucket**: total-order row_number over (score, doc_id) →
   head / middle / tail thirds — exact integer arithmetic, no ntile
   ties ambiguity.

Scale shape: training counts shuffle bigram strings once; scoring
joins are shuffle-hash on (w1, w2) / (w1) with the count tables on
the build side.  At 100 TB, cap ``max_tokens`` (default 512) bounds
per-doc work, and the count tables can be pre-filtered to counts > 1
(rare-bigram smoothing dominates anyway) — both knobs exposed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _doc_bigrams(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    max_tokens: int,
) -> DataFrame:
    """(id, w1, w2) — consecutive lowercase word pairs, first
    ``max_tokens`` words per doc."""
    words = F.expr(
        f"slice(filter(split(lower({text_col}), '\\\\s+'), x -> x != ''), "
        f"1, {int(max_tokens)})"
    )
    pairs = F.expr(
        "CASE WHEN size(_w) >= 2 THEN transform(sequence(1, size(_w) - 1), "
        "i -> struct(_w[i - 1] AS w1, _w[i] AS w2)) "
        "ELSE array() END"
    )
    return (
        docs.select(F.col(id_col), words.alias("_w"))
        .select(id_col, F.explode(pairs).alias("_bg"))
        .select(id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))
    )


def train_bigram_counts(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 512,
    min_count: int = 1,
) -> tuple[DataFrame, DataFrame, int]:
    """(bigram_counts(w1, w2, c12), head_counts(w1, c1), V).

    ``min_count`` > 1 drops rare bigrams from the model (they fall
    back to the smoothing mass) — the table-size knob at web scale."""
    bg = _doc_bigrams(corpus, text_col, id_col, max_tokens)
    c12 = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= int(min_count))
    )
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = c1.count()  # head vocabulary size — the smoothing denominator
    return c12, c1, int(v)


def lm_score(
    docs: DataFrame,
    c12: DataFrame,
    c1: DataFrame,
    v: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 512,
) -> DataFrame:
    """(id, n_bigrams, score, log_perplexity) per doc.

    score = SUM(c1 + V) / SUM(c12 + 1) over the doc's bigrams, with
    unseen heads contributing c1 = 0 (pure smoothing mass).  Exact
    integer sums; one final IEEE division rounded to 6 places.
    Docs with no bigrams (< 2 words) are dropped — they carry no
    sequence evidence."""
    bg = _doc_bigrams(docs, text_col, id_col, max_tokens)
    joined = (
        bg.join(c12.hint("shuffle_hash"), ["w1", "w2"], "left")
        .join(c1.hint("shuffle_hash"), ["w1"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("c12"), F.lit(0)).alias("_c12"),
            F.coalesce(F.col("c1"), F.lit(0)).alias("_c1"),
        )
    )
    agg = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(F.col("_c1") + F.lit(int(v))).cast("long").alias("_num"),
        F.sum(F.col("_c12") + F.lit(1)).cast("long").alias("_den"),
    )
    score = F.round(F.col("_num") / F.col("_den"), 6)
    # human-facing: average -log2 p ≈ log2(score of the mean-inverse);
    # NOT hash-deterministic cross-engine, excluded from oracles
    logppl = F.log2(F.col("_num") / F.col("_den"))
    return agg.select(
        F.col(id_col),
        F.col("n_bigrams"),
        score.alias("score"),
        logppl.alias("log_perplexity"),
    )


def lm_quality_buckets(
    scored: DataFrame,
    id_col: str = "doc_id",
    buckets: tuple[str, ...] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet's percentile split on the deterministic score: total
    order (score, id) → equal thirds.  Exact integer bucketing (no
    ntile tie ambiguity): bucket_idx = floor((rn-1) * k / n).

    Uses ``ranking.distributed_row_number`` (range partition + local
    rank + broadcast offsets), NOT an unpartitioned window — a global
    ORDER BY window would funnel the whole corpus through one task."""
    from gpt_rag_ingestion_spark.operators.ranking import (
        distributed_row_number,
    )

    k = len(buckets)
    n = scored.count()
    if n == 0:
        return scored.select(
            F.col(id_col), "n_bigrams", "score",
            F.lit(None).cast("string").alias("bucket"),
        )
    ranked = distributed_row_number(
        scored,
        [F.col("score").asc(), F.col(id_col).asc()],
        rank_col="_rn",
    )
    idx = F.floor((F.col("_rn") - 1) * k / F.lit(n)).cast("int")
    label = F.element_at(F.array(*[F.lit(b) for b in buckets]), idx + 1)
    return ranked.select(
        F.col(id_col), "n_bigrams", "score", label.alias("bucket")
    )


def maintain_bigram_counts(
    c12: DataFrame,
    c1: DataFrame,
    added: DataFrame | None = None,
    removed: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 512,
) -> tuple[DataFrame, DataFrame, int]:
    """Incremental LM maintenance: counts are ADDITIVE, so an ingest
    wave (or a purge) updates the model with O(delta) work instead of
    a corpus retrain — old + counts(added) − counts(removed), rows at
    zero dropped (the ``maintain_rollup`` identity, applied to the LM).
    Returns the new (c12, c1, V); equality with a full retrain is
    unit-pinned.

    Note ``min_count``-pruned tables are NOT maintainable this way
    (pruning is lossy); maintain the unpruned counts and prune at
    score time."""
    spark = c12.sparkSession

    def delta(docs, sign):
        bg = _doc_bigrams(docs, text_col, id_col, max_tokens)
        d12 = bg.groupBy("w1", "w2").agg(
            (F.count(F.lit(1)) * sign).alias("c12")
        )
        d1 = bg.groupBy("w1").agg((F.count(F.lit(1)) * sign).alias("c1"))
        return d12, d1

    empty12 = spark.createDataFrame([], "w1 string, w2 string, c12 long")
    empty1 = spark.createDataFrame([], "w1 string, c1 long")
    a12, a1 = delta(added, F.lit(1)) if added is not None else (empty12, empty1)
    r12, r1 = (
        delta(removed, F.lit(-1)) if removed is not None else (empty12, empty1)
    )
    new12 = (
        c12.unionByName(a12).unionByName(r12)
        .groupBy("w1", "w2")
        .agg(F.sum("c12").cast("long").alias("c12"))
        .filter(F.col("c12") > 0)
    )
    new1 = (
        c1.unionByName(a1).unionByName(r1)
        .groupBy("w1")
        .agg(F.sum("c1").cast("long").alias("c1"))
        .filter(F.col("c1") > 0)
    )
    return new12, new1, int(new1.count())
