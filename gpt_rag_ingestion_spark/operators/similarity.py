"""Similarity search over embedding columns (beyond-reference, north-star).

- ``knn_bruteforce``: exact top-k by dot product / cosine.  The query
  side is broadcast; the corpus side streams — so the plan is a
  broadcast nested-loop with a per-partition top-k (window), no shuffle
  of the corpus.  Correctness baseline.
- ``quantized_dot_top1``: the oracle-checkable variant — components are
  quantized to integers (round(x*1000)) so the dot product is exact
  integer arithmetic, identical in any engine regardless of summation
  order.  Ranking by quantized dot == ranking by cosine for unit-norm
  vectors up to quantization error.
- ``lsh_bucketed_ann``: the 100 TB scale path — random-hyperplane LSH
  signatures bucket the corpus; candidates only join within a bucket,
  cutting the pair space by ~2^bits.  Signatures are built with the
  deterministic hash-embedding of the bit index, so no randomness
  source is needed at plan time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gpt_rag_ingestion_spark.embeddings import embed_text_deterministic


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _qvec(col):
    """Quantize ARRAY<FLOAT> -> ARRAY<BIGINT> at 3 decimals (exact)."""
    return F.transform(col, lambda x: F.round(x.cast("double") * 1000).cast("long"))


def quantized_dot_top1(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """For every vector: the other vector maximizing the integer-quantized
    dot product (ties -> smaller neighbor id).  Exact, engine-portable."""
    q = emb.select(F.col(id_col), _qvec(F.col(vec_col)).alias("q"))
    a = q.select(F.col(id_col).alias("vec_id"), F.col("q").alias("qa"))
    b = q.select(F.col(id_col).alias("nn_id"), F.col("q").alias("qb"))
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("vec_id") != F.col("nn_id"))
    dot = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = pairs.select("vec_id", "nn_id", dot.alias("dot"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("dot"), F.asc("nn_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "nn_id", "dot")
    )


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus.  Queries are
    broadcast (small side); the corpus never shuffles — per-partition
    scoring then a window top-k on (query, score)."""
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cv"),
    ).withColumn("cnorm", F.sqrt(_dot(F.col("cv"), F.col("cv"))))
    qdf = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
    ).withColumn("qnorm", F.sqrt(_dot(F.col("qv"), F.col("qv"))))
    pairs = c.crossJoin(F.broadcast(qdf)).filter(F.col("corpus_id") != F.col("query_id"))
    cos = _dot(F.col("cv"), F.col("qv")) / (F.col("cnorm") * F.col("qnorm"))
    scored = pairs.select("query_id", "corpus_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def _hyperplane(dim: int, bit: int) -> list[float]:
    """Deterministic random hyperplane: the hash-embedding of the bit
    index string (unit-norm, reproducible everywhere)."""
    return embed_text_deterministic(f"hyperplane:{bit}", dim)


def _probe_masks(bits: int, probes: int) -> list[int]:
    """All bit-flip masks with <= ``probes`` bits set (multi-probe LSH)."""
    from itertools import combinations

    masks = [0]
    for r in range(1, probes + 1):
        for combo in combinations(range(bits), r):
            m = 0
            for b in combo:
                m |= 1 << b
            masks.append(m)
    return masks


def lsh_bucketed_ann(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    bits: int = 8,
    k: int = 10,
    probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN via random-hyperplane LSH: bucket = sign-bit signature over
    ``bits`` fixed hyperplanes; exact cosine within each bucket.
    ``probes`` enables multi-probe: each query also visits buckets whose
    signature differs in <= ``probes`` bits, trading work for recall —
    essential when neighbors are weakly similar (near-orthogonal), where
    single-bucket recall decays as agreement^bits.

    At 100 TB: the bucket id is the shuffle/partition key — each bucket
    holds ~N/2^bits vectors; the corpus is partitioned once and queries
    fan out to 1 + Σ C(bits, i<=probes) buckets instead of the full
    corpus."""
    planes = [_hyperplane(dim, b) for b in range(bits)]

    def signature(vc):
        sig = F.lit(0).cast("long")
        for b, p in enumerate(planes):
            arr = F.array(*[F.lit(float(x)) for x in p])
            d = _dot(F.transform(vc, lambda x: x.cast("double")), arr)
            sig = sig + F.when(d > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0))
        return sig

    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cv"),
    ).withColumn("bucket", signature(F.col("cv")))
    masks = _probe_masks(bits, probes)
    qd = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
        )
        .withColumn("_sig", signature(F.col("qv")))
        .withColumn(
            "bucket",
            F.explode(F.array(*[F.col("_sig").bitwiseXOR(F.lit(m)) for m in masks])),
        )
        .drop("_sig")
    )
    pairs = c.join(qd, on="bucket").filter(F.col("corpus_id") != F.col("query_id"))
    cnorm = F.sqrt(_dot(F.col("cv"), F.col("cv")))
    qnorm = F.sqrt(_dot(F.col("qv"), F.col("qv")))
    cos = _dot(F.col("cv"), F.col("qv")) / (cnorm * qnorm)
    scored = pairs.select("query_id", "corpus_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )
