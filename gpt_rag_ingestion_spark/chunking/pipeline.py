"""Document → chunks pipeline (SURVEY.md §3.1 re-expressed Spark-first).

Reference lifecycle per document: download → chunk → enrich → embed →
map to index schema (reference jobs/blob_storage_indexer.py:430-777,
chunking/chunkers/base_chunker.py:154-234).  Here the whole corpus is
one DataFrame plan:

    documents
      -> applyInPandas-free chunk UDF (ARRAY<STRUCT> + explode)
      -> deterministic ids (F1-F3)
      -> byte-safe truncation (F6)
      -> embedding enricher (U1, pandas UDF)
      -> CHUNK_SCHEMA rows

Scale notes (100 TB):
- the chunk UDF is an Arrow-batched pandas UDF returning
  ARRAY<STRUCT>; explode happens JVM-side.  No shuffle anywhere in the
  pipeline — it is a narrow map from scan to sink, so it scales
  linearly with executors.
- documents are processed where they are read (no repartition unless
  the source has pathological file sizing); embedding concurrency is
  the task count.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from gpt_rag_ingestion_spark.chunking.splitter import (
    CHUNK_NUM_TOKENS,
    MIN_CHUNK_SIZE,
    TOKEN_OVERLAP,
    split_text_recursive,
)
from gpt_rag_ingestion_spark.functions.keys import chunk_key, sanitize_key
from gpt_rag_ingestion_spark.embeddings import hash_embedding_udf

_CHUNK_STRUCT = ArrayType(
    StructType(
        [
            StructField("chunk_id", IntegerType()),
            StructField("content", StringType()),
            StructField("offset", LongType()),
            StructField("length", IntegerType()),
        ]
    )
)


def make_chunk_udf(
    max_tokens: int = CHUNK_NUM_TOKENS,
    overlap: int = TOKEN_OVERLAP,
    min_tokens: int = MIN_CHUNK_SIZE,
    separators: list | None = None,
):
    """Split + byte-safe truncation fused into ONE pandas UDF — the
    32,766-byte cap (F6) is part of the chunk contract, and fusing it
    here saves a whole JVM<->Python Arrow round-trip per corpus pass.
    ``separators`` selects a format-specific set (markdown headers,
    python defs — splitter.separators_for_extension)."""
    from gpt_rag_ingestion_spark.functions.text import MAX_CONTENT_BYTES
    from gpt_rag_ingestion_spark.session import ship_active

    ship_active()

    def _split_one(s: str) -> list[dict]:
        chunks = split_text_recursive(
            s or "", max_tokens=max_tokens, overlap_tokens=overlap,
            min_tokens=min_tokens, separators=separators,
        )
        for c in chunks:
            b = c["content"].encode("utf-8")
            if len(b) > MAX_CONTENT_BYTES:
                c["content"] = b[:MAX_CONTENT_BYTES].decode("utf-8", "ignore")
                c["length"] = len(c["content"])
        return chunks

    @pandas_udf(_CHUNK_STRUCT)
    def _chunk(texts: pd.Series) -> pd.Series:
        return texts.map(_split_one)

    return _chunk


def make_timed_chunk_udf(
    max_tokens: int = CHUNK_NUM_TOKENS,
    overlap: int = TOKEN_OVERLAP,
    min_tokens: int = MIN_CHUNK_SIZE,
    separators: list | None = None,
):
    """Chunk UDF that also reports the per-document split seconds —
    feeds the ops log's per-file ``timings.chunkEmbedSec``
    (reference blob_storage_indexer.py:617-628 times chunking per file;
    here the measurement happens inside the UDF, so it is a real
    per-document number even though the stage is fused)."""
    import time

    from gpt_rag_ingestion_spark.functions.text import MAX_CONTENT_BYTES
    from gpt_rag_ingestion_spark.session import ship_active

    ship_active()

    def _split_one(s: str) -> list[dict]:
        chunks = split_text_recursive(
            s or "", max_tokens=max_tokens, overlap_tokens=overlap,
            min_tokens=min_tokens, separators=separators,
        )
        for c in chunks:
            b = c["content"].encode("utf-8")
            if len(b) > MAX_CONTENT_BYTES:
                c["content"] = b[:MAX_CONTENT_BYTES].decode("utf-8", "ignore")
                c["length"] = len(c["content"])
        return chunks

    timed_struct = StructType(
        [
            StructField("chunks", _CHUNK_STRUCT),
            StructField("chunk_sec", DoubleType()),
        ]
    )

    @pandas_udf(timed_struct)
    def _chunk_timed(texts: pd.Series) -> pd.DataFrame:
        out_chunks, out_secs = [], []
        for s in texts:
            t0 = time.monotonic()
            out_chunks.append(_split_one(s))
            out_secs.append(round(time.monotonic() - t0, 6))
        return pd.DataFrame({"chunks": out_chunks, "chunk_sec": out_secs})

    return _chunk_timed


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    doc_key_col: str = "doc_id",
    source_col: str | None = "source",
    embedding_dim: int = 64,
    max_tokens: int = CHUNK_NUM_TOKENS,
    overlap: int = TOKEN_OVERLAP,
    min_tokens: int = MIN_CHUNK_SIZE,
    carry_cols: list[str] | None = None,
    separators: list | None = None,
    spread: bool = True,
    timing_col: str | None = None,
) -> DataFrame:
    """Full chunk+embed pipeline over a documents DataFrame.

    Returns rows keyed like the reference's search docs: ``parent_id``
    (sanitized doc key), ``id`` (parent-c%05d, F2), chunk payload,
    ``contentVector`` from the deterministic embedder.  ``carry_cols``
    ride along unchanged (document-level metadata).  ``spread=False``
    skips the small-input repartition probe — pass it when the caller
    already spread the corpus (e.g. chunk_corpus), since the probe's
    plan->RDD conversion costs a query compilation per call."""
    from gpt_rag_ingestion_spark.session import ensure_importable

    ensure_importable(docs)
    # a small source (single parquet file) arrives as 1-2 partitions and
    # would serialize the whole UDF pipeline onto one core — spread it.
    # At real scale inputs already have >= cluster parallelism partitions
    # and this is a no-op (no shuffle added).
    if spread:
        target = docs.sparkSession.sparkContext.defaultParallelism
        if docs.rdd.getNumPartitions() < min(target, 8):
            docs = docs.repartition(target)
    embed = hash_embedding_udf(embedding_dim)

    carry = list(carry_cols or [])
    if source_col:
        carry = [source_col] + carry
    if timing_col:
        timed_udf = make_timed_chunk_udf(max_tokens, overlap, min_tokens, separators)
        docs = docs.withColumn("_tc", timed_udf(F.col(text_col))).withColumn(
            timing_col, F.col("_tc.chunk_sec")
        )
        chunks_expr = F.col("_tc.chunks")
        carry = carry + [timing_col]
    else:
        chunk_udf = make_chunk_udf(max_tokens, overlap, min_tokens, separators)
        chunks_expr = chunk_udf(F.col(text_col))
    parent = sanitize_key(F.col(doc_key_col).cast("string"))
    out = (
        docs.withColumn("_chunks", chunks_expr)
        .select(
            parent.alias("parent_id"),
            *[F.col(c) for c in carry],
            F.explode("_chunks").alias("_c"),
        )
        .select(
            "parent_id",
            *carry,
            F.col("_c.chunk_id").alias("chunk_id"),
            F.col("_c.offset").alias("offset"),
            F.col("_c.length").alias("length"),
            F.col("_c.content").alias("content"),
        )
        .withColumn("id", chunk_key(F.col("parent_id"), F.col("chunk_id")))
        .withColumn("contentVector", embed(F.col("content")))
    )
    return out
