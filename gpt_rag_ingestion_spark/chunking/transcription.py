"""Transcription chunker composition (SURVEY.md C5; reference
chunking/chunkers/transcription_chunker.py:14-116).

VTT bytes -> speaker turns -> whole-transcript summary -> recursive
split.  Parity quirk preserved: every chunk's EMBEDDING comes from the
transcript summary, not the chunk's own text (reference :78) — the
summary column rides on every chunk row and feeds the embedder."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from gpt_rag_ingestion_spark.chunking.pipeline import make_chunk_udf
from gpt_rag_ingestion_spark.chunking.vtt_chunker import vtt_to_text
from gpt_rag_ingestion_spark.embeddings import hash_embedding_udf
from gpt_rag_ingestion_spark.enrichers import summarize_deterministic
from gpt_rag_ingestion_spark.functions.keys import chunk_key, sanitize_key


@pandas_udf(StringType())
def vtt_text_udf(raw: pd.Series) -> pd.Series:
    return raw.map(lambda b: vtt_to_text(b.decode("utf-8", "replace") if isinstance(b, (bytes, bytearray)) else (b or "")))


@pandas_udf(StringType())
def transcript_summary_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda s: summarize_deterministic(s or ""))


def chunk_transcriptions(
    docs: DataFrame,
    vtt_col: str = "bytes",
    doc_key_col: str = "doc_key",
    embedding_dim: int = 64,
    max_tokens: int = 2048,
    overlap: int = 200,
    min_tokens: int = 10,
) -> DataFrame:
    """C5 end-to-end: parse -> summarize -> split -> embed(SUMMARY)."""
    from gpt_rag_ingestion_spark.session import ensure_importable

    ensure_importable(docs)
    chunk_udf = make_chunk_udf(max_tokens, overlap, min_tokens)
    embed = hash_embedding_udf(embedding_dim)

    turns = docs.withColumn("_text", vtt_text_udf(F.col(vtt_col)))
    with_summary = turns.withColumn("summary", transcript_summary_udf(F.col("_text")))
    out = (
        with_summary.withColumn("_chunks", chunk_udf(F.col("_text")))
        .select(
            sanitize_key(F.col(doc_key_col).cast("string")).alias("parent_id"),
            F.col("summary"),
            F.explode("_chunks").alias("_c"),
        )
        .select(
            "parent_id",
            "summary",
            F.col("_c.chunk_id").alias("chunk_id"),
            F.col("_c.content").alias("content"),
            F.col("_c.offset").alias("offset"),
            F.col("_c.length").alias("length"),
        )
        .withColumn("id", chunk_key(F.col("parent_id"), F.col("chunk_id")))
        # parity quirk: contentVector embeds the SUMMARY (reference :78)
        .withColumn("contentVector", embed(F.col("summary")))
    )
    return out
