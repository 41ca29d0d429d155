"""Synchronous single-document chunking (SURVEY.md §3.2).

The reference exposes ``POST /document-chunking`` — an Azure AI Search
custom-skill endpoint that downloads one blob and runs the same chunker
stack synchronously, with the quirk that only the LAST item of a batch
is processed (reference main.py:355-421, 380-382).

Spark-native: the same chunk pipeline applied to a 1-row DataFrame —
one shared code path between batch and API, which is the actual design
requirement behind the endpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gpt_rag_ingestion_spark.chunking.pipeline import chunk_documents


def chunk_single_document(
    spark: SparkSession,
    doc_key: str,
    text: str,
    source: str = "blob",
    embedding_dim: int = 64,
    max_tokens: int = 2048,
    overlap: int = 200,
    min_tokens: int = 100,
) -> DataFrame:
    """The /document-chunking contract on one in-memory document."""
    df = spark.createDataFrame([(doc_key, text, source)], ["doc_key", "text", "source"])
    return chunk_documents(
        df,
        text_col="text",
        doc_key_col="doc_key",
        source_col="source",
        embedding_dim=embedding_dim,
        max_tokens=max_tokens,
        overlap=overlap,
        min_tokens=min_tokens,
    )


def chunk_last_of_batch(
    spark: SparkSession, items: list[tuple[str, str]], **kwargs
) -> DataFrame:
    """Reference quirk preserved for parity: a batch of >1 items
    processes ONLY the last one (main.py:380-382)."""
    if not items:
        raise ValueError("empty batch")
    key, text = items[-1]
    return chunk_single_document(spark, key, text, **kwargs)
