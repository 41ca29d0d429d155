"""The blob-ingestion lifecycle as one DataFrame job (SURVEY.md §3.1).

Reference flow (jobs/blob_storage_indexer.py:234-394):
  run summary "started" → index-state watermarks → enumerate source →
  freshness filter → blocklist filter → per-file: chunk+embed →
  delete-old+upsert → per-file logs → run summary "finished".

Spark re-expression — a single composed plan:

    listing                    (source scan)
      ⟕ watermarks             (agg over chunks table, broadcast)
      → freshness filter       (P1/P2)
      ⟕̸ blocklist              (anti-join, P3)
      → chunk UDF + explode    (C-family)
      → ids + truncate + embed (F1-F3, F6, U1)
      → MERGE by parent_id     (S10/S11)
    ops rows = aggregations over the same result

The whole thing is two broadcast joins and a narrow map — the only
shuffles are the watermark aggregation (small) and the merge's
anti-join.  At 100 TB with the chunks table partitioned by
ingest-date/source, the merge touches only affected partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpt_rag_ingestion_spark.chunking.pipeline import chunk_documents
from gpt_rag_ingestion_spark.operators.freshness import (
    freshness_candidates,
    index_watermarks,
)
from gpt_rag_ingestion_spark.operators.ops_log import apply_blocklist, run_summary
from gpt_rag_ingestion_spark.operators.upsert import merge_upsert


def run_ingest_job(
    spark: SparkSession,
    source_docs: DataFrame,
    table_path: str,
    run_id: str,
    blocked: DataFrame | None = None,
    doc_key_col: str = "doc_key",
    text_col: str = "text",
    ts_col: str = "last_modified",
    embedding_dim: int = 64,
    max_tokens: int = 2048,
    overlap: int = 200,
    min_tokens: int = 100,
) -> DataFrame:
    """One incremental ingest run.  Returns the run-summary DataFrame
    (A2 counters); side effect: the chunks table at ``table_path`` is
    merged up to date."""
    # 1. index-state watermarks from the existing chunks table (A1/S9)
    try:
        chunks_table = spark.read.parquet(table_path)
        watermarks = index_watermarks(
            chunks_table, key="parent_id", ts="metadata_storage_last_modified"
        )
        have_table = True
    except Exception:
        have_table = False

    from gpt_rag_ingestion_spark.functions.keys import sanitize_key

    # sanitize HERE so the freshness join key matches what
    # chunk_documents writes as parent_id (sanitize is idempotent);
    # a raw key like 'docs/a.pdf' would never match its own watermark
    # and the doc would re-ingest forever
    listing = source_docs.withColumn(
        "parent_id", sanitize_key(F.col(doc_key_col).cast("string"))
    )

    # 2. freshness (J1/P1/P2)
    if have_table:
        candidates = freshness_candidates(
            listing, watermarks, key="parent_id", ts=ts_col
        )
    else:
        candidates = listing

    # 3. blocklist (P3)
    if blocked is not None:
        candidates = apply_blocklist(
            candidates.withColumnRenamed("parent_id", "file_key"), blocked
        ).withColumnRenamed("file_key", "parent_id")

    candidates = candidates.cache()
    n_candidates = candidates.count()

    # 4. chunk + embed (narrow map)
    chunks = chunk_documents(
        candidates,
        text_col=text_col,
        doc_key_col="parent_id",
        source_col=None,
        embedding_dim=embedding_dim,
        max_tokens=max_tokens,
        overlap=overlap,
        min_tokens=min_tokens,
    )
    # carry the source timestamp through for the next run's watermark
    ts_map = candidates.select(
        F.col("parent_id"), F.col(ts_col).alias("metadata_storage_last_modified")
    )
    chunks = chunks.join(F.broadcast(ts_map), on="parent_id", how="left").cache()

    # 5. run summary (A2) — materialized BEFORE the merge: the freshness
    # join's lineage reads the pre-merge table, and the merge's
    # refreshByPath invalidates any cache that references it (recomputing
    # afterwards would see the new watermarks and report zero files).
    chunk_counts = chunks.groupBy("parent_id").agg(
        F.count(F.lit(1)).alias("chunks")
    ).withColumnRenamed("parent_id", "file_key")
    per_file = (
        candidates.select(F.col("parent_id").alias("file_key"))
        .join(chunk_counts, on="file_key", how="left")
        .select(
            F.lit(run_id).alias("run_id"),
            "file_key",
            F.lit("success").alias("status"),
            F.coalesce("chunks", F.lit(0)).alias("chunks"),
        )
    )
    summary = run_summary(per_file)
    summary_schema = summary.schema
    summary_rows = summary.collect()

    # 6. idempotent merge (S10/S11 delete-then-insert)
    if n_candidates > 0:
        merge_upsert(spark, table_path, chunks, key="parent_id")

    candidates.unpersist()
    chunks.unpersist()
    return spark.createDataFrame(summary_rows, schema=summary_schema)
