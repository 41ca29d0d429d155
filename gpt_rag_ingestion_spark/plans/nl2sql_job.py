"""NL2SQL metadata ingestion (SURVEY.md S7/C7/J5; reference
jobs/nl2sql_indexer.py:131-371, chunking/chunkers/nl2sql_chunker.py).

Reference flow: list JSON blobs under queries/ tables/ measures/
prefixes, parse each, build one doc per record with a sanitized id
derived from the blob path, embed the question (queries) or
description (tables/measures), upsert into three small indexes; the
purger deletes index ids whose sanitized blob path vanished (J5).

Spark shape: one kind-routed JSON scan (path glob == prefix
dispatch), three select+embed branches writing three typed tables.
These tables are broadcast-sized at any realistic scale (metadata, not
data) — every downstream join against them is a broadcast."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpt_rag_ingestion_spark.embeddings import hash_embedding_udf
from gpt_rag_ingestion_spark.functions.keys import sanitize_key
from gpt_rag_ingestion_spark.sources.binary_docs import read_json_kind_routed

KINDS = ["queries", "tables", "measures"]


def _ids(df: DataFrame) -> DataFrame:
    """J5/F1: id = sanitized '<kind>/<filename-sans-ext>' (path-derived,
    so the purge anti-join key is reproducible from a blob listing)."""
    # input_file_name() URL-encodes paths; decode before deriving the id
    fname = F.url_decode(F.element_at(F.split(F.col("src_file"), "/"), -1))
    stem = F.regexp_replace(fname, "\\.json$", "")
    return df.withColumn(
        "id", sanitize_key(F.concat(F.col("kind"), F.lit("-"), stem))
    )


def run_nl2sql_job(
    spark: SparkSession, base_path: str, embedding_dim: int = 64
) -> dict[str, DataFrame]:
    """base_path/{queries,tables,measures}/*.json -> three typed
    DataFrames keyed + embedded per the reference contract: queries
    embed the QUESTION; tables/measures embed the description."""
    embed = hash_embedding_udf(embedding_dim)
    raw = _ids(read_json_kind_routed(spark, base_path, KINDS))
    cols = set(raw.columns)

    def col_or_null(name: str):
        return F.col(name) if name in cols else F.lit(None).cast("string")

    queries = raw.filter(F.col("kind") == "queries").select(
        "id",
        col_or_null("datasource").alias("datasource"),
        col_or_null("question").alias("question"),
        col_or_null("query").alias("query"),
        col_or_null("reasoning").alias("reasoning"),
    ).withColumn("contentVector", embed(F.coalesce(F.col("question"), F.lit(""))))

    tables = raw.filter(F.col("kind") == "tables").select(
        "id",
        col_or_null("table").alias("table"),
        col_or_null("description").alias("description"),
        col_or_null("datasource").alias("datasource"),
        *(["columns"] if "columns" in cols else []),
    ).withColumn("contentVector", embed(F.coalesce(F.col("description"), F.lit(""))))

    measures = raw.filter(F.col("kind") == "measures").select(
        "id",
        col_or_null("datasource").alias("datasource"),
        col_or_null("name").alias("name"),
        col_or_null("description").alias("description"),
        col_or_null("type").alias("type"),
        col_or_null("source_table").alias("source_table"),
    ).withColumn("contentVector", embed(F.coalesce(F.col("description"), F.lit(""))))

    return {"queries": queries, "tables": tables, "measures": measures}


def nl2sql_purge_targets(
    index_ids: DataFrame, live_listing: DataFrame
) -> DataFrame:
    """J5: index ids minus sanitized ids derivable from the live blob
    listing (columns: kind, src_file)."""
    live = _ids(live_listing).select("id")
    return index_ids.join(live, on="id", how="left_anti")
