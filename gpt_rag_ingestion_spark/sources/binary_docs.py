"""Document sources (SURVEY.md S1-S8).

The reference enumerates blob containers / SharePoint lists / JSON
prefixes imperatively with paging and retries (reference
jobs/blob_storage_indexer.py:286-302, jobs/sharepoint_graph_client.py:177-261,
jobs/nl2sql_indexer.py:131-153).  In Spark every one of those becomes a
declarative scan whose pushdown Catalyst owns:

- ``binaryFile`` scan: path, modificationTime, length, content — the
  exact payload dict the reference builds per blob
  (blob_storage_indexer.py:587-595).  ``pathGlobFilter`` ≡ the
  name-prefix predicate (S1/P5); zero-byte dir markers are excluded by
  a length filter.
- JSON scans with ``input_file_name()``-based kind routing (S7).
- config scans = small JSON reads + filter (S8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpt_rag_ingestion_spark.functions.text import extension_of, filename_of


def read_binary_documents(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    skip_empty: bool = True,
) -> DataFrame:
    """S1/S2: binary-file scan normalized to the engine's source-doc
    shape.  Reading is lazy — ``content`` is only materialized for rows
    that survive pushed-down path/length predicates."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if skip_empty:
        df = df.filter(F.col("length") > 0)  # dir markers (S1)
    return df.select(
        F.col("path"),
        filename_of(F.col("path")).alias("file_name"),
        extension_of(F.col("path")).alias("extension"),
        F.col("content").alias("bytes"),
        F.col("modificationTime").alias("last_modified"),
        F.col("length").alias("size"),
    )


def read_json_kind_routed(
    spark: SparkSession, base_path: str, kinds: list[str]
) -> DataFrame:
    """S7: NL2SQL-style JSON trees — one read per kind glob, tagged and
    unioned (kind routing via path, reference nl2sql_indexer.py:131-153)."""
    out: DataFrame | None = None
    for kind in kinds:
        df = (
            spark.read.option("multiLine", "true")
            .json(f"{base_path}/{kind}/*.json")
            .withColumn("kind", F.lit(kind))
            .withColumn("src_file", F.input_file_name())
        )
        out = df if out is None else out.unionByName(df, allowMissingColumns=True)
    assert out is not None
    return out
