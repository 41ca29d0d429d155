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


GIANT_FILE_BYTES = 10 * 1024 * 1024  # reference blob_storage_indexer.py:562-579


def read_binary_documents(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    skip_empty: bool = True,
    max_inline_bytes: int | None = None,
) -> DataFrame:
    """S1/S2: binary-file scan normalized to the engine's source-doc
    shape.  Reading is lazy — ``content`` is only materialized for rows
    that survive pushed-down path/length predicates.

    ``max_inline_bytes`` is the giant-file spill analog (the reference
    writes PDFs over 10 MB to a temp file and chunks from the path,
    blob_storage_indexer.py:562-579): files above the threshold come
    back with ``bytes`` NULL and ``deferred`` true from a listing-only
    scan that never reads their payload (binaryFile prunes the content
    column), and ``open_deferred_payloads`` loads them inside the task
    that actually processes them."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    base = reader.load(path)
    if skip_empty:
        base = base.filter(F.col("length") > 0)  # dir markers (S1)

    def shape(df, bytes_col, deferred):
        return df.select(
            F.col("path"),
            filename_of(F.col("path")).alias("file_name"),
            extension_of(F.col("path")).alias("extension"),
            bytes_col.alias("bytes"),
            F.col("modificationTime").alias("last_modified"),
            F.col("length").alias("size"),
            F.lit(deferred).alias("deferred"),
        )

    if max_inline_bytes is None:
        return shape(base, F.col("content"), False)
    small = shape(
        base.filter(F.col("length") <= max_inline_bytes), F.col("content"), False
    )
    # the giant slice selects NO content column -> scan reads metadata only
    giant = shape(
        base.filter(F.col("length") > max_inline_bytes),
        F.lit(None).cast("binary"),
        True,
    )
    return small.unionByName(giant)


def open_deferred_payloads(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """S2 (open-by-path): fill NULL payloads of ``deferred`` rows by
    opening the path INSIDE the task that processes the row — the
    cluster-side analog of the reference's temp-file spill.  Iterator
    mapInPandas, one file in memory at a time per task.  Local and
    ``file:`` paths are handled here; an object-store deployment swaps
    the ``_open`` body for its SDK ranged read."""
    import pandas as pd

    from gpt_rag_ingestion_spark.session import ensure_importable

    ensure_importable(df)

    def _open(p: str) -> bytes:
        local = p[len("file:"):] if p.startswith("file:") else p
        with open(local, "rb") as fh:
            return fh.read()

    schema = df.schema

    def fill(batches):
        for pdf in batches:
            if not pdf.empty:
                need = pdf[bytes_col].isna() & pdf["deferred"]
                pdf.loc[need, bytes_col] = pdf.loc[need, "path"].map(_open)
            yield pdf

    return df.mapInPandas(fill, schema=schema)


def read_site_configs(
    spark: SparkSession,
    path: str,
    type_filter: str | None = "sharepoint_site",
) -> DataFrame:
    """S8: config scan — the reference's ``SELECT * FROM c`` over Cosmos
    followed by a ``type == 'sharepoint_site'`` filter
    (tools/cosmosdb.py:21-37; jobs/sharepoint_indexer.py:253-256) as a
    small JSON read + filter."""
    df = spark.read.option("multiLine", "true").json(path)
    if type_filter and "type" in df.columns:
        df = df.filter(F.col("type") == type_filter)
    return df


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


def read_jsonl_quarantine(
    spark,
    path: str,
    schema: str,
    quarantine_path: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines landing-zone read with CORRUPT-RECORD QUARANTINE —
    the robustness contract a real feed needs (the reference's HTTP
    fetchers retry/skip individual documents; a Spark batch source
    must not let one mangled line abort a 100 TB drain, nor silently
    drop it):

    - good rows parse against ``schema`` (PERMISSIVE mode — the Spark
      default — with an explicit ``_corrupt_record`` capture column),
    - bad rows land in the QUARANTINE frame as (src_file, raw_line)
      for replay/audit, optionally appended to ``quarantine_path``.

    Returns ``(good, quarantined)``.  A row is quarantined iff Spark
    could not parse it against the schema (malformed JSON or type
    conflict); partially-null rows that PARSE stay good — schema
    validation beyond parseability belongs to CHECK constraints at
    the sink.  One scan feeds both frames."""
    full = f"{schema}, _corrupt_record STRING"
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .withColumn("src_file", F.input_file_name())
        # PERMISSIVE corrupt capture is populated lazily per row —
        # cache so the good/bad split reads ONE parse, and so the
        # Spark requirement that a corrupt-record query not select
        # only the corrupt column is satisfied through the split
        .cache()
    )
    good = raw.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record", "src_file"
    )
    quarantined = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        "src_file", F.col("_corrupt_record").alias("raw_line")
    )
    if quarantine_path is not None:
        quarantined.write.mode("append").parquet(quarantine_path)
    return good, quarantined
