"""Chunk rows -> full search-doc schema (SURVEY.md §1.1, §3.1h;
reference jobs/blob_storage_indexer.py:779-818 ``_to_search_doc``).

Maps pipeline chunk rows onto the engine's canonical CHUNK_SCHEMA:
deterministic ids (F2), ``/container/name`` parent paths (F3), titles
from filenames (F4), parsed+capped ACLs (F23/A7), the ``source``
discriminator, and the reference's observable defaults — zero-vector
``captionVector`` (base_chunker.py:228) and empty related-file arrays.
All column algebra except the embedding already present on the rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gpt_rag_ingestion_spark.embeddings import zero_vector
from gpt_rag_ingestion_spark.functions.acl import parse_acl_ids
from gpt_rag_ingestion_spark.functions.keys import chunk_key
from gpt_rag_ingestion_spark.functions.text import filename_of, title_from_filename
from gpt_rag_ingestion_spark.schemas import CHUNK_SCHEMA


def to_search_docs(
    chunks: DataFrame,
    path_col: str = "path",
    ts_col: str = "last_modified",
    user_acl_col: str | None = None,
    group_acl_col: str | None = None,
    rbac_scope_col: str | None = None,
    source: str = "blob",
    category: str | None = None,
    embedding_dim: int = 64,
) -> DataFrame:
    """Rows with (parent_id, chunk_id, content, offset, length, page?,
    contentVector, <path_col>, <ts_col>, ACL string cols?) -> the full
    CHUNK_SCHEMA column set, in schema order."""
    cols = set(chunks.columns)

    def have(c):
        return c is not None and c in cols

    name = filename_of(F.col(path_col)) if have(path_col) else F.lit(None)
    zero_vec = F.array(*[F.lit(0.0) for _ in range(embedding_dim)]).cast(
        "array<float>"
    )

    # Reference `_to_search_doc` defaults (blob_storage_indexer.py:793-818):
    # metadata_storage_path mirrors parent_id (NOT the raw url), page and
    # offset default to 0, string fields default to "", ACL/related
    # arrays default to [], filepath falls back to parent_id.
    empty_arr = F.array().cast("array<string>")
    out = chunks.select(
        chunk_key(F.col("parent_id"), F.col("chunk_id")).alias("id"),
        F.col("parent_id"),
        F.col("parent_id").alias("metadata_storage_path"),
        name.cast("string").alias("metadata_storage_name"),
        (
            F.col(ts_col) if have(ts_col) else F.lit(None).cast("timestamp")
        ).alias("metadata_storage_last_modified"),
        (
            parse_acl_ids(user_acl_col) if have(user_acl_col) else empty_arr
        ).alias("metadata_security_user_ids"),
        (
            parse_acl_ids(group_acl_col) if have(group_acl_col) else empty_arr
        ).alias("metadata_security_group_ids"),
        F.coalesce(
            F.col(rbac_scope_col) if have(rbac_scope_col) else F.lit(None), F.lit("")
        ).cast("string").alias("metadata_security_rbac_scope"),
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.coalesce(F.col("page") if "page" in cols else F.lit(None), F.lit(0))
        .cast("int")
        .alias("page"),
        F.coalesce(F.col("offset"), F.lit(0)).cast("long").alias("offset"),
        F.col("length").cast("int").alias("length"),
        F.col("content"),
        F.lit("").alias("imageCaptions"),
        F.coalesce(title_from_filename(name), F.lit("")).cast("string").alias("title"),
        F.lit(category if category is not None else "").cast("string").alias(
            "category"
        ),
        F.coalesce(name, F.col("parent_id")).cast("string").alias("filepath"),
        (F.col(path_col) if have(path_col) else F.lit(None).cast("string")).alias(
            "url"
        ),
        F.lit("").alias("summary"),
        empty_arr.alias("relatedImages"),
        empty_arr.alias("relatedFiles"),
        F.lit(source).alias("source"),
        F.col("contentVector").cast("array<float>").alias("contentVector"),
        zero_vec.alias("captionVector"),  # reference base_chunker.py:228
    )
    return out


def assert_chunk_schema(df: DataFrame) -> None:
    """Column names/order must match CHUNK_SCHEMA exactly."""
    expected = [f.name for f in CHUNK_SCHEMA.fields]
    got = df.columns
    if got != expected:
        raise AssertionError(f"schema mismatch:\n got {got}\n expected {expected}")
