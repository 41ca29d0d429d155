"""SharePoint list-item ingestion re-expressed (SURVEY.md §3.3;
reference jobs/sharepoint_indexer.py:1239-1826).

Reference flow per collection: hydrate site configs → iter items
(paged Graph scan) → per item: lookup-field resolution (memo-cached
Graph lookups), include/exclude projection, ACL principals, fields →
body text → embed → delete+upload.

Spark shape — one plan over all collections at once:

    items (crawled landing zone: one row per list item, fields as MAP)
      ⟕ config           (small: broadcast)
      → include/exclude  (P6: map_filter per collection config)
      ⟕ lookup dims      (J7: broadcast hash join per lookup column —
                          the reference's two memo caches ARE the
                          broadcast build side)
      → body text (F18) + ACL parse (F23/A7) + keys (F2/F3)
      → embed (U1) → search docs

The per-item Graph point calls become set-oriented joins; rate limits
and retries live in the crawler that fills the landing zone, not in
the query plan."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gpt_rag_ingestion_spark.embeddings import hash_embedding_udf
from gpt_rag_ingestion_spark.functions.acl import parse_acl_ids
from gpt_rag_ingestion_spark.functions.keys import chunk_key, sanitize_key
from gpt_rag_ingestion_spark.operators.projection import (
    fields_map_to_text,
    include_exclude_fields,
)
from gpt_rag_ingestion_spark.session import ensure_importable


def resolve_lookups(
    items: DataFrame,
    lookups: dict[str, DataFrame],
    fields_col: str = "fields",
) -> DataFrame:
    """J7: for each lookup column, replace the stored foreign id with the
    display value from the target list — a broadcast join per lookup
    dimension.  ``lookups`` maps field name -> DataFrame(lookup_id,
    lookup_value)."""
    out = items
    for field, dim in lookups.items():
        d = F.broadcast(
            dim.select(
                F.col("lookup_id").cast("string").alias(f"_lk_{field}_id"),
                F.col("lookup_value").alias(f"_lk_{field}_val"),
            )
        )
        out = (
            out.join(
                d,
                out[fields_col].getItem(field) == d[f"_lk_{field}_id"],
                "left",
            )
            .withColumn(
                fields_col,
                F.when(
                    F.col(f"_lk_{field}_val").isNotNull(),
                    F.map_concat(
                        F.map_filter(F.col(fields_col), lambda k, _v: k != field),
                        F.create_map(F.lit(field), F.col(f"_lk_{field}_val")),
                    ),
                ).otherwise(F.col(fields_col)),
            )
            .drop(f"_lk_{field}_id", f"_lk_{field}_val")
        )
    return out


SHAREPOINT_FILES_FORMAT = ["pdf", "docx", "pptx"]  # reference sharepoint_indexer.py:86-88


def sharepoint_attachments_to_docs(
    attachments: DataFrame,
    allowed_exts: list[str] | None = None,
    embedding_dim: int = 64,
    max_tokens: int = 2048,
    overlap: int = 200,
    min_tokens: int = 10,
) -> DataFrame:
    """Document-library / attachment path (reference
    jobs/sharepoint_indexer.py:969-1074 + ``_doc_for_attachment_chunk``
    :943-967): drive-item payloads run through the full DocumentChunker
    (here: chunk_corpus, the same per-extension dispatch) and every
    chunk becomes a search doc keyed by
    site/list/item/file (``_make_parent_key``), source
    ``sharepoint-list``, ``filepath=""`` like the reference.

    ``attachments``: (site, list_id, item_id, file_name,
    payload BINARY, last_modified, web_url?, user_acl_str?,
    group_acl_str?, category?).  The extension allow-list (P4,
    SHAREPOINT_FILES_FORMAT) filters before any chunking work.

    Plan shape: allow-list filter -> chunk_corpus (narrow UDF maps) ->
    one equi-join back to the per-file metadata on parent_id (the
    metadata side is one row per FILE — orders of magnitude smaller
    than the chunk side)."""
    from gpt_rag_ingestion_spark.chunking.corpus import chunk_corpus
    from gpt_rag_ingestion_spark.functions.text import extension_of

    ensure_importable(attachments)
    allowed = [e.lower() for e in (allowed_exts or SHAREPOINT_FILES_FORMAT)]
    cols = set(attachments.columns)

    def opt(c, typ="string"):
        return F.col(c) if c in cols else F.lit(None).cast(typ)

    flt = attachments.withColumn("_ext", extension_of(F.col("file_name"))).filter(
        F.col("_ext").isin(allowed)  # P4 extension allow-list
    )
    doc_key = F.concat_ws(
        "/",
        F.col("site"),
        F.col("list_id"),
        F.col("item_id").cast("string"),
        F.col("file_name"),
    )
    src = flt.select(
        doc_key.alias("doc_key"),
        F.col("_ext").alias("extension"),
        F.col("payload"),
    )
    meta = flt.select(
        sanitize_key(doc_key).alias("parent_id"),
        F.col("file_name"),
        F.col("last_modified"),
        opt("web_url").alias("web_url"),
        opt("user_acl_str").alias("user_acl_str"),
        opt("group_acl_str").alias("group_acl_str"),
        opt("category").alias("category"),
    )
    chunks = chunk_corpus(
        src,
        embedding_dim=embedding_dim,
        max_tokens=max_tokens,
        overlap=overlap,
        min_tokens=min_tokens,
    )
    j = chunks.join(meta, on="parent_id")
    return j.select(
        F.col("id"),
        F.col("parent_id"),
        F.col("parent_id").alias("metadata_storage_path"),
        F.col("file_name").alias("metadata_storage_name"),
        F.col("last_modified").alias("metadata_storage_last_modified"),
        F.coalesce(parse_acl_ids("user_acl_str"), F.array()).alias(
            "metadata_security_user_ids"
        ),
        F.coalesce(parse_acl_ids("group_acl_str"), F.array()).alias(
            "metadata_security_group_ids"
        ),
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.coalesce(F.col("page"), F.lit(0)).cast("int").alias("page"),
        F.coalesce(F.col("offset"), F.lit(0)).cast("long").alias("offset"),
        F.col("length").cast("int").alias("length"),
        F.coalesce(F.col("title"), F.lit("")).alias("title"),
        F.coalesce(F.col("web_url"), F.lit("")).alias("url"),
        F.col("content"),
        F.col("contentVector"),
        F.coalesce(F.col("summary"), F.lit("")).alias("summary"),
        F.coalesce(F.col("category"), F.lit("")).alias("category"),
        F.lit("").alias("filepath"),  # reference :965 sets "" for attachments
        F.lit("sharepoint-list").alias("source"),
    )


def sharepoint_ingest_docs(
    items: DataFrame,
    attachments: DataFrame | None = None,
    lookups: dict[str, DataFrame] | None = None,
    include_fields: list[str] | None = None,
    exclude_fields: list[str] | None = None,
    allowed_exts: list[str] | None = None,
    embedding_dim: int = 64,
) -> DataFrame:
    """§3.3 composed: list-item BODY docs (single-chunk) unioned with
    document-library ATTACHMENT chunk docs under one schema — the
    reference uploads both through the same index (sharepoint_indexer
    :1565-1588 bodies, :1030-1074 attachments)."""
    bodies = sharepoint_items_to_docs(
        items,
        lookups=lookups,
        include_fields=include_fields,
        exclude_fields=exclude_fields,
        embedding_dim=embedding_dim,
    )
    if attachments is None:
        return bodies
    atts = sharepoint_attachments_to_docs(
        attachments, allowed_exts=allowed_exts, embedding_dim=embedding_dim
    )
    return bodies.unionByName(atts, allowMissingColumns=True)


def sharepoint_items_to_docs(
    items: DataFrame,
    lookups: dict[str, DataFrame] | None = None,
    include_fields: list[str] | None = None,
    exclude_fields: list[str] | None = None,
    embedding_dim: int = 64,
) -> DataFrame:
    """items(site, list_id, item_id, fields MAP, last_modified,
    user_acl_str?, group_acl_str?) -> one search doc per item (list-item
    bodies are single-chunk docs, reference :905-929)."""
    ensure_importable(items)
    embed = hash_embedding_udf(embedding_dim)

    out = items
    if lookups:
        out = resolve_lookups(out, lookups)
    out = include_exclude_fields(
        out, "fields", include=include_fields, exclude=exclude_fields
    )

    parent = sanitize_key(
        F.concat_ws(
            "/", F.col("site"), F.col("list_id"), F.col("item_id").cast("string")
        )
    )
    body = fields_map_to_text("fields")
    cols = set(items.columns)
    return (
        out.withColumn("parent_id", parent)
        .withColumn("content", body)
        .select(
            chunk_key(F.col("parent_id"), F.lit(0)).alias("id"),
            "parent_id",
            F.col("last_modified").alias("metadata_storage_last_modified"),
            (
                parse_acl_ids("user_acl_str")
                if "user_acl_str" in cols
                else F.lit(None).cast("array<string>")
            ).alias("metadata_security_user_ids"),
            (
                parse_acl_ids("group_acl_str")
                if "group_acl_str" in cols
                else F.lit(None).cast("array<string>")
            ).alias("metadata_security_group_ids"),
            F.lit(0).alias("chunk_id"),
            "content",
            F.length("content").alias("length"),
            F.lit("sharepoint-list").alias("source"),
            embed(F.col("content")).alias("contentVector"),
        )
    )
