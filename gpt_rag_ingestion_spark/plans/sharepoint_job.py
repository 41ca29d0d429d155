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
