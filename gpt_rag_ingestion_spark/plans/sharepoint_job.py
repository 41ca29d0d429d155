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


# --------------------------------------------------------------- S8:
# config-DataFrame-driven hydration (reference
# jobs/sharepoint_indexer.py:231-368 loads `sharepoint_site` documents
# from a config container and normalizes them into collection specs).

SITE_CONFIG_SCHEMA = (
    "type STRING, siteDomain STRING, siteName STRING, category STRING, "
    "lists ARRAY<STRUCT<listId STRING, listName STRING, filter STRING, "
    "includeFields ARRAY<STRING>, excludeFields ARRAY<STRING>, "
    "category STRING, listType STRING>>"
)


def parse_site_configs(configs: DataFrame, doc_col: str = "doc") -> DataFrame:
    """S8: normalize raw site-config documents (one JSON string per
    row, the landing-zone image of the reference's config container)
    into one row per valid (site, list) collection — the relational
    twin of ``_parse_collections`` (reference sharepoint_indexer.py:
    275-368), validation rules included:

    - only ``type == 'sharepoint_site'`` docs with non-blank
      siteDomain/siteName and a ``lists`` array survive;
    - a list needs listId or listName;
    - includeFields: trimmed, blanks dropped, first-occurrence dedup
      (``array_distinct``), null when absent;
    - excludeFields: trimmed/blank-dropped, ``[]`` when absent;
    - category: list-level, else site-level, else '';
    - listType: 'document_library' recognized case-insensitively,
      anything else (including invalid values) defaults to
      'generic_list' (:333-349).

    ``filter`` is carried through verbatim: it is an OData predicate
    the CRAWLER pushes into the Graph query when filling the landing
    zone (F24/SURVEY — not evaluated here).  Output: (site_domain,
    site_name, site, list_id, list_name, filter, include_fields,
    exclude_fields, category, list_type) where ``site`` =
    'domain/name', the key the landing-zone items carry.

    Accepts either one JSON string per row under ``doc_col`` OR the
    structured rows ``sources.read_site_configs`` produces
    (spark.read.json of the config container) — the structured form is
    re-serialized so both enter the same normalization."""
    if doc_col not in configs.columns and "siteDomain" in configs.columns:
        configs = configs.select(
            F.to_json(F.struct(*configs.columns)).alias(doc_col)
        )
    c = F.from_json(F.col(doc_col), SITE_CONFIG_SCHEMA)
    sites = (
        configs.select(c.alias("c"))
        .filter(
            (F.lower(F.trim(F.coalesce(F.col("c.type"), F.lit("")))) == "sharepoint_site")
            & (F.trim(F.coalesce(F.col("c.siteDomain"), F.lit(""))) != "")
            & (F.trim(F.coalesce(F.col("c.siteName"), F.lit(""))) != "")
            & F.col("c.lists").isNotNull()
        )
        .select(
            F.trim("c.siteDomain").alias("site_domain"),
            F.trim("c.siteName").alias("site_name"),
            F.trim(F.coalesce(F.col("c.category"), F.lit(""))).alias("_site_cat"),
            F.explode("c.lists").alias("l"),
        )
    )
    clean = lambda col: F.array_distinct(  # noqa: E731
        F.filter(
            F.transform(col, lambda x: F.trim(x)), lambda x: x != ""
        )
    )
    list_id = F.nullif(F.trim(F.coalesce(F.col("l.listId"), F.lit(""))), F.lit(""))
    list_name = F.nullif(F.trim(F.coalesce(F.col("l.listName"), F.lit(""))), F.lit(""))
    lt = F.lower(F.trim(F.coalesce(F.col("l.listType"), F.lit(""))))
    return (
        sites.filter(list_id.isNotNull() | list_name.isNotNull())
        .select(
            "site_domain",
            "site_name",
            F.concat_ws("/", "site_domain", "site_name").alias("site"),
            list_id.alias("list_id"),
            list_name.alias("list_name"),
            F.nullif(
                F.trim(F.coalesce(F.col("l.filter"), F.lit(""))), F.lit("")
            ).alias("filter"),
            F.when(
                F.col("l.includeFields").isNotNull(),
                clean(F.col("l.includeFields")),
            ).alias("include_fields"),
            F.coalesce(
                clean(F.col("l.excludeFields")),
                F.array().cast("array<string>"),
            ).alias("exclude_fields"),
            F.coalesce(
                F.nullif(F.trim(F.coalesce(F.col("l.category"), F.lit(""))), F.lit("")),
                F.nullif(F.col("_site_cat"), F.lit("")),
                F.lit(""),
            ).alias("category"),
            F.when(lt == "document_library", F.lit("document_library"))
            .otherwise(F.lit("generic_list"))
            .alias("list_type"),
        )
    )


def sharepoint_ingest_from_config(
    configs: DataFrame,
    items: DataFrame,
    attachments: DataFrame | None = None,
    lookups: dict[str, DataFrame] | None = None,
    allowed_exts: list[str] | None = None,
    embedding_dim: int = 64,
    doc_col: str = "doc",
    list_name_dim: DataFrame | None = None,
) -> DataFrame:
    """§3.3/S8 composed, config-DataFrame-driven: hydrate collection
    specs from the config documents and drive BOTH ingestion paths for
    every configured collection in ONE plan — no per-collection driver
    loop:

    - generic_list collections: items ⨝ config (broadcast — config is
      bounded by the number of configured lists), per-ROW
      include/exclude projection, then the body-doc mapping;
    - document_library collections: attachments ⨝ config (broadcast),
      config category attached (item-level category wins when present),
      then the attachment chunk pipeline.

    Unconfigured (site, list) rows never enter either branch — the
    inner join IS the reference's 'iterate configured collections'
    (sharepoint_indexer.py:1239-1311).

    Legacy listName-only config rows (parse_site_configs admits them,
    mirroring the reference's Graph-lookup fallback,
    sharepoint_indexer.py:310-315) must resolve to a list_id before the
    item join: pass ``list_name_dim`` — (site, list_name, list_id),
    the landing-zone image of the Graph list catalog.  Rows that stay
    unresolved raise instead of silently ingesting nothing."""
    from gpt_rag_ingestion_spark.operators.projection import (
        include_exclude_fields_by_cols,
    )

    cols = parse_site_configs(configs, doc_col=doc_col)
    if list_name_dim is not None:
        dim = F.broadcast(
            list_name_dim.select(
                "site",
                F.col("list_name").alias("_ln"),
                F.col("list_id").alias("_resolved_id"),
            )
        )
        cols = (
            cols.join(
                dim,
                (cols["site"] == dim["site"]) & (cols["list_name"] == dim["_ln"]),
                "left",
            )
            .drop(dim["site"])
            .withColumn(
                "list_id", F.coalesce(F.col("list_id"), F.col("_resolved_id"))
            )
            .drop("_ln", "_resolved_id")
        )
    unresolved = [
        (r["site"], r["list_name"])
        for r in cols.filter(F.col("list_id").isNull())
        .select("site", "list_name")
        .collect()
    ]
    if unresolved:
        raise ValueError(
            "config rows with listName but no resolvable listId "
            f"(pass list_name_dim to resolve them): {unresolved}"
        )

    # a collection configured in TWO site-config docs must not ingest
    # twice (advisor finding r3): identical specs collapse; CONFLICTING
    # specs for the same (site, list_id) raise rather than silently
    # picking one
    cols = cols.dropDuplicates()
    conflicts = [
        (r["site"], r["list_id"])
        for r in cols.groupBy("site", "list_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .collect()
    ]
    if conflicts:
        raise ValueError(
            "conflicting duplicate config specs for collections "
            f"(same site/list, different fields): {conflicts}"
        )

    generic = cols.filter(F.col("list_type") == "generic_list").select(
        "site", "list_id", "include_fields", "exclude_fields",
        F.col("category").alias("_cfg_category"),
    )
    body_items = items.join(F.broadcast(generic), on=["site", "list_id"])
    body_items = include_exclude_fields_by_cols(
        body_items, "fields", "include_fields", "exclude_fields"
    )
    body_items = body_items.withColumn(
        "category",
        F.coalesce(
            *( [F.nullif(F.col("category"), F.lit(""))] if "category" in items.columns else [] ),
            F.col("_cfg_category"),
        ),
    ).drop("include_fields", "exclude_fields", "_cfg_category")
    bodies = sharepoint_items_to_docs(
        body_items, lookups=lookups, embedding_dim=embedding_dim
    )

    if attachments is None:
        return bodies
    libs = cols.filter(F.col("list_type") == "document_library").select(
        "site", "list_id", F.col("category").alias("_cfg_category")
    )
    att = attachments.join(F.broadcast(libs), on=["site", "list_id"])
    att = att.withColumn(
        "category",
        F.coalesce(
            *( [F.nullif(F.col("category"), F.lit(""))] if "category" in attachments.columns else [] ),
            F.col("_cfg_category"),
        ),
    ).drop("_cfg_category")
    atts = sharepoint_attachments_to_docs(
        att, allowed_exts=allowed_exts, embedding_dim=embedding_dim
    )
    return bodies.unionByName(atts, allowMissingColumns=True)


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
    user_acl_str?, group_acl_str?, category?) -> one search doc per item
    (list-item bodies are single-chunk docs, reference :905-929).  A
    ``category`` column (e.g. attached by the config-driven hydration)
    rides through to the docs."""
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
            (
                F.coalesce(F.col("category"), F.lit(""))
                if "category" in cols
                else F.lit("")
            ).alias("category"),
            F.lit("sharepoint-list").alias("source"),
            embed(F.col("content")).alias("contentVector"),
        )
    )
