"""Crawler landing-zone contracts — the explicit boundary between the
out-of-scope crawlers (Graph/Blob/Cosmos clients with paging, retry,
rate limits: reference jobs/sharepoint_graph_client.py:177-227,
tools/blob.py:71-104, tools/cosmosdb.py:21-37) and this engine's
set-oriented plans.

A crawler fills a landing zone; every job here consumes one.  The
schemas below are the REQUIRED columns per source family (extra
columns pass through untouched) and mirror the reference fields noted
inline.  `assert_landing_schema` is the cheap handshake: call it at
the top of a job or test to fail fast with a per-column diff instead
of a mid-plan resolution error.  LANDING_ZONE.md (repo root) is the prose
version crawler authors read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: family -> {column: tuple of acceptable Spark simpleString types}.
#: Integer widths are deliberately permissive (crawlers write what
#: their JSON/parquet writers infer); engine code casts at use sites.
_INT = ("int", "bigint", "smallint")
LANDING_SCHEMAS: dict[str, dict[str, tuple[str, ...]]] = {
    # one row per SharePoint list item; `fields` is the $expand=fields
    # $select=... projection the crawler pushed (reference
    # sharepoint_graph_client.py:177-227), stringified values
    "sharepoint_items": {
        "site": ("string",),          # 'domain/name' key (indexer:316-329)
        "list_id": ("string",),
        "item_id": _INT,
        "fields": ("map<string,string>",),
        "last_modified": ("timestamp", "timestamp_ntz"),
    },
    # one row per drive-item / attachment payload (S5)
    "sharepoint_attachments": {
        "site": ("string",),
        "list_id": ("string",),
        "item_id": _INT,
        "file_name": ("string",),
        "payload": ("binary",),
        "last_modified": ("timestamp", "timestamp_ntz"),
    },
    # one row per site-config document, raw JSON string (S8; the
    # reference's Cosmos `SELECT * FROM c` image).  read_site_configs'
    # structured form is also accepted by parse_site_configs directly.
    "site_configs": {
        "doc": ("string",),
    },
    # listName -> listId resolution catalog (legacy configs; the
    # landing-zone image of the Graph list lookup, indexer:310-315)
    "sharepoint_list_catalog": {
        "site": ("string",),
        "list_name": ("string",),
        "list_id": ("string",),
    },
    # binary-file scan output shape (S1/S2) — produced by
    # read_binary_documents, consumed by the chunk pipeline
    "binary_documents": {
        "path": ("string",),
        "file_name": ("string",),
        "extension": ("string",),
        "bytes": ("binary",),
        "last_modified": ("timestamp", "timestamp_ntz"),
        "size": _INT + ("bigint",),
        "deferred": ("boolean",),
    },
    # crawl batches for the web-corpus admission loop
    "web_crawl": {
        "doc_id": _INT,
        "url": ("string",),
        "text": ("string",),
    },
    # embedding batches for the streaming IVF maintainer
    "vectors": {
        "vec_id": _INT,
        "embedding": ("array<float>", "array<double>"),
    },
}


def assert_landing_schema(df: DataFrame, family: str) -> DataFrame:
    """Validate ``df`` against the landing-zone contract for
    ``family``; returns ``df`` unchanged on success, raises ValueError
    naming every missing/mistyped column otherwise.  Extra columns are
    allowed (crawlers may carry provenance)."""
    if family not in LANDING_SCHEMAS:
        raise ValueError(
            f"unknown landing-zone family {family!r}; "
            f"known: {sorted(LANDING_SCHEMAS)}"
        )
    want = LANDING_SCHEMAS[family]
    have = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    problems = []
    for col, types in want.items():
        if col not in have:
            problems.append(f"missing column {col!r} (want {'|'.join(types)})")
        elif have[col] not in types:
            problems.append(
                f"column {col!r} has type {have[col]}, want {'|'.join(types)}"
            )
    if problems:
        raise ValueError(
            f"landing-zone contract violation for {family!r}: "
            + "; ".join(problems)
        )
    return df
