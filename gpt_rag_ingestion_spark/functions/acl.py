"""ACL parsing + capping (SURVEY.md F23, A7).

Reference parses security-id strings three ways — JSON array, Python
literal, bracket-stripped CSV — then dedups order-preserving and caps at
32 ids (reference jobs/blob_storage_indexer.py:1442-1508).

Implemented as a pure column expression: try ``from_json``; when that
yields NULL fall back to bracket/quote-strip + split on ``[,;]``.
Dedup+cap via ``array_distinct`` + ``slice`` — no Python involved.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ACL_MAX_IDS = 32  # AI Search field limit, reference blob_storage_indexer.py:1484-1506


def parse_acl_ids(col: Column | str, cap: int = ACL_MAX_IDS) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    as_json = F.from_json(c, "array<string>")
    stripped = F.regexp_replace(c, r"[\[\]'\"\s]", "")
    as_csv = F.filter(F.split(stripped, "[,;]"), lambda x: x != "")
    parsed = F.coalesce(as_json, as_csv, F.array())
    cleaned = F.filter(
        F.transform(parsed, lambda x: F.trim(F.regexp_replace(x, "['\"]", ""))),
        lambda x: x != "",
    )
    return F.slice(F.array_distinct(cleaned), 1, cap)


# roles that grant read visibility (reference tools/sharepoint.py:469)
READ_ROLES = ("read", "write")


def read_access_entities(perms: Column | str, cap: int = ACL_MAX_IDS) -> Column:
    """Drive-item permissions → ordered-distinct reader ids (reference
    tools/sharepoint.py:464-476 ``_get_read_access_entities``): keep
    grants whose ``roles`` include read or write, take their user ids
    in grant order, dedup preserving first occurrence, cap like every
    other ACL list (A7).

    ``perms`` is an ``ARRAY<STRUCT<roles: ARRAY<STRING>,
    user_ids: ARRAY<STRING>>>`` column (the Graph response's
    ``grantedToIdentitiesV2`` flattened to ids).  Pure column algebra —
    filter + flatten + array_distinct, no Python."""
    c = F.col(perms) if isinstance(perms, str) else perms
    readable = F.filter(
        c,
        lambda p: F.arrays_overlap(
            p["roles"], F.array(*[F.lit(r) for r in READ_ROLES])
        ),
    )
    # flatten() returns NULL if ANY element array is null — one grant
    # with no resolvable ids must not null the whole ACL, so coalesce
    # each grant's id list to [] first
    ids = F.flatten(
        F.transform(
            readable,
            lambda p: F.coalesce(p["user_ids"], F.array().cast("array<string>")),
        )
    )
    cleaned = F.filter(ids, lambda x: x.isNotNull() & (x != ""))
    return F.slice(F.array_distinct(cleaned), 1, cap)
