"""Deterministic document / chunk keys (SURVEY.md F1-F3).

Reference behavior being re-expressed:
- key sanitization ``[^A-Za-z0-9_\\-=]+ -> '-'``, collapse runs, trim
  (reference jobs/blob_storage_indexer.py:1402-1412,
  jobs/sharepoint_ingestion_config.py:122-125).
- stable chunk key ``f"{base}-c{chunk_id:05d}"`` with a hash suffix when
  the base exceeds 128 chars (reference jobs/blob_storage_indexer.py:1414-1427).
  The reference uses sha1; we use sha256 (sha1 is not universally
  available in oracle engines and sha256 is the stronger public choice) —
  same semantics: deterministic, collision-safe truncation.
- ``parent_id = "/container/blob"`` multi-part key
  (reference jobs/blob_storage_indexer.py:1398-1400).

All pure column expressions — they run in whole-stage codegen and
vectorize across 100 TB without a Python round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: chars NOT allowed in an index key (reference allows [A-Za-z0-9_\-=]).
_INVALID = "[^A-Za-z0-9_=-]+"

MAX_KEY_BASE_LEN = 128
HASH_SUFFIX_LEN = 8


#: canonical 8-4-4-4-12 UUID (reference sharepoint_graph_client.py:384-390
#: accepts anything uuid.UUID parses; Graph site/list ids are canonical)
_GUID_REGEX = (
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-"
    "[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
)


def is_valid_guid(col: Column | str) -> Column:
    """F25: GUID validation as one rlike expression."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(_GUID_REGEX)


def sanitize_key(col: Column | str) -> Column:
    """F1: replace invalid runs with '-', collapse, trim leading/trailing '-'."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _INVALID, "-")
    c = F.regexp_replace(c, "-{2,}", "-")
    c = F.regexp_replace(c, "(^-+)|(-+$)", "")
    return c


def chunk_key(parent: Column | str, chunk_id: Column | str) -> Column:
    """F2: ``{sanitized_base}-c{chunk_id:05d}``; bases >128 chars are
    truncated to 128 and suffixed with 8 hex chars of sha256(base) so the
    key stays unique and within index-key limits."""
    base = sanitize_key(parent)
    cid = F.col(chunk_id) if isinstance(chunk_id, str) else chunk_id
    short = F.when(
        F.length(base) > MAX_KEY_BASE_LEN,
        F.concat(
            F.substring(base, 1, MAX_KEY_BASE_LEN),
            F.lit("-"),
            F.substring(F.sha2(base, 256), 1, HASH_SUFFIX_LEN),
        ),
    ).otherwise(base)
    return F.concat(short, F.lit("-c"), F.format_string("%05d", cid))


def parent_key(*parts: Column | str) -> Column:
    """F3: ``/part1/part2/...`` path-style parent key."""
    cols = [F.col(p) if isinstance(p, str) else p for p in parts]
    return F.concat(F.lit("/"), F.concat_ws("/", *cols))
