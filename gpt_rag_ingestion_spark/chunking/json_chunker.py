"""Recursive structure-preserving JSON partitioner (SURVEY.md C6/F22).

Re-expression of the reference's JSONChunker: greedily bin-pack list
items / dict entries so each pretty-printed part stays under a token
budget, recursing into oversize elements; every emitted part is itself
valid JSON (reference chunking/chunkers/json_chunker.py:74-147).

Genuinely non-relational (recursive, structural), so it runs as a plain
Python function inside the chunk pandas UDF — Arrow-batched, one call
per document, per SURVEY.md §7.
"""

from __future__ import annotations

import json
import re

_TOKEN_RE = re.compile(r"\w+|[^\w\s]")


def _ntokens(s: str) -> int:
    return len(_TOKEN_RE.findall(s))


def _dump(obj) -> str:
    return json.dumps(obj, indent=2, ensure_ascii=False)


def partition_json(obj, max_tokens: int = 2048) -> list[str]:
    """Partition a parsed JSON value into pretty-printed parts each under
    ``max_tokens`` (approx tokens).  Lists split into runs of items;
    dicts into runs of entries; oversize single elements recurse."""
    text = _dump(obj)
    if _ntokens(text) <= max_tokens:
        return [text]

    if isinstance(obj, list):
        parts: list[str] = []
        bucket: list = []
        for item in obj:
            cand = bucket + [item]
            if bucket and _ntokens(_dump(cand)) > max_tokens:
                parts.extend(_flush_list(bucket, max_tokens))
                bucket = [item]
            else:
                bucket = cand
        if bucket:
            parts.extend(_flush_list(bucket, max_tokens))
        return parts

    if isinstance(obj, dict):
        parts = []
        bucket: dict = {}
        for k, v in obj.items():
            cand = dict(bucket)
            cand[k] = v
            if bucket and _ntokens(_dump(cand)) > max_tokens:
                parts.extend(_flush_dict(bucket, max_tokens))
                bucket = {k: v}
            else:
                bucket = cand
        if bucket:
            parts.extend(_flush_dict(bucket, max_tokens))
        return parts

    # scalar too large (giant string): split the STRING VALUE and dump
    # each segment, so every part remains valid JSON (module contract)
    out = []
    step = max(1, max_tokens * 4)  # ~chars per part
    if isinstance(obj, str):
        for i in range(0, len(obj), step):
            out.append(_dump(obj[i : i + step]))
        return out
    return [text]  # non-string scalars can't exceed any sane budget


def _flush_list(bucket: list, max_tokens: int) -> list[str]:
    if len(bucket) == 1 and _ntokens(_dump(bucket)) > max_tokens:
        return partition_json(bucket[0], max_tokens)
    return [_dump(bucket)]


def _flush_dict(bucket: dict, max_tokens: int) -> list[str]:
    if len(bucket) == 1 and _ntokens(_dump(bucket)) > max_tokens:
        (k, v), = bucket.items()
        # keep the key: each sub-part is re-wrapped under it so no
        # structural information is lost
        return [
            "{" + json.dumps(k, ensure_ascii=False) + ": " + p + "}"
            for p in partition_json(v, max_tokens)
        ]
    return [_dump(bucket)]


def chunk_json_text(raw: str, max_tokens: int = 2048) -> list[str]:
    """Entry point used by the chunk UDF: parse + partition; invalid JSON
    degrades to a single raw-text chunk (reference json_chunker.py:38-54)."""
    try:
        obj = json.loads(raw)
    except (json.JSONDecodeError, TypeError):
        return [raw] if raw else []
    return partition_json(obj, max_tokens)
