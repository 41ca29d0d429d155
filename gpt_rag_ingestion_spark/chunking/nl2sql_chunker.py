"""NL2SQL metadata chunker (SURVEY.md C7, S7; reference
chunking/chunkers/nl2sql_chunker.py:10-78, jobs/nl2sql_indexer.py).

A ``.nl2sql`` document is a JSON object; the reference emits one chunk
per top-level key with pretty-printed JSON content, and embeds the
``question`` field when present (not the content).  The three metadata
kinds (queries/tables/measures) land in three small tables
(schemas.NL2SQL_*_SCHEMA).
"""

from __future__ import annotations

import json


def chunk_nl2sql_text(raw: str) -> list[dict]:
    """One chunk per top-level key; content = pretty JSON of the value;
    embed_text = the value's ``question`` field when present, else the
    content (reference nl2sql_chunker.py:53-78)."""
    try:
        obj = json.loads(raw)
    except (json.JSONDecodeError, TypeError):
        return []
    if not isinstance(obj, dict):
        obj = {"root": obj}
    out = []
    for i, (key, value) in enumerate(obj.items()):
        content = json.dumps(value, indent=2, ensure_ascii=False)
        embed_text = (
            value.get("question") if isinstance(value, dict) and value.get("question")
            else content
        )
        out.append(
            {
                "chunk_id": i,
                "key": key,
                "content": content,
                "embed_text": embed_text,
            }
        )
    return out
