"""Markdown/HTML structural helpers (SURVEY.md F14, F15, F18).

Pure-Python sequential transforms used inside chunk UDFs (the
reference applies them per document before splitting):

- F14: swap ``<table>…</table>`` blocks for placeholders so the
  splitter never cuts a table in half, then restore
  (reference doc_analysis_chunker.py:338-369).
- F15: rewrite anonymous ``<figure>…</figure>`` spans to sequentially
  numbered ``<figureN>`` tags (reference multimodal_chunker.py:113-145).
- F18: item fields -> "k: v" text lines, dicts as JSON, lists
  comma-joined (reference sharepoint_indexer.py:797-810).
"""

from __future__ import annotations

import json
import re

_TABLE_RE = re.compile(r"<table>.*?</table>", re.DOTALL | re.IGNORECASE)
_FIGURE_RE = re.compile(r"<figure>(.*?)</figure>", re.DOTALL | re.IGNORECASE)

TABLE_PLACEHOLDER = "\x02TBL{}\x03"


def extract_tables(text: str) -> tuple[str, list[str]]:
    """F14 (swap): replace each table block with a placeholder; returns
    (swapped_text, tables)."""
    tables: list[str] = []

    def repl(m) -> str:
        tables.append(m.group(0))
        return TABLE_PLACEHOLDER.format(len(tables) - 1)

    return _TABLE_RE.sub(repl, text), tables


def restore_tables(text: str, tables: list[str]) -> str:
    """F14 (restore)."""
    for i, t in enumerate(tables):
        text = text.replace(TABLE_PLACEHOLDER.format(i), t)
    return text


def number_figures(text: str, start: int = 1) -> tuple[str, int]:
    """F15: ``<figure>body</figure>`` -> ``<figureN>body</figureN>``
    sequentially; returns (rewritten, next_figure_number)."""
    counter = [start - 1]

    def repl(m) -> str:
        counter[0] += 1
        return f"<figure{counter[0]}>{m.group(1)}</figure{counter[0]}>"

    return _FIGURE_RE.sub(repl, text), counter[0] + 1


def fields_to_text(fields: dict, exclude: set[str] | None = None) -> str:
    """F18: dict -> "k: v" lines; nested dicts as compact JSON, lists
    comma-joined; excluded/empty fields dropped."""
    exclude = exclude or set()
    lines = []
    for k, v in fields.items():
        if k in exclude or v is None or v == "":
            continue
        if isinstance(v, dict):
            v = json.dumps(v, ensure_ascii=False)
        elif isinstance(v, (list, tuple)):
            v = ", ".join(str(x) for x in v)
        lines.append(f"{k}: {v}")
    return "\n".join(lines)
