"""Text/path scalar functions (SURVEY.md F4-F6, F9).

- title_from_filename: strip extension, [_-]->space, split camelCase,
  title-case (reference chunking/chunkers/base_chunker.py:236-264).
- filename/extension extraction (reference utils/file_utils.py:11-64).
- byte-safe UTF-8 truncation to 32,766 bytes (reference
  chunking/chunkers/base_chunker.py:194-207) — needs a pandas UDF since
  Spark has no byte-boundary-safe substring; Arrow-batched so it stays
  off the row-at-a-time path.
- charset detection + decode (reference base_chunker.py:295-306).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

MAX_CONTENT_BYTES = 32766  # reference base_chunker.py:194


def filename_of(path: Column | str) -> Column:
    """F5: last path segment."""
    c = F.col(path) if isinstance(path, str) else path
    return F.element_at(F.split(c, "/"), -1)


def extension_of(path: Column | str) -> Column:
    """F5: lowercase extension without the dot ('' when none)."""
    c = F.col(path) if isinstance(path, str) else path
    name = filename_of(c)
    return F.lower(
        F.when(name.contains("."), F.element_at(F.split(name, "\\."), -1)).otherwise(
            F.lit("")
        )
    )


def title_from_filename(name: Column | str) -> Column:
    """F4: 'annual_reportFY24.pdf' -> 'Annual Report FY24'-style title."""
    c = F.col(name) if isinstance(name, str) else name
    stem = F.regexp_replace(c, "\\.[A-Za-z0-9]+$", "")
    spaced = F.regexp_replace(stem, "[_-]+", " ")
    # split camelCase boundaries: aB -> a B
    camel = F.regexp_replace(spaced, "([a-z])([A-Z])", "$1 $2")
    collapsed = F.trim(F.regexp_replace(camel, " {2,}", " "))
    return F.initcap(collapsed)


@pandas_udf(StringType())
def byte_truncate_udf(content: pd.Series) -> pd.Series:
    """F6: truncate to MAX_CONTENT_BYTES UTF-8 bytes without splitting a
    multi-byte character (reference base_chunker.py:194-207)."""

    def trunc(s: str | None) -> str | None:
        if s is None:
            return None
        b = s.encode("utf-8")
        if len(b) <= MAX_CONTENT_BYTES:
            return s
        return b[:MAX_CONTENT_BYTES].decode("utf-8", errors="ignore")

    return content.map(trunc)


@pandas_udf(StringType())
def decode_text_udf(payload: pd.Series) -> pd.Series:
    """F9: bytes -> str with charset detection fallback
    (reference base_chunker.py:295-306)."""
    try:
        from charset_normalizer import from_bytes

        def dec(b: bytes | None) -> str | None:
            if b is None:
                return None
            try:
                return b.decode("utf-8")
            except UnicodeDecodeError:
                best = from_bytes(b).best()
                return str(best) if best is not None else b.decode("utf-8", "replace")

    except ImportError:  # charset_normalizer not installed: utf-8 w/ replace

        def dec(b: bytes | None) -> str | None:
            return None if b is None else b.decode("utf-8", "replace")

    return payload.map(dec)


@pandas_udf(StringType())
def nfc_normalize_udf(text: pd.Series) -> pd.Series:
    """Unicode NFC canonical normalization (Arrow-batched).

    Text canonicalization BEFORE hashing/dedup: the same visible string
    can arrive precomposed (U+00E9) or decomposed (e + U+0301) from
    different sources, and every digest-keyed operator in this repo
    (exact dedup, incremental_dedup, curation funnel, span dedup) would
    treat them as distinct documents.  Normalizing to NFC first makes
    the digest a function of the canonical text.  Spark has no builtin
    normalizer; this stays in the Arrow batch path (oracle: DuckDB's
    nfc_normalize)."""
    import unicodedata

    return text.map(
        lambda s: None if s is None else unicodedata.normalize("NFC", s)
    )


@pandas_udf(StringType())
def strip_accents_udf(text: pd.Series) -> pd.Series:
    """Diacritic stripping for search/matching keys: NFD-decompose,
    drop combining marks, NFC-recompose the rest.  The LOSSY companion
    of nfc_normalize_udf — 'café' and 'cafe' become the same matching
    key (DuckDB's strip_accents is the oracle twin)."""
    import unicodedata

    def strip(s: str | None) -> str | None:
        if s is None:
            return None
        return unicodedata.normalize(
            "NFC",
            "".join(
                ch
                for ch in unicodedata.normalize("NFD", s)
                if not unicodedata.combining(ch)
            ),
        )

    return text.map(strip)
