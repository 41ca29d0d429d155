"""Token counting / truncation (SURVEY.md F7-F8).

The reference counts tokens with tiktoken (model text-embedding-3-large,
reference tools/aoai.py:266-276) and truncates embedding input to 8,192
tokens (tools/aoai.py:39,253-264).  tiktoken is not available in this
environment, so the engine ships two interchangeable counters:

- ``approx_token_count``: a pure column expression counting BPE-ish
  units (word pieces + standalone punctuation) — JVM-side, codegen'd,
  the 100 TB hot path.
- ``token_truncate_udf``: pandas UDF doing exact truncation by the same
  regex tokenizer (binary-search-free: regex findall + join), used where
  the reference does its exponential truncation loop
  (base_chunker.py:266-293).

If tiktoken is installed the UDFs transparently use it (encoder cached
per executor process).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

#: BPE-ish token pattern: runs of word chars, or single non-space symbols.
TOKEN_REGEX = r"\w+|[^\w\s]"

MAX_EMBED_TOKENS = 8192  # reference tools/aoai.py:39

_ENCODER = None


def _get_tiktoken():
    global _ENCODER
    if _ENCODER is None:
        try:
            import tiktoken

            _ENCODER = tiktoken.get_encoding("cl100k_base")
        except Exception:
            _ENCODER = False
    return _ENCODER or None


def approx_token_count(col: Column | str) -> Column:
    """F7 (columnar): count of BPE-ish units; 0 for empty/NULL-safe."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), 0))


def make_token_truncate_udf(max_tokens: int = MAX_EMBED_TOKENS):
    """F8: truncate text to ``max_tokens`` tokens.  Exact w/ tiktoken when
    present; else regex-token based (keeps original whitespace by cutting
    at the last kept token's end offset)."""

    @pandas_udf(StringType())
    def _truncate(content: pd.Series) -> pd.Series:
        enc = _get_tiktoken()

        def trunc(s: str | None) -> str | None:
            if s is None:
                return None
            if enc is not None:
                toks = enc.encode(s)
                if len(toks) <= max_tokens:
                    return s
                return enc.decode(toks[:max_tokens])
            matches = list(re.finditer(TOKEN_REGEX, s))
            if len(matches) <= max_tokens:
                return s
            return s[: matches[max_tokens - 1].end()]

        return content.map(trunc)

    return _truncate


token_truncate_udf = make_token_truncate_udf()
