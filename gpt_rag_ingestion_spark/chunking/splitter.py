"""Text splitters (SURVEY.md C4, W1, W3).

Two implementations with different scale/semantics trade-offs:

1. ``chunk_fixed`` — pure DataFrame-API fixed-window splitter
   (size/overlap in characters).  ``sequence`` + ``explode`` +
   ``substring``: entirely JVM-side, whole-stage-codegen'd, zero Python.
   This is the 100 TB hot path and is exactly SQL-expressible, so it is
   oracle-checked (see __spark_entry__.q_chunk_fixed).

2. ``split_text_recursive`` — separator-aware recursive splitter with
   token-budgeted chunks and overlap, mirroring the reference's
   LangChain RecursiveCharacterTextSplitter configuration
   (reference chunking/chunkers/langchain_chunker.py:53-140, sizes
   2048/200/min-100 from doc_analysis_chunker.py:65-67).  Runs as a
   plain Python function inside an Arrow-batched pandas UDF in
   pipeline.chunk_documents; per-document sequential semantics (chunk
   numbering, offsets) stay inside the per-row call, per SURVEY.md §7
   "hard parts".
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CHUNK_NUM_TOKENS = 2048  # reference doc_analysis_chunker.py:65
TOKEN_OVERLAP = 200  # reference doc_analysis_chunker.py:66 (CHANGELOG.md:60)
MIN_CHUNK_SIZE = 100  # tokens, reference doc_analysis_chunker.py:67

_SEPARATORS = ["\n\n", "\n", ". ", " "]

# Per-format separator sets (reference langchain_chunker.py:100-137:
# MarkdownTextSplitter / PythonCodeTextSplitter / sentence-separator
# RecursiveCharacterTextSplitter).  A ("sep", "start") entry splits
# BEFORE the separator and keeps it attached to the following piece —
# so a markdown chunk starts with its "#" header and a python chunk
# with its "def"/"class" line, like LangChain's keep_separator mode.
MARKDOWN_SEPARATORS: list = [
    ("\n# ", "start"),
    ("\n## ", "start"),
    ("\n### ", "start"),
    ("\n#### ", "start"),
    ("\n```", "start"),
    "\n\n",
    "\n",
    ". ",
    " ",
]
PYTHON_SEPARATORS: list = [
    ("\nclass ", "start"),
    ("\ndef ", "start"),
    ("\n\tdef ", "start"),
    ("\n    def ", "start"),
    "\n\n",
    "\n",
    ". ",
    " ",
]
# the reference's fallback set for html/csv/xml/txt: sentence endings
# then word breaks (langchain_chunker.py:129-131)
SENTENCE_SEPARATORS: list = [". ", "! ", "? ", " ", "\n", "\t"]

_FORMAT_SEPARATORS = {
    "md": MARKDOWN_SEPARATORS,
    "py": PYTHON_SEPARATORS,
    "txt": SENTENCE_SEPARATORS,
    "html": SENTENCE_SEPARATORS,
    "shtml": SENTENCE_SEPARATORS,
    "htm": SENTENCE_SEPARATORS,
    "csv": SENTENCE_SEPARATORS,
    "xml": SENTENCE_SEPARATORS,
}

_TOKEN_RE = re.compile(r"\w+|[^\w\s]")
_WORD_RE = re.compile(r"\w")


def separators_for_extension(ext: str) -> list:
    """C4 dispatch: extension -> separator set (default recursive set
    for unknown extensions)."""
    return _FORMAT_SEPARATORS.get((ext or "").lower(), _SEPARATORS)


def _split_once(s: str, sep) -> tuple[list[str], str]:
    """One split level.  Plain separators drop the separator from the
    parts (re-inserted on merge); ("sep", "start") keeps the separator
    glued to the following part (structural markers like headers)."""
    if isinstance(sep, tuple):
        pattern, _mode = sep
        parts = re.split(f"(?={re.escape(pattern)})", s)
        return [p for p in parts if p != ""], ""
    return s.split(sep), sep


def _ntokens(s: str) -> int:
    return len(_TOKEN_RE.findall(s))


def _counts_additive(sep, joiner: str) -> bool:
    """True when ``_ntokens(a + joiner + b)`` always equals
    ``_ntokens(a) + _ntokens(joiner) + _ntokens(b)`` for the pieces this
    separator level produces.  ``\\w+`` is the only token that can span
    a concatenation boundary (punctuation tokens are single chars), so
    counts are additive unless a word char can sit on both sides of a
    boundary: for lookahead ("start") separators the right piece begins
    with the separator pattern itself, and for plain separators the
    joiner is re-inserted — additive iff neither end of the junction
    text is a word char."""
    if isinstance(sep, tuple):
        pattern = sep[0]
        return not _WORD_RE.match(pattern[0])
    if not joiner:
        return False
    return not (
        _WORD_RE.match(joiner[0]) or _WORD_RE.match(joiner[-1])
    )


def split_text_recursive(
    text: str,
    max_tokens: int = CHUNK_NUM_TOKENS,
    overlap_tokens: int = TOKEN_OVERLAP,
    min_tokens: int = MIN_CHUNK_SIZE,
    separators: list | None = None,
) -> list[dict]:
    """Split ``text`` into chunks of <= max_tokens, preferring paragraph >
    line > sentence > word boundaries (or a format-specific separator
    set — see MARKDOWN_SEPARATORS / PYTHON_SEPARATORS), with
    ~overlap_tokens of trailing context carried into the next chunk.
    Returns dicts with chunk_id / content / offset / length (chars),
    mirroring the reference chunk contract (base_chunker.py:218-234)."""
    if not text:
        return []

    def split_rec(s: str, seps: list, n_s: int | None = None) -> list[str]:
        # token counts are carried ADDITIVELY through the greedy merge
        # (one tokenization pass per recursion level) instead of
        # re-tokenizing every growing candidate — O(k) not O(k^2) per
        # piece; bit-identical to the recomputing form because counts
        # are only added when no token can span a concatenation
        # boundary (see _counts_additive).
        if n_s is None:
            n_s = _ntokens(s)
        if n_s <= max_tokens:
            return [s]
        if not seps:
            # fall back to hard token windows
            toks = list(_TOKEN_RE.finditer(s))
            out, i = [], 0
            while i < len(toks):
                j = min(i + max_tokens, len(toks))
                out.append(s[toks[i].start() : toks[j - 1].end()])
                if j == len(toks):
                    break
                i = j - overlap_tokens if j - overlap_tokens > i else j
            return out
        sep, rest = seps[0], seps[1:]
        parts, joiner = _split_once(s, sep)
        if len(parts) <= 1:
            return split_rec(s, rest, n_s)
        # greedy merge of parts into token-budgeted pieces
        additive = _counts_additive(sep, joiner)
        counts = [_ntokens(p) for p in parts]
        n_join = _ntokens(joiner) if joiner else 0
        pieces: list[str] = []
        piece_counts: list[int] = []
        cur = ""
        cur_n = 0
        for p, pn in zip(parts, counts):
            if cur:
                cand_n = (
                    cur_n + n_join + pn
                    if additive
                    else _ntokens(cur + joiner + p)
                )
                if cand_n > max_tokens:
                    pieces.append(cur)
                    piece_counts.append(cur_n)
                    cur, cur_n = p, pn
                else:
                    cur, cur_n = cur + joiner + p, cand_n
            else:
                cur, cur_n = p, pn
        if cur:
            pieces.append(cur)
            piece_counts.append(cur_n)
        out: list[str] = []
        for piece, pc in zip(pieces, piece_counts):
            out.extend(split_rec(piece, rest, pc) if pc > max_tokens else [piece])
        return out

    pieces = split_rec(text, separators if separators is not None else _SEPARATORS)

    # attach overlap tails and compute offsets against the original text.
    # Contract: ``offset`` is the position of the chunk's NEW content
    # (the piece); ``content`` additionally carries the previous piece's
    # overlap tail, so text[offset:offset+length] != content when
    # overlap > 0 — length is len(content), offset is where the fresh
    # text begins (matches the reference's running-offset semantics, W3).
    chunks: list[dict] = []
    cursor = 0
    prev_tail = ""
    for piece in pieces:
        if not piece.strip():
            continue
        found = text.find(piece, cursor)
        if found < 0:
            # hard-window fallback pieces overlap, so a piece can start
            # BEFORE the previous cursor — search from the top
            found = text.find(piece)
        offset = found if found >= 0 else cursor
        cursor = offset + len(piece)
        content = (prev_tail + piece) if prev_tail else piece
        if _ntokens(content) < min_tokens:
            # min-chunk-size filter (reference langchain_chunker.py:82-92)
            prev_tail = _tail_tokens(piece, overlap_tokens)
            continue
        chunks.append(
            {
                "chunk_id": len(chunks),
                "content": content,
                "offset": offset,
                "length": len(content),
            }
        )
        prev_tail = _tail_tokens(piece, overlap_tokens)
    if not chunks and text.strip() and _ntokens(text) >= min_tokens:
        chunks.append({"chunk_id": 0, "content": text, "offset": 0, "length": len(text)})
    return chunks


def _tail_tokens(s: str, n: int) -> str:
    toks = list(_TOKEN_RE.finditer(s))
    if not toks or n <= 0:
        return ""
    start = toks[max(0, len(toks) - n)].start()
    return s[start:]


def chunk_fixed(
    df: DataFrame,
    text_col: str,
    size: int = 2048,
    overlap: int = 200,
    min_len: int = 1,
    out_col: str = "content",
    id_col: str = "chunk_id",
) -> DataFrame:
    """Fixed char-window splitter as pure column ops:
    chunk i covers [i*step, i*step+size), step = size-overlap.

    ``explode(sequence(...))`` keeps everything in codegen; at 100 TB
    this runs at scan speed with no shuffle (narrow transform)."""
    step = size - overlap
    if step <= 0:
        raise ValueError("size must exceed overlap")
    c = F.col(text_col)
    # last chunk index; 0 for empty strings (the empty chunk is dropped by
    # the min_len filter), NULL text rows drop at explode.
    n_chunks = F.greatest(F.floor((F.length(c) - F.lit(1)) / F.lit(step)), F.lit(0))
    out = (
        df.withColumn("_i", F.explode(F.sequence(F.lit(0), n_chunks)))
        .withColumn(id_col, F.col("_i").cast("int"))
        .withColumn(out_col, F.substring(c, F.col("_i") * step + 1, size))
        .drop("_i")
    )
    return out.filter(F.length(F.col(out_col)) >= min_len)
