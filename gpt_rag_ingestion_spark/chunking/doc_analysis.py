"""Doc-analysis chunker (SURVEY.md C1, W2, F12; reference
chunking/chunkers/doc_analysis_chunker.py:20-500).

The reference sends PDFs/images to a layout-analysis service that
returns markdown with ``<!-- PageBreak -->`` separators, then:
  1. numbers the pagebreaks ``PageBreak00001``... (F12, :391-404),
  2. splits the markdown into token-budgeted chunks,
  3. attributes each chunk to a page by the FIRST marker inside it with
     a position rule — marker in the first half of the chunk means the
     chunk's content mostly FOLLOWS the break, so it belongs to the
     next page (W2, :406-446),
  4. giant PDFs are split into <=300-page parts analyzed separately,
     then re-merged with page renumbering (:85, utils/file_utils.py:77-138).

The analysis service itself is external; its offline stand-in is any
text that follows the markdown+PageBreak contract.  The sequential
semantics (marker numbering, page attribution) stay inside a
per-document pandas UDF per SURVEY.md §7 "hard parts" — window
functions over exploded rows cannot reproduce the reference's exact
sequential scan.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from gpt_rag_ingestion_spark.chunking.splitter import (
    CHUNK_NUM_TOKENS,
    MIN_CHUNK_SIZE,
    TOKEN_OVERLAP,
    split_text_recursive,
)

PAGEBREAK_RAW = "<!-- PageBreak -->"
_MARKER_RE = re.compile(r"<!-- PageBreak(\d{5}) -->")
MAX_PAGES_PER_ANALYSIS = 300  # reference doc_analysis_chunker.py:85


def number_pagebreaks(md: str, start_page: int = 1) -> str:
    """F12: ``<!-- PageBreak -->`` -> ``<!-- PageBreak00001 -->`` etc.
    The marker number is the page that ENDS at the break; ``start_page``
    supports renumbering split parts."""
    counter = [start_page - 1]

    def repl(_m) -> str:
        counter[0] += 1
        return f"<!-- PageBreak{counter[0]:05d} -->"

    return re.sub(re.escape(PAGEBREAK_RAW), repl, md)


def renumber_markers(md: str, page_offset: int) -> str:
    """Shift existing numbered markers by ``page_offset`` (the merge step
    of the 300-page split path, reference utils/file_utils.py:122-138)."""
    return _MARKER_RE.sub(
        lambda m: f"<!-- PageBreak{int(m.group(1)) + page_offset:05d} -->", md
    )


def split_page_ranges(total_pages: int, max_per_part: int = MAX_PAGES_PER_ANALYSIS):
    """[(first_page, last_page)] parts of <= max_per_part pages."""
    out = []
    start = 1
    while start <= total_pages:
        end = min(start + max_per_part - 1, total_pages)
        out.append((start, end))
        start = end + 1
    return out


def attribute_page(chunk_text: str, current_page: int) -> tuple[int, int]:
    """W2: (page of this chunk, current_page for the next chunk).

    Reference semantics (doc_analysis_chunker.py:406-446): the chunk's
    page comes from the FIRST marker in the chunk (``re.search`` in
    ``_determine_chunk_page``) — in the first half of the chunk the
    content mostly follows the break -> next page, otherwise the page
    that ends at the marker.  ``current_page`` advances from the LAST
    marker (``_update_page``), and only when that marker's page is >=
    the current page (the guard against stray lower-numbered markers).
    """
    matches = list(_MARKER_RE.finditer(chunk_text))
    if not matches:
        return current_page, current_page
    first = matches[0]
    first_page = int(first.group(1))
    ratio = first.start() / max(len(chunk_text), 1)
    page = first_page + 1 if ratio < 0.5 else first_page
    last_page = int(matches[-1].group(1))
    next_current = last_page + 1 if last_page >= current_page else current_page
    return page, next_current


def strip_markers(text: str) -> str:
    return _MARKER_RE.sub("", text)


def chunk_analyzed_markdown(
    md: str,
    max_tokens: int = CHUNK_NUM_TOKENS,
    overlap: int = TOKEN_OVERLAP,
    min_tokens: int = MIN_CHUNK_SIZE,
    start_page: int = 1,
) -> list[dict]:
    """Full C1 path for one analyzed document: number breaks, split,
    attribute pages, strip markers."""
    numbered = number_pagebreaks(md or "", start_page=start_page)
    pieces = split_text_recursive(
        numbered, max_tokens=max_tokens, overlap_tokens=overlap, min_tokens=min_tokens
    )
    out = []
    current_page = start_page
    for p in pieces:
        page, current_page = attribute_page(p["content"], current_page)
        content = strip_markers(p["content"]).strip()
        if not content:
            continue
        out.append(
            {
                "chunk_id": len(out),
                "content": content,
                "page": page,
                "offset": p["offset"],
                "length": len(content),
            }
        )
    return out


_PAGE_CHUNK_STRUCT = ArrayType(
    StructType(
        [
            StructField("chunk_id", IntegerType()),
            StructField("content", StringType()),
            StructField("page", IntegerType()),
            StructField("offset", LongType()),
            StructField("length", IntegerType()),
        ]
    )
)


def chunk_analyzed_documents(
    docs: DataFrame,
    md_col: str = "markdown",
    max_tokens: int = CHUNK_NUM_TOKENS,
    overlap: int = TOKEN_OVERLAP,
    min_tokens: int = MIN_CHUNK_SIZE,
    spread: bool = True,
) -> DataFrame:
    """DataFrame wrapper: one pandas-UDF call per analyzed document,
    exploding to page-attributed chunk rows.  Narrow map — no shuffle."""

    from gpt_rag_ingestion_spark.session import ensure_importable

    ensure_importable(docs)
    # spread small single-file inputs across cores (no-op at real scale)
    if spread:
        target = docs.sparkSession.sparkContext.defaultParallelism
        if docs.rdd.getNumPartitions() < min(target, 8):
            docs = docs.repartition(target)

    @pandas_udf(_PAGE_CHUNK_STRUCT)
    def _chunk(mds: pd.Series) -> pd.Series:
        return mds.map(
            lambda s: chunk_analyzed_markdown(
                s or "", max_tokens=max_tokens, overlap=overlap, min_tokens=min_tokens
            )
        )

    return (
        docs.withColumn("_chunks", _chunk(F.col(md_col)))
        .withColumn("_c", F.explode("_chunks"))
        .select(
            *[c for c in docs.columns if c != md_col],
            F.col("_c.chunk_id").alias("chunk_id"),
            F.col("_c.content").alias("content"),
            F.col("_c.page").alias("page"),
            F.col("_c.offset").alias("offset"),
            F.col("_c.length").alias("length"),
        )
    )
