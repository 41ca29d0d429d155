"""Composed mixed-corpus dispatch (SURVEY.md C8 + §3.2; reference
chunking/chunker_factory.py:34-87 + chunking/document_chunking.py:49-62).

The reference's actual entry path: every heterogeneous folder ingest
routes each document through ``ChunkerFactory().get_chunker(data)`` and
runs that chunker.  Spark-first re-expression: the corpus is ONE
DataFrame of (doc_key, extension, payload BINARY); each chunker family
runs on its filtered slice and the slices ``unionByName`` into one
uniform chunk relation.  Catalyst merges the per-family filters into a
single pass over the scan, and every family's UDF only ever sees its
own rows — the same dispatch, but set-at-a-time.

Family routing (chunker_for_extension, reference factory :49-72):
  pdf/png/jpeg/jpg/bmp/tiff -> doc-analysis (markdown+PageBreak
      contract stand-in for the external layout service, U3)
  docx/pptx (office_supported) -> doc-analysis via the stdlib OOXML
      converters (office.docx_to_markdown / pptx_to_markdown)
  xlsx/xls  -> spreadsheet SHEET mode; real xlsx bytes parsed by the
      stdlib OOXML parser (every sheet), plain text falls back to CSV
  vtt       -> transcription (summary-embedding quirk preserved)
  json      -> recursive JSON partitioner (C6/F22)
  nl2sql    -> one chunk per top-level key (C7)
  md/txt/html/shtml/htm/py/csv/xml -> recursive splitter with
      format-specific separators (markdown headers / python defs)
  anything else -> dropped, like the reference's UnsupportedFormatError
      rows (callers can diff against the input for error accounting).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from gpt_rag_ingestion_spark.chunking.factory import (
    DOC_ANALYSIS_EXTS,
    JSON_EXTS,
    NL2SQL_EXTS,
    SPREADSHEET_EXTS,
    TRANSCRIPTION_EXTS,
    chunker_for_extension,
)

# the uniform output relation of every family branch
CORPUS_CHUNK_COLS = [
    "parent_id",
    "chunker",
    "chunk_id",
    "id",
    "content",
    "offset",
    "length",
    "page",
    "title",
    "summary",
    "contentVector",
]


def _conform(df: DataFrame, chunker: str) -> DataFrame:
    """Project a family branch onto CORPUS_CHUNK_COLS (missing columns
    become typed NULLs)."""
    cols = set(df.columns)
    types = {
        "chunk_id": "int",
        "offset": "long",
        "length": "int",
        "page": "int",
        "title": "string",
        "summary": "string",
    }
    sel = []
    for name in CORPUS_CHUNK_COLS:
        if name == "chunker":
            sel.append(F.lit(chunker).alias("chunker"))
        elif name in cols:
            c = F.col(name)
            sel.append(c.cast(types[name]).alias(name) if name in types else c)
        else:
            sel.append(F.lit(None).cast(types.get(name, "string")).alias(name))
    return df.select(*sel)


def _json_parts_udf(max_tokens: int, min_tokens: int):
    from gpt_rag_ingestion_spark.session import ship_active

    ship_active()

    @pandas_udf("array<string>")
    def _parts(texts: pd.Series) -> pd.Series:
        from gpt_rag_ingestion_spark.chunking.json_chunker import chunk_json_text
        from gpt_rag_ingestion_spark.chunking.splitter import _ntokens

        # reference json_chunker.py:48-55: pretty-printed parts below the
        # minimum token size are dropped
        return texts.map(
            lambda s: [
                p
                for p in chunk_json_text(s or "", max_tokens=max_tokens)
                if _ntokens(p) >= min_tokens
            ]
        )

    return _parts


def _nl2sql_parts_udf():
    from gpt_rag_ingestion_spark.session import ship_active

    ship_active()

    schema = (
        "array<struct<chunk_id:int, key:string, content:string, embed_text:string>>"
    )

    @pandas_udf(schema)
    def _parts(texts: pd.Series) -> pd.Series:
        from gpt_rag_ingestion_spark.chunking.nl2sql_chunker import chunk_nl2sql_text

        return texts.map(lambda s: chunk_nl2sql_text(s or ""))

    return _parts


def _sheets_udf():
    """Workbook parse: real xlsx bytes (zip magic ``PK``) go through the
    stdlib OOXML parser (office.parse_xlsx_workbook, every sheet in
    workbook order); plain-text payloads fall back to one CSV sheet
    (line rows, comma cells).  First row = headers, like the
    reference's openpyxl read (spreadsheet_chunker.py:318-344)."""
    from gpt_rag_ingestion_spark.session import ship_active

    ship_active()

    schema = (
        "array<struct<sheet_pos:int, sheet_name:string, "
        "headers:array<string>, rows:array<array<string>>>>"
    )

    @pandas_udf(schema)
    def _parse(payloads: pd.Series) -> pd.Series:
        from gpt_rag_ingestion_spark.chunking.office import parse_xlsx_workbook

        out = []
        for raw in payloads:
            b = bytes(raw) if raw is not None else b""
            if b[:2] == b"PK":
                sheets = [
                    {
                        "sheet_pos": s["sheet_pos"],
                        "sheet_name": s["sheet_name"],
                        "headers": s["rows"][0] if s["rows"] else [],
                        "rows": s["rows"][1:],
                    }
                    for s in parse_xlsx_workbook(b)
                ]
            else:
                t = b.decode("utf-8", errors="replace")
                lines = [ln for ln in t.split("\n") if ln.strip() != ""]
                cells = [ln.split(",") for ln in lines]
                sheets = [
                    {
                        "sheet_pos": 0,
                        "sheet_name": "Sheet1",
                        "headers": cells[0] if cells else [],
                        "rows": cells[1:] if len(cells) > 1 else [],
                    }
                ]
            out.append(sheets)
        return pd.Series(out)

    return _parse


def _office_md_udf():
    """docx/pptx bytes -> doc-analysis markdown via the stdlib OOXML
    converters; non-zip payloads pass through as decoded text (the
    contract stand-in used for pdf/images)."""
    from gpt_rag_ingestion_spark.session import ship_active

    ship_active()

    @pandas_udf("string")
    def _to_md(exts: pd.Series, payloads: pd.Series) -> pd.Series:
        from gpt_rag_ingestion_spark.chunking.office import (
            docx_to_markdown,
            pptx_to_markdown,
        )

        out = []
        for ext, raw in zip(exts, payloads):
            b = bytes(raw) if raw is not None else b""
            e = (ext or "").lower()
            if b[:2] == b"PK" and e == "docx":
                out.append(docx_to_markdown(b))
            elif b[:2] == b"PK" and e == "pptx":
                out.append(pptx_to_markdown(b))
            else:
                out.append(b.decode("utf-8", errors="replace"))
        return pd.Series(out)

    return _to_md


def chunk_corpus(
    docs: DataFrame,
    doc_key_col: str = "doc_key",
    ext_col: str = "extension",
    payload_col: str = "payload",
    embedding_dim: int = 64,
    max_tokens: int = 2048,
    overlap: int = 200,
    min_tokens: int = 10,
    office_supported: bool = False,
) -> DataFrame:
    """Run the per-extension chunker family on each slice of a mixed
    corpus and union the results to one relation (CORPUS_CHUNK_COLS).
    ``office_supported`` routes docx/pptx into the doc-analysis family
    (the reference's DI 4.0 / CU capability gate).

    ``docs``: (doc_key, extension, payload BINARY, ...).  All families
    share deterministic keys (F1-F3) and the hash embedder (U1), so the
    output is reproducible and oracle-checkable."""
    from gpt_rag_ingestion_spark.chunking.doc_analysis import chunk_analyzed_documents
    from gpt_rag_ingestion_spark.chunking.pipeline import chunk_documents
    from gpt_rag_ingestion_spark.chunking.splitter import (
        MARKDOWN_SEPARATORS,
        PYTHON_SEPARATORS,
        SENTENCE_SEPARATORS,
    )
    from gpt_rag_ingestion_spark.chunking.spreadsheet import chunk_sheet_mode
    from gpt_rag_ingestion_spark.chunking.transcription import chunk_transcriptions
    from gpt_rag_ingestion_spark.embeddings import hash_embedding_udf
    from gpt_rag_ingestion_spark.functions.keys import chunk_key, sanitize_key
    from gpt_rag_ingestion_spark.functions.text import decode_text_udf
    from gpt_rag_ingestion_spark.session import ensure_importable

    ensure_importable(docs)
    embed = hash_embedding_udf(embedding_dim)

    # spread a small corpus across cores ONCE here (the per-branch
    # pipelines are told not to re-probe: spread=False) — file-listing
    # estimate, no plan->RDD probe; at real scale the source already
    # has enough partitions and this is a no-op
    from gpt_rag_ingestion_spark.session import spread_small_input

    docs = spread_small_input(docs)

    tagged = docs.withColumn(
        "chunker", chunker_for_extension(ext_col, office_supported)
    ).withColumn("_text", decode_text_udf(F.col(payload_col)))
    parent = sanitize_key(F.col(doc_key_col).cast("string"))
    branches: list[DataFrame] = []

    # ---- langchain family, sub-dispatched by separator set (C4) ----
    lc = tagged.filter(F.col("chunker") == "langchain")
    for exts, seps in (
        (["md"], MARKDOWN_SEPARATORS),
        (["py"], PYTHON_SEPARATORS),
        (None, SENTENCE_SEPARATORS),  # html/shtml/htm/txt/csv/xml
    ):
        sl = (
            lc.filter(F.lower(F.col(ext_col)).isin(exts))
            if exts
            else lc.filter(~F.lower(F.col(ext_col)).isin(["md", "py"]))
        )
        branches.append(
            _conform(
                chunk_documents(
                    sl,
                    text_col="_text",
                    doc_key_col=doc_key_col,
                    source_col=None,
                    embedding_dim=embedding_dim,
                    max_tokens=max_tokens,
                    overlap=overlap,
                    min_tokens=min_tokens,
                    separators=seps,
                    spread=False,
                ),
                "langchain",
            )
        )

    # ---- doc-analysis family (C1; docx/pptx parsed by office.py, the
    # pdf/image slice uses the markdown contract stand-in) ----
    da = tagged.filter(F.col("chunker") == "doc_analysis")
    da_chunks = chunk_analyzed_documents(
        da.select(
            parent.alias("parent_id"),
            _office_md_udf()(F.col(ext_col), F.col(payload_col)).alias("_md"),
        ),
        md_col="_md",
        max_tokens=max_tokens,
        overlap=overlap,
        min_tokens=min_tokens,
        spread=False,
    ).withColumn("id", chunk_key(F.col("parent_id"), F.col("chunk_id")))
    branches.append(
        _conform(da_chunks.withColumn("contentVector", embed("content")), "doc_analysis")
    )

    # ---- spreadsheet family: SHEET mode (C3), every workbook sheet ----
    ss = tagged.filter(F.col("chunker") == "spreadsheet")
    parsed = ss.withColumn(
        "_sheets", _sheets_udf()(F.col(payload_col))
    ).withColumn("_sheet", F.explode("_sheets"))
    sheets = parsed.select(
        F.col(doc_key_col),
        F.col("_sheet.sheet_pos").alias("sheet_pos"),
        F.col("_sheet.sheet_name").alias("sheet_name"),
        F.col("_sheet.headers").alias("headers"),
        F.col("_sheet.rows").alias("rows"),
    )
    branches.append(
        _conform(
            chunk_sheet_mode(
                sheets,
                doc_key_col=doc_key_col,
                max_tokens=max_tokens,
                embedding_dim=embedding_dim,
            ),
            "spreadsheet",
        )
    )

    # ---- transcription family (C5, summary-embedding quirk) ----
    vt = tagged.filter(F.col("chunker") == "transcription")
    branches.append(
        _conform(
            chunk_transcriptions(
                vt,
                vtt_col=payload_col,
                doc_key_col=doc_key_col,
                embedding_dim=embedding_dim,
                max_tokens=max_tokens,
                overlap=overlap,
                min_tokens=min_tokens,
            ),
            "transcription",
        )
    )

    # ---- JSON family (C6/F22) ----
    js = tagged.filter(F.col("chunker") == "json")
    js_parts = js.select(
        parent.alias("parent_id"),
        F.posexplode(_json_parts_udf(max_tokens, min_tokens)(F.col("_text"))).alias(
            "chunk_id", "content"
        ),
    )
    js_chunks = (
        js_parts.withColumn("id", chunk_key(F.col("parent_id"), F.col("chunk_id")))
        .withColumn("length", F.length("content"))
        .withColumn("contentVector", embed("content"))
    )
    branches.append(_conform(js_chunks, "json"))

    # ---- NL2SQL family (C7: embed the question, not the content) ----
    nl = tagged.filter(F.col("chunker") == "nl2sql")
    nl_parts = nl.select(
        parent.alias("parent_id"),
        F.explode(_nl2sql_parts_udf()(F.col("_text"))).alias("_p"),
    )
    nl_chunks = (
        nl_parts.select(
            "parent_id",
            F.col("_p.chunk_id").alias("chunk_id"),
            F.col("_p.content").alias("content"),
            F.col("_p.key").alias("title"),
            F.col("_p.embed_text").alias("_embed_text"),
        )
        .withColumn("id", chunk_key(F.col("parent_id"), F.col("chunk_id")))
        .withColumn("length", F.length("content"))
        .withColumn("contentVector", embed("_embed_text"))
        .drop("_embed_text")
    )
    branches.append(_conform(nl_chunks, "nl2sql"))

    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out
