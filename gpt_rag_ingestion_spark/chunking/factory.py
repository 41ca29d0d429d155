"""Chunker factory dispatch (SURVEY.md C8; reference
chunking/chunker_factory.py:34-87).

The reference maps file extension -> chunker class imperatively.  In
Spark the corpus is heterogeneous within one DataFrame, so dispatch is
a column expression: a ``chunker`` tag per row, then each family's UDF
runs on its filtered slice and the slices union back.  Catalyst turns
the per-family filters into a single pass over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# reference chunker_factory.py:49-72 + langchain_chunker.py:53-62
DOC_ANALYSIS_EXTS = ["pdf", "png", "jpeg", "jpg", "bmp", "tiff"]
OFFICE_EXTS = ["docx", "pptx", "xlsx"]  # gated on DI 4.0 / CU capability
SPREADSHEET_EXTS = ["xlsx", "xls"]
LANGCHAIN_EXTS = ["md", "txt", "html", "shtml", "htm", "py", "csv", "xml"]
TRANSCRIPTION_EXTS = ["vtt"]
JSON_EXTS = ["json"]
NL2SQL_EXTS = ["nl2sql"]


OFFICE_DOC_EXTS = ["docx", "pptx"]  # reference chunker_factory.py:60-68


def chunker_for_extension(
    ext: Column | str, office_supported: bool = False
) -> Column:
    """C8: extension -> chunker family tag ('doc_analysis' | 'spreadsheet'
    | 'langchain' | 'transcription' | 'json' | 'nl2sql' | 'unsupported').

    ``office_supported`` mirrors the reference's DI 4.0 / Content
    Understanding capability gate (chunker_factory.py:60-68): with it,
    docx/pptx route to the doc-analysis family; without it they are
    unsupported (the reference raises).  Every OTHER extension falls
    back to the LangChain family — the reference's ``else`` branch
    (chunker_factory.py:71-72), so a .log or .rst file still chunks."""
    e = F.lower(F.col(ext) if isinstance(ext, str) else ext)
    doc_exts = DOC_ANALYSIS_EXTS + (OFFICE_DOC_EXTS if office_supported else [])
    return (
        F.when(e.isin(doc_exts), "doc_analysis")
        .when(e.isin(SPREADSHEET_EXTS), "spreadsheet")
        .when(e.isin(TRANSCRIPTION_EXTS), "transcription")
        .when(e.isin(JSON_EXTS), "json")
        .when(e.isin(NL2SQL_EXTS), "nl2sql")
        .when(e.isin(OFFICE_DOC_EXTS), "unsupported")  # capability off
        .otherwise("langchain")
    )


def tag_chunkers(
    df: DataFrame, ext_col: str = "extension", office_supported: bool = False
) -> DataFrame:
    return df.withColumn(
        "chunker", chunker_for_extension(ext_col, office_supported)
    )
