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


def chunker_for_extension(ext: Column | str) -> Column:
    """C8: extension -> chunker family tag ('doc_analysis' | 'spreadsheet'
    | 'langchain' | 'transcription' | 'json' | 'nl2sql' | 'unsupported')."""
    e = F.lower(F.col(ext) if isinstance(ext, str) else ext)
    return (
        F.when(e.isin(DOC_ANALYSIS_EXTS), "doc_analysis")
        .when(e.isin(SPREADSHEET_EXTS), "spreadsheet")
        .when(e.isin(TRANSCRIPTION_EXTS), "transcription")
        .when(e.isin(JSON_EXTS), "json")
        .when(e.isin(NL2SQL_EXTS), "nl2sql")
        .when(e.isin(LANGCHAIN_EXTS), "langchain")
        .otherwise("unsupported")
    )


def tag_chunkers(df: DataFrame, ext_col: str = "extension") -> DataFrame:
    return df.withColumn("chunker", chunker_for_extension(ext_col))
