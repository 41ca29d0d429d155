"""Spreadsheet chunker (SURVEY.md C3, F16, F17; reference
chunking/chunkers/spreadsheet_chunker.py:15-376).

Two modes, like the reference:
- **sheet mode**: whole sheet -> one markdown grid table chunk (the
  reference adds an LLM summary; here the summary enricher is pluggable
  and defaults to a deterministic head-sample).
- **row mode**: one chunk per row; content = single-row github table,
  embedding text = the compact ``file=..\\nsheet=..\\nrow=N\\ncols=a|b\\n
  vals=1|2`` form with trailing empty cells dropped (F17, :267-327).

openpyxl is not available in this container, so the xlsx byte-parsing
step is gated behind an import-try (raises NotImplementedError with a
clear message); the chunking logic itself operates on parsed rows —
which is also exactly what a Spark-native pipeline wants, since
`spark.read` already produces rows for csv/parquet sources and the
markdown/compact-text construction is pure column algebra
(concat_ws/array_join — no UDF, scales at codegen speed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_xlsx_bytes(payload: bytes) -> list[list[str]]:
    """xlsx -> rows of cell strings.  Needs openpyxl (not in this
    environment); csv/parquet sources go through spark.read instead."""
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "xlsx parsing requires openpyxl, which is not available in "
            "this environment; load spreadsheets via spark.read.csv/"
            "parquet or install openpyxl"
        ) from e
    import io

    wb = openpyxl.load_workbook(io.BytesIO(payload), read_only=True)
    ws = wb.active
    return [
        ["" if c.value is None else str(c.value) for c in row]
        for row in ws.iter_rows()
    ]


def markdown_row(cols: list[str], values_col: Column) -> Column:
    """F16: one data row as a github-style table with header:
    ``| a | b |\\n| --- | --- |\\n| 1 | 2 |``."""
    header = "| " + " | ".join(cols) + " |"
    sep = "| " + " | ".join(["---"] * len(cols)) + " |"
    row = F.concat(
        F.lit("| "), F.array_join(values_col, " | ", null_replacement=""), F.lit(" |")
    )
    return F.concat_ws("\n", F.lit(header), F.lit(sep), row)


def compact_embed_text(
    file_name: str, sheet_name: str, cols: list[str], values_col: Column, row_num: Column
) -> Column:
    """F17: compact per-row embedding text; trailing empty cells dropped
    (reference spreadsheet_chunker.py:267-327)."""
    # drop trailing empties: reverse -> dropWhile-equivalent via
    # slice to last non-empty index
    vals = values_col
    nonempty_idx = F.array_position(
        F.reverse(F.transform(vals, lambda v: F.coalesce(v, F.lit("")) != "")), True
    )
    keep_n = F.when(nonempty_idx > 0, F.size(vals) - nonempty_idx + 1).otherwise(0)
    trimmed = F.slice(vals, 1, keep_n.cast("int"))
    kept_cols = F.slice(F.array(*[F.lit(c) for c in cols]), 1, keep_n.cast("int"))
    return F.concat_ws(
        "\n",
        F.lit(f"file={file_name}"),
        F.lit(f"sheet={sheet_name}"),
        F.concat(F.lit("row="), row_num.cast("string")),
        F.concat(F.lit("cols="), F.array_join(kept_cols, "|")),
        F.concat(
            F.lit("vals="), F.array_join(trimmed, "|", null_replacement="")
        ),
    )


def chunk_rows_mode(
    df: DataFrame,
    cols: list[str],
    file_name: str = "sheet.xlsx",
    sheet_name: str = "Sheet1",
    row_num_col: str = "row_num",
) -> DataFrame:
    """Row-mode spreadsheet chunking over an already-relational sheet:
    adds markdown `content` and compact `embed_text` columns.  Pure
    column expressions — this is the 100 TB path for tabular corpora."""
    vals = F.array(*[F.col(c).cast("string") for c in cols])
    out = df.withColumn("_vals", vals)
    out = out.withColumn("content", markdown_row(cols, F.col("_vals")))
    out = out.withColumn(
        "embed_text",
        compact_embed_text(file_name, sheet_name, cols, F.col("_vals"), F.col(row_num_col)),
    )
    return out.drop("_vals")


def sheet_to_markdown(rows: list[list[str]], header: bool = True) -> str:
    """Sheet mode: whole sheet as one markdown grid table (driver-side /
    in-UDF helper for small sheets)."""
    if not rows:
        return ""
    width = max(len(r) for r in rows)
    norm = [r + [""] * (width - len(r)) for r in rows]
    lines = []
    if header:
        lines.append("| " + " | ".join(norm[0]) + " |")
        lines.append("| " + " | ".join(["---"] * width) + " |")
        body = norm[1:]
    else:
        body = norm
    for r in body:
        lines.append("| " + " | ".join(r) + " |")
    return "\n".join(lines)
