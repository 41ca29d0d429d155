"""Stdlib OOXML parsing (SURVEY.md S14; reference
chunking/chunker_factory.py:49-72 routes docx/pptx/xlsx, the reference
parses xlsx via openpyxl spreadsheet_chunker.py:318-344 and converts
docx/pptx through Document Intelligence into PageBreak markdown)."""

from __future__ import annotations

from gpt_rag_ingestion_spark.chunking.corpus import chunk_corpus
from gpt_rag_ingestion_spark.chunking.office import (
    PAGEBREAK,
    build_docx,
    build_pptx,
    build_xlsx,
    docx_to_markdown,
    parse_xlsx_workbook,
    pptx_to_markdown,
)


def test_xlsx_roundtrip_multi_sheet():
    payload = build_xlsx(
        [
            ("Alpha", [["h1", "h2"], ["a", "1"], ["b", "2"]]),
            ("Beta", [["k"], ["v"]]),
        ]
    )
    sheets = parse_xlsx_workbook(payload)
    assert [s["sheet_name"] for s in sheets] == ["Alpha", "Beta"]
    assert sheets[0]["rows"] == [["h1", "h2"], ["a", "1"], ["b", "2"]]
    assert sheets[1]["rows"] == [["k"], ["v"]]


def test_xlsx_shared_strings_gaps_and_types():
    """Hand-built sheet XML: shared strings, skipped cells (C1 then E1),
    skipped rows, numeric and boolean cells."""
    import io
    import zipfile

    buf = io.BytesIO()
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "xl/workbook.xml",
            f"<workbook {ns}><sheets>"
            '<sheet name="S" sheetId="1"/></sheets></workbook>',
        )
        zf.writestr(
            "xl/sharedStrings.xml",
            f"<sst {ns}><si><t>plain</t></si>"
            "<si><r><t>ri</t></r><r><t>ch</t></r></si></sst>",
        )
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            f"<worksheet {ns}><sheetData>"
            '<row r="1"><c r="A1" t="s"><v>0</v></c>'
            '<c r="C1" t="s"><v>1</v></c></row>'
            '<row r="3"><c r="A3"><v>3.25</v></c>'
            '<c r="B3" t="b"><v>1</v></c></row>'
            "</sheetData></worksheet>",
        )
    sheets = parse_xlsx_workbook(buf.getvalue())
    assert sheets[0]["rows"] == [
        ["plain", "", "rich"],
        ["", "", ""],
        ["3.25", "TRUE", ""],
    ]


def test_docx_to_markdown_headings_tables_pagebreaks():
    payload = build_docx(
        [
            ("h", 1, "Report Title"),
            "First paragraph words.",
            ("table", [["c1", "c2"], ["x", "y"]]),
            ("pagebreak",),
            ("h", 2, "Section"),
            "Second page words.",
        ]
    )
    md = docx_to_markdown(payload)
    assert "# Report Title" in md
    assert "## Section" in md
    assert "| c1 | c2 |\n| --- | --- |\n| x | y |" in md
    assert PAGEBREAK in md
    # page break lands between the pages' text
    assert md.index("First paragraph") < md.index(PAGEBREAK) < md.index(
        "Second page"
    )


def test_pptx_to_markdown_slide_order_and_breaks():
    payload = build_pptx(
        [
            ("Intro", ["welcome words here"]),
            ("Middle", ["content words"]),
            ("End", ["closing words"]),
        ]
    )
    md = pptx_to_markdown(payload)
    assert md.count(PAGEBREAK) == 2  # N slides -> N-1 breaks
    assert md.index("# Intro") < md.index("# Middle") < md.index("# End")
    assert "welcome words here" in md


def test_chunk_corpus_office_end_to_end(spark):
    """Real docx/pptx/xlsx bytes through the composed dispatch: office
    docs chunk with correct page attribution, workbook sheets each get
    a chunk."""
    docx = build_docx(
        ["page one words. " * 10, ("pagebreak",), "page two words. " * 10]
    )
    pptx = build_pptx(
        [("Slide A", ["alpha words. " * 8]), ("Slide B", ["beta words. " * 8])]
    )
    xlsx = build_xlsx(
        [
            ("First", [["h1", "h2"], ["1", "a"], ["2", "b"]]),
            ("Second", [["k"], ["z"]]),
        ]
    )
    docs = spark.createDataFrame(
        [("d-docx", "docx", docx), ("d-pptx", "pptx", pptx),
         ("d-xlsx", "xlsx", xlsx)],
        "doc_key string, extension string, payload binary",
    )
    rows = chunk_corpus(
        docs, max_tokens=40, overlap=0, min_tokens=1, embedding_dim=16,
        office_supported=True,
    ).collect()
    by_parent = {}
    for r in rows:
        by_parent.setdefault(r["parent_id"], []).append(r)
    assert set(by_parent) == {"d-docx", "d-pptx", "d-xlsx"}
    # docx/pptx go through doc-analysis with real page numbers
    assert {r["page"] for r in by_parent["d-docx"]} == {1, 2}
    assert {r["page"] for r in by_parent["d-pptx"]} == {1, 2}
    assert all(r["chunker"] == "doc_analysis" for r in by_parent["d-docx"])
    # every workbook sheet becomes a sheet-mode chunk, in order
    xl = sorted(by_parent["d-xlsx"], key=lambda r: r["chunk_id"])
    assert [r["title"] for r in xl] == ["First", "Second"]
    assert xl[0]["content"].startswith("|  |\n| h1 | h2 |")


def test_office_capability_gate_drops_without_flag(spark):
    docx = build_docx(["words here"])
    docs = spark.createDataFrame(
        [("d1", "docx", docx)],
        "doc_key string, extension string, payload binary",
    )
    assert (
        chunk_corpus(docs, min_tokens=1, office_supported=False).count() == 0
    )
