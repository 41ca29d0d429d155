"""Composed mixed-corpus dispatch (SURVEY.md C8 + C3 sheet mode + C4
format-aware splitting; reference chunker_factory.py:34-87,
document_chunking.py:49-62, spreadsheet_chunker.py:82-209,
langchain_chunker.py:100-137)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from gpt_rag_ingestion_spark.chunking.corpus import chunk_corpus
from gpt_rag_ingestion_spark.chunking.splitter import (
    MARKDOWN_SEPARATORS,
    PYTHON_SEPARATORS,
    split_text_recursive,
)
from gpt_rag_ingestion_spark.chunking.spreadsheet import (
    chunk_sheet_mode,
    sheet_grid_markdown,
)


def _mixed_docs(spark):
    rows = [
        ("d-md", "md",
         b"# Title\n\nintro words here. " + b"body words " * 40
         + b"\n## Section Two\n\nmore words here. " + b"tail words " * 40),
        ("d-txt", "txt", b"Sentence one is here. " * 30),
        ("d-json", "json",
         b'{"a": {"x": 1, "y": "text"}, "b": [1, 2, 3], "c": "'
         + b"w " * 50 + b'"}'),
        ("d-vtt", "vtt",
         b"WEBVTT\n\n00:00:00.000 --> 00:00:05.000\n<v Alice>Hello there"
         b" everyone today.\n\n00:00:05.000 --> 00:00:10.000\n<v Bob>"
         b"Replying with more words now.\n"),
        ("d-pdf", "pdf",
         b"page one words here. " * 10 + b"<!-- PageBreak --> "
         + b"page two words here. " * 10),
        ("d-xls", "xls", b"col1,col2\n1,a\n2,b\n3,c"),
        ("d-nl2sql", "nl2sql",
         b'{"q1": {"question": "how many", "query": "SELECT 1"},'
         b' "q2": {"question": "why", "query": "SELECT 2"}}'),
        # docx with the office capability OFF -> unsupported -> dropped
        # (the reference raises for docx without DI 4.0/CU)
        ("d-bin", "docx", b"\x00\x01"),
    ]
    return spark.createDataFrame(
        rows, "doc_key string, extension string, payload binary"
    )


def test_chunk_corpus_routes_every_family(spark):
    out = chunk_corpus(
        _mixed_docs(spark), max_tokens=60, overlap=5, min_tokens=1,
        embedding_dim=16,
    )
    rows = out.collect()
    by_family = {}
    for r in rows:
        by_family.setdefault(r["chunker"], []).append(r)
    assert set(by_family) == {
        "langchain", "doc_analysis", "spreadsheet", "transcription",
        "json", "nl2sql",
    }
    # unsupported extensions are dropped, like the factory's error path
    assert not any(r["parent_id"] == "d-bin" for r in rows)
    # every chunk everywhere carries deterministic keys + an embedding
    for r in rows:
        assert r["id"].startswith(r["parent_id"])
        assert r["contentVector"] is not None and len(r["contentVector"]) == 16
    # JSON family (C6): every part is itself valid JSON
    for r in by_family["json"]:
        json.loads(r["content"])
    # NL2SQL family (C7): one chunk per top-level key, key as title
    assert sorted(r["title"] for r in by_family["nl2sql"]) == ["q1", "q2"]
    # doc-analysis family: page attribution crossed the break
    assert {r["page"] for r in by_family["doc_analysis"]} == {1, 2}
    # transcription family: summary rides on the chunk
    assert all(r["summary"] for r in by_family["transcription"])


def test_office_capability_gate(spark):
    """docx/pptx route to doc-analysis only when the capability flag is
    set (reference chunker_factory.py:60-68)."""
    from gpt_rag_ingestion_spark.chunking.factory import chunker_for_extension
    from pyspark.sql import functions as F  # noqa: F811

    df = spark.createDataFrame([("docx",), ("pptx",), ("pdf",)], ["ext"])
    off = {
        r["ext"]: r["c"]
        for r in df.select(
            "ext", chunker_for_extension("ext").alias("c")
        ).collect()
    }
    assert off == {"docx": "unsupported", "pptx": "unsupported", "pdf": "doc_analysis"}
    on = {
        r["ext"]: r["c"]
        for r in df.select(
            "ext", chunker_for_extension("ext", office_supported=True).alias("c")
        ).collect()
    }
    assert on == {
        "docx": "doc_analysis", "pptx": "doc_analysis", "pdf": "doc_analysis",
    }


def test_chunk_corpus_json_exactness(spark):
    """The exploded JSON parts equal chunk_json_text run directly."""
    from gpt_rag_ingestion_spark.chunking.json_chunker import chunk_json_text

    payload = (
        '{"a": {"x": 1, "y": "text"}, "b": [1, 2, 3], "c": "' + "w " * 50 + '"}'
    )
    docs = spark.createDataFrame(
        [("j1", "json", payload.encode())],
        "doc_key string, extension string, payload binary",
    )
    out = (
        chunk_corpus(docs, max_tokens=60, overlap=5, min_tokens=1)
        .orderBy("chunk_id")
        .collect()
    )
    expected = chunk_json_text(payload, max_tokens=60)
    assert [r["content"] for r in out] == expected


def test_sheet_grid_markdown_matches_reference_cleanup():
    """tabulate-grid + _clean_markdown_table collapses border lines to
    '|  |' and strips cells to single-space padding
    (reference spreadsheet_chunker.py:354-376)."""
    got = sheet_grid_markdown(["h1", "h2"], [["a", "b"], ["c", ""]])
    assert got == (
        "|  |\n| h1 | h2 |\n|  |\n| a | b |\n|  |\n| c |  |\n|  |"
    )


def test_chunk_sheet_mode_overflow_fallback(spark):
    """When the table exceeds the token budget the SUMMARY becomes the
    content; the summary always feeds the embedding
    (reference spreadsheet_chunker.py:105-129)."""
    from gpt_rag_ingestion_spark.embeddings import embed_text_deterministic

    big_rows = [[f"cell{i}", f"value{i}"] for i in range(80)]
    sheets = spark.createDataFrame(
        [
            ("doc1", 0, "Small", ["a", "b"], [["1", "2"]]),
            ("doc1", 1, "Big", ["a", "b"], big_rows),
        ],
        "doc_key string, sheet_pos int, sheet_name string, "
        "headers array<string>, rows array<array<string>>",
    )
    out = {
        r["title"]: r
        for r in chunk_sheet_mode(
            sheets, max_tokens=50, embedding_dim=16
        ).collect()
    }
    small, big = out["Small"], out["Big"]
    # chunk ids number sheets in workbook order
    assert small["chunk_id"] == 0 and big["chunk_id"] == 1
    assert small["content"].startswith("|  |\n| a | b |")
    # overflow: content IS the summary
    assert big["content"] == big["summary"]
    assert small["content"] != small["summary"]
    # embedding text = summary when non-empty
    for r in (small, big):
        assert list(r["contentVector"]) == embed_text_deterministic(
            r["summary"], 16
        )


def test_markdown_and_python_separators():
    """C4: '#'-headed markdown splits at headers (header glued to its
    section); python splits at def/class boundaries."""
    md = (
        "# One\n\nalpha words here. " + "pad " * 60
        + "\n## Two\n\nbeta words here. " + "pad " * 60
    )
    pieces = split_text_recursive(
        md, max_tokens=70, overlap_tokens=0, min_tokens=1,
        separators=MARKDOWN_SEPARATORS,
    )
    starts = [p["content"] for p in pieces]
    assert any(s.startswith("## Two") or s.startswith("\n## Two") for s in starts)
    # no chunk straddles the header boundary mid-section
    assert all(("## Two" not in s) or s.lstrip().startswith("#") for s in starts)

    py = (
        "import os\n\ndef first():\n    return 1\n" + "# pad\n" * 80
        + "\ndef second():\n    return 2\n" + "# pad\n" * 80
    )
    pieces = split_text_recursive(
        py, max_tokens=120, overlap_tokens=0, min_tokens=1,
        separators=PYTHON_SEPARATORS,
    )
    starts = [p["content"] for p in pieces]
    assert any(s.startswith("\ndef second") or s.startswith("def second") for s in starts)


def test_q53_q54_driver_queries(spark):
    import __spark_entry__ as m

    out53 = m.q53_mixed_corpus(spark, "/root/testdata/sf0.001")
    fams = {r["chunker"] for r in out53.select("chunker").distinct().collect()}
    assert {"langchain", "json", "transcription", "doc_analysis"} <= fams
    out54 = m.q54_sheet_mode(spark, "/root/testdata/sf0.001")
    rows = out54.collect()
    assert rows and all(r["content"].startswith("|  |\n| p_partkey |") for r in rows)
