"""Tests for the C2 multimodal and C5 transcription chunker
compositions and the deterministic enrichers."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpt_rag_ingestion_spark.chunking.multimodal_chunker import (
    chunk_multimodal_documents,
)
from gpt_rag_ingestion_spark.chunking.transcription import chunk_transcriptions
from gpt_rag_ingestion_spark.embeddings import embed_text_deterministic
from gpt_rag_ingestion_spark.enrichers import (
    caption_deterministic,
    summarize_deterministic,
)

VTT = b"""WEBVTT

00:00:00.000 --> 00:00:02.000
<v Alice>We need to fix the pipeline today.

00:00:02.000 --> 00:00:04.000
<v Bob>Agreed, the merge step is broken.
"""


def test_summarize_deterministic_stable():
    s1 = summarize_deterministic("First sentence. Second one here. More words.")
    s2 = summarize_deterministic("First sentence. Second one here. More words.")
    assert s1 == s2
    assert s1.startswith("First sentence.")
    assert "[keywords:" in s1


def test_chunk_transcriptions_embeds_summary(spark):
    docs = spark.createDataFrame([("meet1", VTT)], ["doc_key", "bytes"])
    out = chunk_transcriptions(
        docs, max_tokens=20, overlap=2, min_tokens=1, embedding_dim=16
    ).collect()
    assert len(out) >= 1
    # parity quirk: contentVector is the embedding of the SUMMARY
    for r in out:
        assert "Alice:" in r["content"] or "Bob:" in r["content"]
        expected = embed_text_deterministic(r["summary"], 16)
        assert list(r["contentVector"]) == expected


def _mm_inputs(spark):
    md = (
        "intro text " * 30
        + "<figure>big chart</figure> middle " * 2
        + "<!-- PageBreak --> "
        + "tail text " * 30
        + "<figure>tiny logo</figure>"
    )
    docs = spark.createDataFrame([("doc1", md)], ["doc_key", "markdown"])
    figures = spark.createDataFrame(
        [
            # figure 1: 25% of page -> kept
            ("doc1", "1", [0.0, 0.0, 5.0, 0.0, 5.0, 5.0, 0.0, 5.0], 10.0, 10.0,
             b"chart-bytes", "imgs/chart.png"),
            # figure 2: 1% -> dropped by the area filter
            ("doc1", "2", [0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 1.0], 10.0, 10.0,
             b"logo-bytes", "imgs/logo.png"),
        ],
        "doc_key STRING, figure_id STRING, polygon ARRAY<DOUBLE>, "
        "page_width DOUBLE, page_height DOUBLE, image BINARY, image_url STRING",
    )
    return docs, figures


def test_chunk_multimodal_documents(spark):
    docs, figures = _mm_inputs(spark)
    out = chunk_multimodal_documents(
        docs, figures, max_tokens=60, overlap=5, min_tokens=1, embedding_dim=16
    ).collect()
    assert len(out) >= 2
    with_fig = [r for r in out if r["imageCaptions"] is not None]
    without_fig = [r for r in out if r["imageCaptions"] is None]
    assert with_fig and without_fig
    # kept figure joined: caption + relatedImages; area-filtered figure
    # (logo) never appears in any chunk's relatedImages
    all_related = {u for r in with_fig for u in (r["relatedImages"] or [])}
    assert all_related == {"imgs/chart.png"}
    fig_row = with_fig[0]
    assert fig_row["imageCaptions"].startswith("figure sha256:")
    # captionVector embeds the captions; others get the zero vector
    assert list(fig_row["captionVector"]) == embed_text_deterministic(
        fig_row["imageCaptions"], 16
    )
    assert set(without_fig[0]["captionVector"]) == {0.0}
    # page attribution survived the composition
    assert {r["page"] for r in out} == {1, 2}
    # dropped figure's tags are stripped from chunk content (reference
    # multimodal_chunker.py:255-275); the kept figure's tag survives
    joined_content = "\n".join(r["content"] for r in out)
    assert "<figure2>" not in joined_content
    assert "</figure2>" not in joined_content
    assert "<figure1>" in joined_content


def test_caption_deterministic():
    c = caption_deterministic(b"bytes")
    assert c == caption_deterministic(b"bytes")
    assert c.startswith("figure sha256:")


def test_caption_expr_matches_python(spark):
    """r12 perf: the JVM caption expression must stay byte-equal to
    caption_deterministic (the pandas-UDF form it replaced), including
    null/empty payloads and multi-byte content."""
    from gpt_rag_ingestion_spark.enrichers import caption_expr

    payloads = [
        (0, None),
        (1, b""),
        (2, b"bytes"),
        (3, b"\x00\xff" * 513),
        (4, "unicode ☃ text".encode("utf-8")),
        (5, bytes(range(256)) * 100),
    ]
    df = spark.createDataFrame(payloads, "i int, image binary")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", caption_expr(F.col("image")).alias("c")).collect()
    }
    for i, p in payloads:
        assert got[i] == caption_deterministic(p or b""), i
