"""Chunker tests (SURVEY.md §2.8, §5.1/§5.4)."""

from __future__ import annotations

import json

from gpt_rag_ingestion_spark.chunking.json_chunker import chunk_json_text
from gpt_rag_ingestion_spark.chunking.splitter import (
    chunk_fixed,
    split_text_recursive,
)
from gpt_rag_ingestion_spark.chunking.vtt_chunker import parse_vtt_turns, vtt_to_text


def test_recursive_split_small_text_single_chunk():
    chunks = split_text_recursive("hello world " * 10, max_tokens=100, min_tokens=1)
    assert len(chunks) == 1
    assert chunks[0]["chunk_id"] == 0


def test_recursive_split_respects_budget_and_numbers_chunks():
    text = "\n\n".join(" ".join(f"w{i}_{j}" for j in range(40)) for i in range(20))
    chunks = split_text_recursive(text, max_tokens=100, overlap_tokens=10, min_tokens=1)
    assert len(chunks) > 3
    assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
    # every original word is covered by some chunk
    joined = " ".join(c["content"] for c in chunks)
    for i in range(20):
        assert f"w{i}_0" in joined


def test_recursive_split_min_chunk_filter():
    # ~10 tokens with min 100 -> kept as a single whole-text chunk is NOT
    # allowed (below min) -> empty
    chunks = split_text_recursive("tiny doc here", max_tokens=2048, min_tokens=100)
    assert chunks == []


def test_recursive_split_offsets_monotonic():
    text = ". ".join(f"sentence number {i} with words" for i in range(100))
    chunks = split_text_recursive(text, max_tokens=60, overlap_tokens=5, min_tokens=1)
    offsets = [c["offset"] for c in chunks]
    assert offsets == sorted(offsets)


def test_chunk_fixed_counts(spark):
    df = spark.createDataFrame([(1, "a" * 450), (2, ""), (3, None)], ["id", "text"])
    out = chunk_fixed(df, "text", size=200, overlap=40).collect()
    # 450 chars, step 160 -> chunks at 0,160,320 -> 3 chunks; empty/null -> 0
    assert len(out) == 3
    by_id = sorted((r["chunk_id"], len(r["content"])) for r in out)
    assert by_id == [(0, 200), (1, 200), (2, 130)]


def test_json_chunker_parts_are_valid_json():
    obj = {"items": [{"k": i, "text": "x" * 50} for i in range(100)]}
    parts = chunk_json_text(json.dumps(obj), max_tokens=200)
    assert len(parts) > 1
    for p in parts:
        json.loads(p)  # every part valid JSON (reference json_chunker contract)


def test_json_chunker_preserves_all_items():
    obj = [{"id": i} for i in range(200)]
    parts = chunk_json_text(json.dumps(obj), max_tokens=100)
    seen = []
    for p in parts:
        v = json.loads(p)
        seen.extend(x["id"] for x in (v if isinstance(v, list) else [v]))
    assert sorted(seen) == list(range(200))


def test_json_chunker_invalid_json_passthrough():
    assert chunk_json_text("not json {", max_tokens=10) == ["not json {"]


VTT = """WEBVTT

1
00:00:00.000 --> 00:00:02.000
<v Alice>Hello there.

2
00:00:02.000 --> 00:00:04.000
<v Alice>How are you?

3
00:00:04.000 --> 00:00:06.000
<v Bob>Fine, thanks.
"""


def test_vtt_speaker_turns_merge_consecutive():
    turns = parse_vtt_turns(VTT)
    assert turns == [
        ("Alice", "Hello there. How are you?"),
        ("Bob", "Fine, thanks."),
    ]
    text = vtt_to_text(VTT)
    assert text.splitlines()[0] == "Alice: Hello there. How are you?"
