"""Property-based tests (SURVEY.md §5.4): chunk coverage, key
determinism/uniqueness, JSON partitioner invariants, ingest/purge fixed
points, schema contract."""

from __future__ import annotations

import json
import re

from hypothesis import given, settings, strategies as st

from gpt_rag_ingestion_spark.chunking.json_chunker import chunk_json_text
from gpt_rag_ingestion_spark.chunking.splitter import split_text_recursive

_WORD = st.text(alphabet="abcdefgh", min_size=1, max_size=8)


@settings(max_examples=40, deadline=None)
@given(st.lists(_WORD, min_size=1, max_size=400))
def test_chunk_coverage_property(words):
    """Every input word appears in some chunk (no content loss beyond
    the min-size filter, which we disable)."""
    text = " ".join(words)
    chunks = split_text_recursive(text, max_tokens=50, overlap_tokens=5, min_tokens=1)
    joined = " ".join(c["content"] for c in chunks)
    for w in set(words):
        assert w in joined


@settings(max_examples=40, deadline=None)
@given(st.lists(_WORD, min_size=1, max_size=400))
def test_chunk_ids_sequential_property(words):
    chunks = split_text_recursive(
        " ".join(words), max_tokens=50, overlap_tokens=5, min_tokens=1
    )
    assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))


_JSON = st.recursive(
    st.none() | st.booleans() | st.integers(-1000, 1000) | st.text(max_size=20),
    lambda children: st.lists(children, max_size=6)
    | st.dictionaries(st.text(max_size=8), children, max_size=6),
    max_leaves=40,
)


@settings(max_examples=40, deadline=None)
@given(_JSON)
def test_json_partitioner_parts_valid(obj):
    """Every emitted part parses as JSON, for arbitrary JSON inputs."""
    parts = chunk_json_text(json.dumps(obj), max_tokens=30)
    for p in parts:
        json.loads(p)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 10_000), min_size=1, max_size=150, unique=True))
def test_json_partitioner_list_items_preserved(ids):
    parts = chunk_json_text(json.dumps([{"id": i} for i in ids]), max_tokens=40)
    seen = []
    for p in parts:
        v = json.loads(p)
        seen.extend(x["id"] for x in (v if isinstance(v, list) else [v]))
    assert sorted(seen) == sorted(ids)


def test_key_determinism_and_uniqueness(spark):
    """F2 keys are deterministic and unique across (parent, chunk_id)."""
    from pyspark.sql import functions as F

    from gpt_rag_ingestion_spark.functions.keys import chunk_key

    rows = [(f"p{'x' * (i % 200)}{i}", j) for i in range(50) for j in range(4)]
    df = spark.createDataFrame(rows, ["p", "c"])
    k1 = [r["k"] for r in df.select(chunk_key("p", "c").alias("k")).collect()]
    k2 = [r["k"] for r in df.select(chunk_key("p", "c").alias("k")).collect()]
    assert k1 == k2
    assert len(set(k1)) == len(rows)
    assert all(re.fullmatch(r"[A-Za-z0-9_=-]+", k) for k in k1)


def test_ingest_purge_fixed_point(spark, tmp_path):
    """purge(ingest(X), live=X) deletes nothing; purge with live=∅
    empties the table; re-ingest restores it (idempotence loop)."""
    import datetime as dt

    from gpt_rag_ingestion_spark.plans.ingest_job import run_ingest_job
    from gpt_rag_ingestion_spark.plans.purge_job import run_purge_job

    table = str(tmp_path / "chunks")
    t0 = dt.datetime.fromisoformat("2024-01-01T00:00:00")
    docs = spark.createDataFrame(
        [("d1", "alpha " * 40, t0), ("d2", "beta " * 40, t0)],
        "doc_key STRING, text STRING, last_modified TIMESTAMP",
    )
    run_ingest_job(
        spark, docs, table, "r1", max_tokens=30, overlap=4, min_tokens=2,
        embedding_dim=8,
    )
    live = docs.selectExpr("doc_key AS parent_id")
    stats = run_purge_job(spark, table, live)
    assert stats["docsDeleted"] == 0
    assert stats["parentsBefore"] == stats["parentsAfter"] == 2

    # source loses d2 -> purge removes exactly d2's chunks
    live1 = spark.createDataFrame([("d1",)], ["parent_id"])
    stats2 = run_purge_job(spark, table, live1)
    assert stats2["parentsPurged"] == 1
    assert stats2["parentsAfter"] == 1


def test_entry_full_schema(spark):
    """entry() emits the canonical CHUNK_SCHEMA column set, including
    the zero-vector captionVector default."""
    import __spark_entry__ as m
    from gpt_rag_ingestion_spark.chunking.search_docs import assert_chunk_schema

    df = m.entry(spark)
    assert_chunk_schema(df)
    r = df.first()
    assert set(r["captionVector"]) == {0.0}
    assert r["title"] is not None
    # reference parity (_to_search_doc, blob_storage_indexer.py:793-818):
    # metadata_storage_path mirrors parent_id; optional string fields
    # default to "" and arrays to [] (never NULL)
    assert r["metadata_storage_path"] == r["parent_id"]
    assert r["imageCaptions"] == "" and r["summary"] == ""
    assert r["category"] == "" and r["metadata_security_rbac_scope"] == ""
    assert r["relatedImages"] == [] and r["relatedFiles"] == []
    assert r["metadata_security_user_ids"] == []
    assert r["source"] == "blob"


def test_embedding_neardup_matches_top1(spark):
    """Any pair found by the near-dup scorer must score >= threshold per
    the exact top-1 operator's arithmetic (cross-operator consistency)."""
    from gpt_rag_ingestion_spark.operators.dedup import embedding_neardup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pairs = embedding_neardup_pairs(emb, min_qdot=400_000).collect()
    assert all(p["qdot"] >= 400_000 and p["id_a"] < p["id_b"] for p in pairs)
