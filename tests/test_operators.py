"""Operator semantics tests (SURVEY.md §2.2-2.6, §2.10)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gpt_rag_ingestion_spark.operators.freshness import (
    freshness_candidates,
    index_watermarks,
)
from gpt_rag_ingestion_spark.operators.purge import purge_orphan_images, purge_targets
from gpt_rag_ingestion_spark.operators.upsert import merge_upsert


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_freshness_skew_rule(spark):
    """P2: strictly-newer-by-more-than-1s (reference
    sharepoint_ingestion_config.py:111-114)."""
    state = spark.createDataFrame(
        [("a", _ts("2024-01-01T00:00:00"))], ["parent_id", "watermark_ts"]
    )
    src = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T00:00:00.500")),  # within skew -> drop
            ("a", _ts("2024-01-01T00:00:01.000")),  # exactly 1s -> drop
            ("a", _ts("2024-01-01T00:00:01.000001")),  # just over -> keep
            ("b", _ts("2023-01-01T00:00:00")),  # no watermark -> keep
        ],
        ["parent_id", "last_modified"],
    )
    out = freshness_candidates(src, state).collect()
    kept = sorted((r["parent_id"], r["last_modified"].isoformat()) for r in out)
    assert kept == [
        ("a", "2024-01-01T00:00:01.000001"),
        ("b", "2023-01-01T00:00:00"),
    ]


def test_index_watermarks(spark):
    chunks = spark.createDataFrame(
        [
            ("p1", _ts("2024-01-01T00:00:00")),
            ("p1", _ts("2024-02-01T00:00:00")),
            ("p2", _ts("2024-03-01T00:00:00")),
        ],
        ["parent_id", "metadata_storage_last_modified"],
    )
    wm = {r["parent_id"]: r["watermark_ts"] for r in index_watermarks(chunks).collect()}
    assert wm["p1"] == _ts("2024-02-01T00:00:00")
    assert wm["p2"] == _ts("2024-03-01T00:00:00")


def test_purge_targets(spark):
    index = spark.createDataFrame([("a",), ("b",), ("c",)], ["parent_id"])
    live = spark.createDataFrame([("a",), ("c",)], ["parent_id"])
    out = {r["parent_id"] for r in purge_targets(index, live, "parent_id").collect()}
    assert out == {"b"}


def test_purge_orphan_images(spark):
    chunks = spark.createDataFrame(
        [("c1", ["img1", "img2"]), ("c2", None)], ["id", "relatedImages"]
    )
    listing = spark.createDataFrame([("img1",), ("img2",), ("img3",)], ["url"])
    out = {r["url"] for r in purge_orphan_images(listing, chunks).collect()}
    assert out == {"img3"}


def test_merge_upsert_idempotent(spark, tmp_path):
    """§2.10: delete-then-insert per parent; re-running the same batch is
    a no-op (deterministic keys -> idempotence)."""
    path = str(tmp_path / "chunks")
    b1 = spark.createDataFrame(
        [("p1", 0, "v1"), ("p1", 1, "v1"), ("p2", 0, "v1")],
        ["parent_id", "chunk_id", "payload"],
    )
    merge_upsert(spark, path, b1)
    assert spark.read.parquet(path).count() == 3

    # re-run identical batch -> same table
    merge_upsert(spark, path, b1)
    assert spark.read.parquet(path).count() == 3

    # p1 re-ingested with fewer chunks -> old p1 rows fully replaced
    b2 = spark.createDataFrame([("p1", 0, "v2")], ["parent_id", "chunk_id", "payload"])
    merge_upsert(spark, path, b2)
    rows = spark.read.parquet(path).collect()
    assert len(rows) == 2
    p1 = [r for r in rows if r["parent_id"] == "p1"]
    assert len(p1) == 1 and p1[0]["payload"] == "v2"


def test_union_by_source_discriminator(spark):
    """§2.6: blob + sharepoint pipelines union into one table."""
    blob = spark.createDataFrame([("b1", "blob")], ["id", "source"])
    sp = spark.createDataFrame([("s1", "sharepoint-list")], ["id", "source"])
    out = blob.unionByName(sp)
    assert out.count() == 2
    assert {r["source"] for r in out.collect()} == {"blob", "sharepoint-list"}
