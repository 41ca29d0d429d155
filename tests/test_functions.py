"""Unit tests for the column-function library (SURVEY.md §2.7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpt_rag_ingestion_spark.functions.keys import chunk_key, parent_key, sanitize_key
from gpt_rag_ingestion_spark.functions.text import (
    byte_truncate_udf,
    extension_of,
    filename_of,
    title_from_filename,
)
from gpt_rag_ingestion_spark.functions.tokens import approx_token_count
from gpt_rag_ingestion_spark.functions.acl import parse_acl_ids


def _one(spark, col, value=None):
    df = spark.createDataFrame([(value,)], ["x"])
    return df.select(col.alias("out")).first()["out"]


def test_sanitize_key(spark):
    assert _one(spark, sanitize_key("x"), "a/b c!!d") == "a-b-c-d"
    assert _one(spark, sanitize_key("x"), "--ab--") == "ab"
    assert _one(spark, sanitize_key("x"), "ok_A-Z=9") == "ok_A-Z=9"


def test_chunk_key_short_and_long(spark):
    df = spark.createDataFrame([("parent", 3), ("x" * 200, 1)], ["p", "c"])
    rows = df.select(chunk_key("p", "c").alias("k")).collect()
    assert rows[0]["k"] == "parent-c00003"
    long_key = rows[1]["k"]
    # 128-char base + '-' + 8 hex + '-c00001'
    assert long_key.startswith("x" * 128 + "-")
    assert long_key.endswith("-c00001")
    assert len(long_key) == 128 + 1 + 8 + len("-c00001")


def test_chunk_key_unique_for_long_bases(spark):
    # two bases identical in the first 128 chars must not collide (sha suffix)
    df = spark.createDataFrame([("a" * 128 + "1", 0), ("a" * 128 + "2", 0)], ["p", "c"])
    keys = {r["k"] for r in df.select(chunk_key("p", "c").alias("k")).collect()}
    assert len(keys) == 2


def test_parent_key(spark):
    df = spark.createDataFrame([("cont", "blob.pdf")], ["a", "b"])
    assert df.select(parent_key("a", "b").alias("k")).first()["k"] == "/cont/blob.pdf"


def test_filename_extension_title(spark):
    assert _one(spark, filename_of("x"), "/a/b/report_v2.PDF") == "report_v2.PDF"
    assert _one(spark, extension_of("x"), "/a/b/report_v2.PDF") == "pdf"
    assert _one(spark, extension_of("x"), "/a/b/noext") == ""
    # title-casing matches the reference's str.title(): FY24 -> Fy24
    # (reference base_chunker.py:236-264)
    assert (
        _one(spark, title_from_filename("x"), "annual_reportFY24.pdf")
        == "Annual Report Fy24"
    )


def test_byte_truncate(spark):
    # 3-byte chars: 20000 chars = 60000 bytes > 32766; cut must not split a char
    s = "€" * 20000
    out = _one(spark, byte_truncate_udf(F.col("x")), s)
    assert len(out.encode("utf-8")) <= 32766
    assert len(out.encode("utf-8")) > 32760
    assert all(c == "€" for c in out)
    short = _one(spark, byte_truncate_udf(F.col("x")), "abc")
    assert short == "abc"


def test_approx_token_count(spark):
    assert _one(spark, approx_token_count("x"), "hello, world!") == 4
    assert _one(spark, approx_token_count("x"), "") == 0


def test_parse_acl_ids(spark):
    # three encodings (reference blob_storage_indexer.py:1442-1477)
    assert _one(spark, parse_acl_ids("x"), '["a", "b", "a"]') == ["a", "b"]
    assert _one(spark, parse_acl_ids("x"), "['a','b']") == ["a", "b"]
    assert _one(spark, parse_acl_ids("x"), "a;b,c") == ["a", "b", "c"]


def test_parse_acl_cap_32(spark):
    many = ",".join(f"id{i}" for i in range(50))
    out = _one(spark, parse_acl_ids("x"), many)
    assert len(out) == 32
    assert out[0] == "id0"


def test_read_access_entities(spark):
    from gpt_rag_ingestion_spark.functions.acl import read_access_entities

    rows = [
        (
            [
                {"roles": ["read"], "user_ids": ["u1", "u2"]},
                {"roles": ["owner"], "user_ids": ["u9"]},  # dropped: no read/write
                {"roles": ["write", "other"], "user_ids": ["u2", "u3", None]},
                {"roles": ["read"], "user_ids": None},  # unresolvable grant
            ],
        )
    ]
    df = spark.createDataFrame(
        rows,
        "perms: array<struct<roles: array<string>, user_ids: array<string>>>",
    )
    out = df.select(read_access_entities("perms").alias("r")).first()["r"]
    # grant order preserved, dedup keeps first occurrence, nulls dropped
    assert out == ["u1", "u2", "u3"]
