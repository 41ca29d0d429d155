"""Tests for P6 map projection and the retry ladder (A5/U4)."""

from __future__ import annotations

import pytest

from gpt_rag_ingestion_spark.enrichers import call_with_backoff
from gpt_rag_ingestion_spark.operators.projection import (
    fields_map_to_text,
    include_exclude_fields,
)


def _items(spark):
    return spark.createDataFrame(
        [(1, {"Title": "Doc", "Secret": "x", "Owner": "alice"})],
        "id INT, fields MAP<STRING,STRING>",
    )


def test_include_fields(spark):
    out = include_exclude_fields(_items(spark), "fields", include=["Title"])
    assert out.collect()[0]["fields"] == {"Title": "Doc"}


def test_exclude_fields(spark):
    out = include_exclude_fields(_items(spark), "fields", exclude=["Secret"])
    assert out.collect()[0]["fields"] == {"Title": "Doc", "Owner": "alice"}


def test_include_wins_over_exclude(spark):
    out = include_exclude_fields(
        _items(spark), "fields", include=["Title", "Secret"], exclude=["Secret"]
    )
    assert set(out.collect()[0]["fields"]) == {"Title", "Secret"}


def test_fields_map_to_text_sorted(spark):
    out = _items(spark).select(fields_map_to_text("fields").alias("t")).collect()
    assert out[0]["t"] == "Owner: alice\nSecret: x\nTitle: Doc"


def test_call_with_backoff_retries_then_succeeds():
    calls = {"n": 0}
    waits: list[float] = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 4:
            raise TimeoutError("429")
        return "ok"

    result, retries, waited = call_with_backoff(
        flaky, base_seconds=1.0, cap_seconds=60.0, sleep=waits.append
    )
    assert result == "ok"
    assert retries == 3
    assert waits == [1.0, 2.0, 4.0]
    assert waited == 7.0


def test_call_with_backoff_exhausts():
    def always_fail():
        raise ConnectionError("boom")

    with pytest.raises(ConnectionError):
        call_with_backoff(always_fail, max_attempts=3, sleep=lambda _d: None)
