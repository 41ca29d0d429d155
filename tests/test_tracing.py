"""Span tracing (operators/tracing): recorder nesting/exception
semantics and the trace algebra on hand-built trees."""

from __future__ import annotations

import pytest

from gpt_rag_ingestion_spark.operators.tracing import (
    SPAN_SCHEMA,
    SpanRecorder,
    critical_path,
    span_rollup,
)


def test_recorder_nesting_and_failure(spark):
    rec = SpanRecorder("t1")
    with rec.span("job", run="r1"):
        with rec.span("scan"):
            pass
        with pytest.raises(ValueError):
            with rec.span("merge"):
                raise ValueError("boom")
    df = rec.spans_df(spark)
    rows = {r["name"]: r for r in df.collect()}
    assert rows["scan"]["parent_id"] == rows["job"]["span_id"]
    assert rows["merge"]["parent_id"] == rows["job"]["span_id"]
    assert rows["merge"]["ok"] is False
    assert rows["job"]["ok"] is True  # exception was handled inside
    assert rows["job"]["attrs"] == {"run": "r1"}
    assert rows["job"]["parent_id"] is None


def _tree(spark):
    # root(100) -> a(60) -> leaf(50); root -> b(30)
    rows = [
        ("t", 0, None, "root", 0, 100, True, {}),
        ("t", 1, 0, "a", 0, 60, True, {}),
        ("t", 2, 0, "b", 0, 30, True, {}),
        ("t", 3, 1, "leaf", 0, 50, False, {}),
    ]
    return spark.createDataFrame(rows, SPAN_SCHEMA)


def test_span_rollup_self_time(spark):
    got = {r["name"]: r for r in span_rollup(_tree(spark)).collect()}
    assert got["root"]["self_ms"] == 10   # 100 - (60 + 30)
    assert got["a"]["self_ms"] == 10      # 60 - 50
    assert got["b"]["self_ms"] == 30
    assert got["leaf"]["self_ms"] == 50
    assert got["leaf"]["n_failed"] == 1


def test_critical_path_follows_heaviest_child(spark):
    path = [
        (r["depth"], r["name"])
        for r in critical_path(_tree(spark)).collect()
    ]
    assert path == [(0, "root"), (1, "a"), (2, "leaf")]
