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


def test_ingest_job_records_phase_spans(spark, tmp_path):
    """run_ingest_job(recorder=...): the phase tree lands in the
    recorder and rolls up — the reference's per-run OTel trace."""
    from pyspark.sql import functions as F

    from gpt_rag_ingestion_spark.plans.ingest_job import run_ingest_job

    docs = spark.range(0, 8).select(
        F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("doc_key"),
        F.concat(F.lit("body text "), F.col("id").cast("string")).alias("text"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("last_modified"),
    )
    rec = SpanRecorder("run-1")
    with rec.span("ingest_job", run="run-1"):
        run_ingest_job(
            spark, docs, str(tmp_path / "chunks"), "run-1",
            min_tokens=1, recorder=rec,
        )
    df = rec.spans_df(spark)
    names = {r["name"] for r in df.collect()}
    assert {"ingest_job", "scan_freshness", "chunk_embed", "merge"} <= names
    roll = {r["name"]: r for r in span_rollup(df).collect()}
    assert roll["ingest_job"]["n_calls"] == 1
    assert roll["ingest_job"]["self_ms"] <= roll["ingest_job"]["total_ms"]
    path = [
        r["name"] for r in critical_path(df).collect()
    ]
    assert path[0] == "ingest_job" and len(path) == 2
