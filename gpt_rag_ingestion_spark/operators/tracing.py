"""Span tracing for pipeline jobs — the offline analog of the
reference's OpenTelemetry layer (reference telemetry/telemetry.py
wraps each connector run and tool call in OTel spans exported to App
Insights).

Offline there is no collector, so the recorder keeps the part that
carries information — the span TREE with wall times and attributes —
as plain rows a DataFrame can analyze, and drops the part that needs
infrastructure (context propagation across processes, sampling,
exporters).  Driver-side only by design: spans describe job phases
(scan, chunk, merge, index append), which are driver-orchestrated;
per-row work is already measured inside the ops-log timings structs.

- ``SpanRecorder`` — a context-manager tree builder; ``span()``
  nests, records (trace_id, span_id, parent_id, name, start_ms,
  dur_ms, ok, attrs) and is exception-safe (a raise marks ok=false
  and re-raises — the crash is visible in the trace).
- ``spans_df`` — the recorded rows as a DataFrame (append it to an
  ops table next to run summaries).
- ``span_rollup`` — per-name aggregate (calls, total/self wall):
  SELF time = span duration minus direct children's, the number a
  flame graph gives you, computed relationally with one parent join.
- ``critical_path`` — the deepest-cost root→leaf chain per trace
  (iterative max-child descent; bounded by tree depth).

Determinism: wall-clock durations are inherently nondeterministic, so
trace queries are unit-tested on SYNTHETIC span rows (and q161 feeds
the rollup deterministic inputs) — the operator algebra is what is
oracle-checked, not the clock.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SPAN_SCHEMA = (
    "trace_id string, span_id long, parent_id long, name string, "
    "start_ms long, dur_ms long, ok boolean, attrs map<string,string>"
)


class SpanRecorder:
    """Collects one trace's spans; driver-side, bounded by the number
    of job phases (not rows)."""

    def __init__(self, trace_id: str):
        self.trace_id = trace_id
        self.rows: list[tuple] = []
        self._next_id = 0
        self._stack: list[int] = []

    @contextmanager
    def span(self, name: str, **attrs: str):
        sid = self._next_id
        self._next_id += 1
        parent = self._stack[-1] if self._stack else None
        self._stack.append(sid)
        t0 = time.monotonic()
        start_ms = int(time.time() * 1000)
        ok = True
        try:
            yield sid
        except BaseException:
            ok = False
            raise
        finally:
            self._stack.pop()
            self.rows.append(
                (
                    self.trace_id, sid, parent, name, start_ms,
                    int((time.monotonic() - t0) * 1000), ok,
                    {k: str(v) for k, v in attrs.items()},
                )
            )

    def spans_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.rows, SPAN_SCHEMA)


def span_rollup(spans: DataFrame) -> DataFrame:
    """(name, n_calls, total_ms, self_ms, n_failed): per-span-name
    aggregate with flame-graph SELF time = duration minus the sum of
    DIRECT children's durations.  One self-join on (trace, parent) —
    spans tables are phase-count-sized, so this is trivially cheap at
    any corpus scale."""
    kids = (
        spans.filter(F.col("parent_id").isNotNull())
        .groupBy("trace_id", F.col("parent_id").alias("span_id"))
        .agg(F.sum("dur_ms").alias("_child_ms"))
    )
    enriched = spans.join(kids, ["trace_id", "span_id"], "left").select(
        "name", "dur_ms", "ok",
        F.greatest(
            F.lit(0).cast("long"),
            F.col("dur_ms") - F.coalesce(F.col("_child_ms"), F.lit(0)),
        ).alias("_self_ms"),
    )
    return enriched.groupBy("name").agg(
        F.count(F.lit(1)).alias("n_calls"),
        F.sum("dur_ms").cast("long").alias("total_ms"),
        F.sum("_self_ms").cast("long").alias("self_ms"),
        F.sum(F.when(~F.col("ok"), 1).otherwise(0)).cast("long").alias(
            "n_failed"
        ),
    )


def critical_path(spans: DataFrame, max_depth: int = 32) -> DataFrame:
    """(trace_id, depth, span_id, name, dur_ms): the chain from each
    trace's root following the most expensive child at every level —
    where the wall time actually went.  Iterative joins bounded by
    ``max_depth``; span tables are tiny, so this is driver-cheap."""
    from pyspark.sql import Window

    current = spans.filter(F.col("parent_id").isNull()).select(
        "trace_id", "span_id", "name", "dur_ms",
        F.lit(0).alias("depth"),
    )
    out = current
    for _ in range(max_depth):
        nxt = (
            current.select(
                "trace_id", F.col("span_id").alias("parent_id"),
                F.col("depth").alias("_pd"),
            )
            .join(spans, ["trace_id", "parent_id"])
            .withColumn(
                "_rk",
                F.row_number().over(
                    Window.partitionBy("trace_id", "parent_id").orderBy(
                        F.desc("dur_ms"), F.asc("span_id")
                    )
                ),
            )
            .filter(F.col("_rk") == 1)
            .select(
                "trace_id", "span_id", "name", "dur_ms",
                (F.col("_pd") + 1).alias("depth"),
            )
        )
        if nxt.isEmpty():
            break
        out = out.unionByName(nxt)
        current = nxt
    return out.orderBy("trace_id", "depth")
