"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.10 extension; the Spark-native form of the reference's
cross-run incremental state).

``streaming_first_seen`` is the canonical example: exactly-once
first-occurrence filtering keyed on a column, with the seen-set held in
Spark's state store (checkpointed, survives restarts) — the streaming
twin of the batch freshness join.  At scale the state store shards by
the grouping key, so the seen-set never centralizes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

FIRST_SEEN_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("first_value", StringType()),
        StructField("n_duplicates_dropped", LongType()),
    ]
)

_STATE = StructType([StructField("seen", LongType())])


def first_seen_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit the first row ever seen for this key; count later dupes into
    state.  State survives across micro-batches via the checkpoint."""
    (k,) = key
    seen = state.get[0] if state.exists else 0
    total = 0
    first_value = None
    for pdf in pdfs:
        if first_value is None and len(pdf):
            first_value = str(pdf.iloc[0]["value"])
        total += len(pdf)
    if seen == 0 and first_value is not None:
        state.update((total,))
        yield pd.DataFrame(
            {
                "key": [k],
                "first_value": [first_value],
                "n_duplicates_dropped": [total - 1],
            }
        )
    else:
        state.update((seen + total,))
        yield pd.DataFrame({"key": [], "first_value": [], "n_duplicates_dropped": []})


def streaming_first_seen(stream: DataFrame, key_col: str = "key") -> DataFrame:
    """Attach the stateful first-seen operator to a streaming DataFrame
    with columns (key, value)."""
    from gpt_rag_ingestion_spark.session import ensure_importable

    ensure_importable(stream)
    return stream.groupBy(key_col).applyInPandasWithState(
        first_seen_fn,
        outputStructType=FIRST_SEEN_OUTPUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("session_start_ms", LongType()),
        StructField("session_end_ms", LongType()),
        StructField("n_events", LongType()),
        StructField("closed_by", StringType()),  # 'gap' | 'timeout'
    ]
)

_SESSION_STATE = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n", LongType()),
    ]
)


def make_session_fn(gap_ms: int):
    """Custom stateful SESSION WINDOWS with event-time timeout — the
    applyInPandasWithState twin of ``session_window()`` that also lets
    arbitrary per-session logic ride along (the built-in can only
    aggregate).  State per key = the one OPEN session (three longs —
    bounded regardless of stream length); a batch's events close and
    emit any session whose gap is exceeded, and the state-store
    timeout (watermark-driven) closes idle sessions without waiting
    for another event — the part a batch rewrite cannot express."""

    def session_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [k], "session_start_ms": [start],
                    "session_end_ms": [last], "n_events": [n],
                    "closed_by": ["timeout"],
                }
            )
            return
        ts = sorted(
            int(t)
            for pdf in pdfs
            for t in pdf["ts_ms"].tolist()
        )
        out = {c: [] for c in
               ("key", "session_start_ms", "session_end_ms", "n_events",
                "closed_by")}
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        for t in ts:
            if last is not None and t - last > gap_ms:
                out["key"].append(k)
                out["session_start_ms"].append(start)
                out["session_end_ms"].append(last)
                out["n_events"].append(n)
                out["closed_by"].append("gap")
                start, n = t, 0
            if start is None:
                start = t
            last = t
            n += 1
        if start is not None:
            state.update((start, last, n))
            state.setTimeoutTimestamp(last + gap_ms)
        yield pd.DataFrame(out)

    return session_fn


def streaming_sessions(
    stream: DataFrame, gap_ms: int, key_col: str = "key"
) -> DataFrame:
    """Attach the stateful session operator to a stream with columns
    (key, ts TIMESTAMP); requires a watermark on ts (drives the
    event-time timeout that closes idle sessions)."""
    from pyspark.sql import functions as F

    from gpt_rag_ingestion_spark.session import ensure_importable

    ensure_importable(stream)
    staged = stream.withColumn(
        "ts_ms", (F.col("ts").cast("double") * 1000).cast("long")
    )
    return staged.groupBy(key_col).applyInPandasWithState(
        make_session_fn(gap_ms),
        outputStructType=SESSION_OUTPUT,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
