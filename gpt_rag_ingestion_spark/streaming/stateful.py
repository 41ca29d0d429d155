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
