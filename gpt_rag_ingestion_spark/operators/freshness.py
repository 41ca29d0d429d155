"""Incremental-ingest freshness operators (SURVEY.md J1/P1/P2, A1, S9).

Reference shape: page the whole index to build a ``parent_id ->
max(last_modified)`` dict (reference jobs/blob_storage_indexer.py:821-897),
then keep a source item iff it is absent or strictly newer with a 1 s
clock-skew tolerance (reference jobs/blob_storage_indexer.py:293-302,
jobs/sharepoint_ingestion_config.py:111-114).

Spark shape: the watermark map is a plain aggregation; the probe is a
LEFT OUTER equi-join + filter.  The watermark side is one row per
parent — tiny relative to the source at any scale — so we broadcast it
explicitly; at 100 TB the listing never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRESHNESS_SKEW_SECONDS = 1.0  # reference sharepoint_ingestion_config.py:111-114


def index_watermarks(
    chunks: DataFrame,
    key: str = "parent_id",
    ts: str = "metadata_storage_last_modified",
) -> DataFrame:
    """A1/S9: ``key -> max(ts)`` over the chunks table.  Replaces the
    reference's 1000-docs-per-page remote scan (and its 100k-doc hard
    cap, blob_storage_indexer.py:846-853) with one shuffle-partial agg."""
    return chunks.groupBy(key).agg(F.max(ts).alias("watermark_ts"))


def freshness_candidates(
    source: DataFrame,
    watermarks: DataFrame,
    key: str = "parent_id",
    ts: str = "last_modified",
    skew_seconds: float = FRESHNESS_SKEW_SECONDS,
) -> DataFrame:
    """J1/P1/P2: rows of ``source`` that are new (no watermark) or
    strictly newer than the watermark by more than ``skew_seconds``."""
    wm = F.broadcast(watermarks.select(key, "watermark_ts"))
    joined = source.join(wm, on=key, how="left")
    # integer-microsecond comparison: exact, engine-portable (no float)
    skew_us = int(skew_seconds * 1_000_000)
    fresh = F.col("watermark_ts").isNull() | (
        F.unix_micros(F.col(ts)) - F.unix_micros(F.col("watermark_ts")) > F.lit(skew_us)
    )
    return joined.filter(fresh).drop("watermark_ts")


def sync_actions(
    source: DataFrame,
    watermarks: DataFrame,
    key: str = "parent_id",
    ts: str = "last_modified",
    skew_seconds: float = FRESHNESS_SKEW_SECONDS,
) -> DataFrame:
    """The whole incremental-sync decision table in one relation —
    the composition the reference runs as two separate passes
    (freshness keep-list, jobs/blob_storage_indexer.py:293-302, then
    the deletion sweep, :899-934): classify EVERY key in one full-outer
    join of source listing vs index watermarks.

    Actions: ``index`` (no watermark), ``reindex`` (newer than
    watermark + skew), ``skip`` (present, not newer), ``purge`` (in the
    index, gone from the source).

    Scale: both inputs are one row per key (aggregates), so the
    full-outer shuffle moves two key-compacted relations — never the
    chunk table or the raw listing; downstream jobs filter on
    ``action``, keeping one classification pass for the entire sync."""
    src = source.select(F.col(key), F.col(ts).alias("src_ts"))
    wm = watermarks.select(key, "watermark_ts")
    joined = src.join(wm, on=key, how="full_outer")
    skew_us = int(skew_seconds * 1_000_000)
    newer = (
        F.unix_micros(F.col("src_ts")) - F.unix_micros(F.col("watermark_ts"))
        > F.lit(skew_us)
    )
    action = (
        F.when(F.col("watermark_ts").isNull(), F.lit("index"))
        .when(F.col("src_ts").isNull(), F.lit("purge"))
        .when(newer, F.lit("reindex"))
        .otherwise(F.lit("skip"))
    )
    return joined.select(
        F.col(key), action.alias("action"), "src_ts", "watermark_ts"
    )
