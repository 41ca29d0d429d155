"""Range join via bucketization (beyond-reference scale technique).

A point-in-interval join (`e.ts BETWEEN i.start AND i.end`) has no
equality predicate, so Spark's only native plan is a broadcast
nested-loop — O(|events| x |intervals|), a non-starter at scale.  The
classic fix: discretize time into fixed buckets, explode each interval
onto every bucket it covers, and equi-join on the bucket id, keeping
the exact BETWEEN as a post-join filter.  Cost becomes
O(|events| + Σ interval_spans/bucket) shuffled on an 8-byte key, and
Catalyst picks a hash join.

Pick the bucket width near the median interval length: too small
explodes the interval side, too large fans events into many candidate
intervals.  Both degenerate gracefully — correctness never depends on
the width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner join of event rows to every interval containing their
    timestamp (half-open: start <= ts < end), as an equi-join on
    time buckets.  Returns events columns + intervals columns."""
    w = bucket_seconds * 1_000_000
    ev = events.withColumn(
        "_b", F.floor(F.unix_micros(F.col(ts_col)) / F.lit(w))
    )
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / F.lit(w)),
                # end is exclusive, but an interval ending exactly on a
                # bucket boundary still owns no part of that bucket —
                # subtract one microsecond before bucketing
                F.floor((F.unix_micros(F.col(end_col)) - 1) / F.lit(w)),
            )
        ),
    )
    return (
        ev.join(iv, on="_b")
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .drop("_b")
    )
