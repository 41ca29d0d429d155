"""As-of (point-in-time) join — beyond-reference, time-series family.

Spark has no built-in as-of join (pandas ``merge_asof`` exists only in
pandas-on-Spark, where it falls back to an expensive range join).  The
scalable relational formulation is the *union-window* plan:

1. tag right rows side=0, left rows side=1;
2. union on (key, ts, side) and sort each key's timeline once —
   ``Window.partitionBy(key).orderBy(ts, side)``;
3. propagate the most recent right-side payload forward with
   ``last(payload, ignorenulls=True)`` over rows unbounded-preceding →
   current row (side=0 sorts before side=1 at equal ts, which makes the
   match inclusive: r.ts <= l.ts);
4. keep only left rows; optionally null out matches older than
   ``tolerance``.

Cost model: exactly ONE shuffle of (key, ts) pairs plus a per-key sort —
the same exchange a groupBy(key) would pay — versus the O(|L|·|R|)
blow-up of the naive inequality join.  At 100 TB the timeline sort is
the optimal plan (it is what kdb+/QuestDB/DuckDB ASOF do natively);
skewed keys can reuse operators/skew.py salting on the union input
because forward-fill only needs per-key ordering, which salt-by-range
preserves if the salt is a ts-range bucket.

Right-side rows are deduplicated to one payload per (key, ts) with a
deterministic ``max_by`` tie-break so results are reproducible (DuckDB's
ASOF JOIN leaves equal-timestamp winners unspecified; we pin them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    payload_cols: list[str],
    tiebreak_col: str | None = None,
    tolerance: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the payload of the nearest right row at
    or before (``backward``) / at or after (``forward``) its timestamp,
    matching on ``on``.  Unmatched left rows keep null payloads (left
    join semantics).

    ``payload_cols`` are taken from ``right`` and emitted as
    ``asof_<name>``; ``asof_ts`` carries the matched right timestamp so
    callers can compute staleness.  ``tolerance`` (an interval/long
    Column in the units of ``ts_col``) nulls out matches further away
    than the bound, as in ``pandas.merge_asof``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")

    tie = tiebreak_col or payload_cols[0]
    payload = F.struct(
        F.col(ts_col).alias("asof_ts"),
        *[F.col(c).alias(f"asof_{c}") for c in payload_cols],
    )
    # one deterministic payload per (key, ts): highest tiebreak wins
    r = right.groupBy(on, ts_col).agg(
        F.max_by(payload, F.col(tie)).alias("__asof_payload")
    )

    l_tagged = left.withColumn("__asof_side", F.lit(1)).withColumn(
        "__asof_payload", F.lit(None).cast(r.schema["__asof_payload"].dataType)
    )
    r_tagged = r.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("__asof_side"),
        F.col("__asof_payload"),
    )
    merged = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    if direction == "backward":
        # side=0 first at equal ts → inclusive r.ts <= l.ts
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(ts_col).asc(), F.col("__asof_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(ts_col).desc(), F.col("__asof_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    filled = merged.withColumn(
        "__asof_match", F.last("__asof_payload", ignorenulls=True).over(w)
    )

    out = filled.filter(F.col("__asof_side") == 1)
    if tolerance is not None:
        gap = (
            F.col(f"__asof_match.asof_ts") - F.col(ts_col)
            if direction == "forward"
            else F.col(ts_col) - F.col("__asof_match.asof_ts")
        )
        out = out.withColumn(
            "__asof_match",
            F.when(gap <= tolerance, F.col("__asof_match")),
        )
    return out.select(
        *[c for c in left.columns],
        F.col("__asof_match.asof_ts").alias("asof_ts"),
        *[
            F.col(f"__asof_match.asof_{c}").alias(f"asof_{c}")
            for c in payload_cols
        ],
    )
