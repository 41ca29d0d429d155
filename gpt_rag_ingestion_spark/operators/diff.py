"""Snapshot diff — row-level audit between two table versions.

The reference's freshness/purge machinery answers "what changed"
operationally (J1 freshness join, J3-J6 purge anti-joins, the q92 CDC
decision table); this operator answers it forensically: given two
snapshots of a keyed table, emit every key whose row was added,
removed, or changed, with content digests for evidence.  This is the
audit half of time travel (Delta/Iceberg give version access; the
diff itself is this one full-outer join).

Plan: ONE full outer join on the key; row content is compared by an
md5 digest of the null-sentineled column concatenation, so the
shuffled payload is (key, 32-hex digest), never the row itself — at
100 TB the exchange carries ~50 bytes/row regardless of row width.
Digest construction is engine-portable (md5 + concat_ws with explicit
null sentinels), so the whole diff is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# field separator / null sentinel — outside the plausible value alphabet
_SEP = "\x01"
_NULL = "\x00"


def row_digest(cols: list[str]) -> Column:
    """md5 over the null-sentineled string forms of ``cols``."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """(key, change, old_digest, new_digest) with change in
    {added, removed, changed[, unchanged]}."""
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c != key]
    o = old.select(
        F.col(key), row_digest(compare_cols).alias("old_digest")
    )
    n = new.select(
        F.col(key), row_digest(compare_cols).alias("new_digest")
    )
    joined = o.join(n, on=key, how="full_outer")
    change = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(
        F.col(key), change.alias("change"), "old_digest", "new_digest"
    )
    if not include_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out
