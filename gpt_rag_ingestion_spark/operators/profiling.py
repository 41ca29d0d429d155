"""Corpus profiling operators (beyond-reference).

Per-group distribution statistics for corpus dashboards and mixture
design: counts, min/max/sum, and exact nearest-rank quantiles.  Every
value is an exact integer — quantiles are selected by rank with a
window, NOT interpolated (`percentile_cont`-style interpolation ranks
by a float whose last ulp differs between engines; nearest-rank is the
classic definition and reproduces bit-identically).

100 TB design: one hash-partition shuffle on the group column; the
rank selection and the aggregate ride the same partitioning (window +
groupBy on the same key = no second exchange).  Groups are sources /
languages / shards — thousands at most, but the per-group row streams
can be arbitrarily large; a skewed group is one sorted spill stream,
not a driver problem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_profile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group profile of an integer measure: ``n``, ``min_v``,
    ``max_v``, ``sum_v``, ``median_v`` (lower median, rank
    ``(n+1) div 2``), ``p90_v`` (nearest-rank, ``ceil(0.9 n)``).

    Ties order by (value, id) so the rank selection is total."""
    v = F.col(value_col).cast("long")
    wo = Window.partitionBy(group_col).orderBy(F.col("v"), F.col(id_col))
    wg = Window.partitionBy(group_col)
    ranked = (
        df.select(F.col(group_col), F.col(id_col), v.alias("v"))
        .withColumn("rn", F.row_number().over(wo))
        .withColumn("cnt", F.count(F.lit(1)).over(wg))
    )
    medians = ranked.filter(
        F.col("rn") == F.expr("(cnt + 1) div 2")
    ).select(F.col(group_col), F.col("v").alias("median_v"))
    p90s = ranked.filter(
        F.col("rn") == F.expr("(cnt * 9 + 9) div 10")
    ).select(F.col(group_col), F.col("v").alias("p90_v"))
    stats = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
        F.sum(v).alias("sum_v"),
    )
    return stats.join(medians, on=group_col).join(p90s, on=group_col)
