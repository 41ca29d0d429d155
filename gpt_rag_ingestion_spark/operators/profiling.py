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


def column_stats(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-COLUMN statistics relation — the ANALYZE TABLE analog:
    (column, n_nonnull, n_null, n_distinct, min_value, max_value).

    One row per profiled column, computed in a SINGLE corpus pass: all
    per-column aggregates ride one HashAggregate (count/min/max fold
    map-side; the distincts expand but still share the scan), and the
    1-row result is unpivoted driver-free with ``stack``.  min/max are
    computed on the NATIVE type (string-min of numerics would be
    wrong) and cast to string only for the uniform output schema.

    These stats are what a cost-based optimizer or a data catalog
    ingests; at 100 TB swap exact ``countDistinct`` for the KMV sketch
    (operators/sketches.py) — same relation shape, mergeable across
    partitions."""
    if cols is None:
        cols = df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(F.count(F.lit(1)).alias("__total"), *aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return one.selectExpr(
        "__total",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_nonnull, n_distinct, min_value, max_value)",
    ).selectExpr(
        "column",
        "n_nonnull",
        "__total - n_nonnull AS n_null",
        "n_distinct",
        "min_value",
        "max_value",
    )


def grouped_correlation(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    x_scale: int = 100,
    y_scale: int = 100,
) -> DataFrame:
    """Per-group Pearson correlation computed the scale-correct way:
    ONE pass of partial-aggregable integer sums (n, Σx, Σy, Σxy, Σx²,
    Σy²) with x,y quantized to ``scale`` units, then the closed-form
    ratio on the tiny per-group rows.

    Unlike calling ``corr()`` directly, every accumulated term is an
    exact integer (order-independent, partial-agg/mergeable across
    shards — the same property as the sketch family), and the final
    few float ops run on identical inputs in any engine, so the result
    is oracle-checkable to 6 decimals.  The single-pass sums shape is
    also how you compute corr over 100 TB without a second scan for
    the means.

    Pick the scales so the per-row Σ(value·scale)² terms stay below
    2^63 — correlation is scale-invariant, so coarser quantization
    costs only quantization noise, never sum overflow.  The closed-form
    CROSS terms (n·Σxy − Σx·Σy etc.) outgrow int64 long before the
    sums do (n·Σxy ≈ 2e19 already at 600k rows of dollar-scale data —
    caught by the sf0.1 oracle sweep), so they are computed in
    DECIMAL(38,0): exact-integer in both engines (Spark decimal128,
    DuckDB HUGEINT), identical double rounding at the final ratio."""
    x = F.round(F.col(x_col) * x_scale).cast("long")
    y = F.round(F.col(y_col) * y_scale).cast("long")
    sums = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = F.sqrt(
        (d("n") * d("sxx") - d("sx") * d("sx")).cast("double")
    ) * F.sqrt(
        (d("n") * d("syy") - d("sy") * d("sy")).cast("double")
    )
    return sums.select(
        group_col,
        "n",
        F.round(num.cast("double") / den, 6).alias("corr"),
    )


def grouped_mode(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Exact per-group mode with a total tie-break (highest count,
    then smallest value) — two compact-key aggregations + one
    max_by; never a per-group sort.  The categorical twin of the
    exact-median in ``group_profile``."""
    counts = df.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # max_by over a struct gives the (count desc, value asc) argmax:
    # pack count with the NEGATED... strings can't negate — use min_by
    # over (neg count, value) via a struct ordering instead: Spark
    # compares structs lexicographically, so min of (-cnt, value) is
    # the tie-broken mode.
    return counts.groupBy(group_col).agg(
        F.min(
            F.struct((-F.col("cnt")).alias("nc"), F.col(value_col).alias("v"))
        ).alias("m")
    ).select(
        group_col,
        F.col("m.v").alias("mode_value"),
        (-F.col("m.nc")).alias("mode_count"),
    )
