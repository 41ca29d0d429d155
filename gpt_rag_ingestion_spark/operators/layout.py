"""Multi-dimensional data layout for min/max file skipping (Z-order).

Parquet readers prune files whose footer min/max excludes the
predicate.  Sorting by ONE column gives perfect pruning on that column
and none on any other; interleaving the bits of several columns'
normalized ranks (the Z-order / Morton curve — the same technique
behind Delta Lake's OPTIMIZE ZORDER BY and the classic UB-tree) bounds
every file to a small hyper-rectangle, so point/range predicates on
ANY of the participating columns skip most files.

Shape: one stats row (global min/max per column — a single tiny
aggregate), a pure-codegen bit-interleave expression (constant shift
amounts, so plain ``shiftleft``), then one range exchange on the
Z-value feeding ``sortWithinPartitions`` and the write.  Nothing
corpus-sized touches the driver.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(
    cols: list[str],
    mins: dict[str, float],
    maxs: dict[str, float],
    bits: int = 16,
) -> Column:
    """Morton code: each column scales to a ``bits``-bit integer rank
    between its global min/max, and bit b of column i lands at position
    b * n_cols + i.  All shift amounts are Python constants — the whole
    code is one codegen expression."""
    n = len(cols)
    parts: list[Column] = []
    for i, c in enumerate(cols):
        lo, hi = float(mins[c]), float(maxs[c])
        span = hi - lo
        if span <= 0:
            continue
        if lo.is_integer() and hi.is_integer() and int(span) == (1 << bits) - 1:
            # already-quantized input: pure integer arithmetic, exact
            # (and oracle-portable — no float rounding in the code)
            scaled = F.col(c).cast("long") - F.lit(int(lo))
        else:
            scaled = (
                (F.col(c).cast("double") - F.lit(lo))
                / F.lit(span)
                * F.lit((1 << bits) - 1)
            ).cast("long")
        for b in range(bits):
            bit = F.shiftright(scaled, b).bitwiseAND(F.lit(1).cast("long"))
            parts.append(F.shiftleft(bit, b * n + i))
    if not parts:
        return F.lit(0).cast("long")
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zorder_write(
    df: DataFrame,
    out_dir: str,
    cols: list[str],
    num_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``num_files`` parquet files clustered on the
    Z-curve over ``cols``: stats row → Morton code → one range exchange
    on the code → per-file sort → write."""
    stats = df.agg(
        *[F.min(c).alias(f"min_{c}") for c in cols],
        *[F.max(c).alias(f"max_{c}") for c in cols],
    ).collect()[0]
    mins = {c: stats[f"min_{c}"] for c in cols}
    maxs = {c: stats[f"max_{c}"] for c in cols}
    z = zorder_value(cols, mins, maxs, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def file_minmax_stats(out_dir: str, cols: list[str]) -> list[dict]:
    """Per-file footer min/max for ``cols`` — what a reader's pruning
    sees.  Driver-side metadata only (footers, not data)."""
    import glob

    import pyarrow.parquet as pq

    out = []
    for path in sorted(glob.glob(f"{out_dir}/*.parquet")):
        md = pq.ParquetFile(path).metadata
        lo: dict[str, float] = {}
        hi: dict[str, float] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    lo[name] = min(lo.get(name, s.min), s.min)
                    hi[name] = max(hi.get(name, s.max), s.max)
        out.append({"file": path, "min": lo, "max": hi})
    return out


def files_scanned_for_range(
    stats: list[dict], col: str, lo: float, hi: float
) -> int:
    """How many files a [lo, hi] predicate on ``col`` must read, given
    footer stats — the pruning-effectiveness metric."""
    return sum(
        1
        for s in stats
        if col in s["min"] and not (s["max"][col] < lo or s["min"][col] > hi)
    )
