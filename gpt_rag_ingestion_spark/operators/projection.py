"""Config-driven field projection (SURVEY.md P6; reference
jobs/sharepoint_indexer.py:316-329, 1471-1483).

SharePoint list items carry a dynamic field bag; the collection config
specifies ``includeFields``/``excludeFields``.  Since the projection is
data-driven (config, not schema), the fields ride in a ``MAP<STRING,
STRING>`` column and the projection is ``map_filter`` — still fully
JVM-side.  With a fixed schema, prefer real columns + ``select``/
``drop`` so Catalyst prunes the scan."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def include_exclude_fields(
    df: DataFrame,
    map_col: str,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Keep map entries per include/exclude lists (include wins when both
    given, matching the reference's precedence)."""
    c = F.col(map_col)
    if include:
        inc = F.array(*[F.lit(k) for k in include])
        filtered = F.map_filter(c, lambda k, _v: F.array_contains(inc, k))
    elif exclude:
        exc = F.array(*[F.lit(k) for k in exclude])
        filtered = F.map_filter(c, lambda k, _v: ~F.array_contains(exc, k))
    else:
        filtered = c
    return df.withColumn(out_col or map_col, filtered)


def include_exclude_fields_by_cols(
    df: DataFrame,
    map_col: str,
    include_col: str,
    exclude_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """P6 with PER-ROW config: include/exclude arrive as array COLUMNS
    (the config-DF-driven hydration joins each item to its collection's
    config row), so one plan projects every collection at once — no
    per-collection driver loop.  Semantics match
    ``include_exclude_fields``: a null OR EMPTY include falls through
    to exclude (an all-blank includeFields list cleans to [] — it must
    not mean "keep nothing"); a non-empty include wins over exclude
    (reference precedence, sharepoint_indexer.py:316-329)."""
    c, inc, exc = F.col(map_col), F.col(include_col), F.col(exclude_col)
    filtered = (
        F.when(
            inc.isNotNull() & (F.size(inc) > 0),
            F.map_filter(c, lambda k, _v: F.array_contains(inc, k)),
        )
        .when(
            exc.isNotNull() & (F.size(exc) > 0),
            F.map_filter(c, lambda k, _v: ~F.array_contains(exc, k)),
        )
        .otherwise(c)
    )
    return df.withColumn(out_col or map_col, filtered)


def fields_map_to_text(map_col: str) -> Column:
    """F18 on a MAP column: sorted ``k: v`` lines (deterministic order)."""
    c = F.col(map_col)
    keys = F.array_sort(F.map_keys(c))
    lines = F.transform(keys, lambda k: F.concat(k, F.lit(": "), c[k]))
    return F.array_join(lines, "\n")
