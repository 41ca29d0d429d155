"""Data-quality expectations — the Delta Live Tables / Great
Expectations surface for a lakehouse ingest: declarative rules
evaluated in bulk, a violations report, and an expect-or-quarantine
split that routes failing rows to a side table instead of failing the
job.

The reference validates documents piecemeal in Python during ingestion
(file-size/extension gates, metadata checks scattered through
connectors and chunkers); this module is the set-based generalization:
rules are SQL predicates evaluated by Catalyst over the whole relation,
so a 100 TB expectation pass is ONE scan with conditional-sum
aggregates (row rules), plus one aggregate per uniqueness rule and one
broadcast anti-join per referential rule — no per-row Python anywhere.

Rule kinds:
  row      — a boolean SQL expression every row must satisfy; NULL
             counts as a violation (3VL: an expectation that cannot be
             proven true is not satisfied).
  unique   — a column set that must be key-unique; violations = rows
             beyond the first of each duplicate group.
  fk       — referential integrity: child columns must appear in the
             (broadcast) parent key set; NULL child keys are ignored
             (SQL FK semantics — NULLs never violate a foreign key).

Scale notes: row rules fold into ONE aggregate projection of the scan
(wide-row conditional sums — whole-stage codegen); `unique` costs one
hash aggregate on its column set; `fk` is a broadcast-anti count when
the parent key set is dimension-sized (the common case); quarantine is
a narrow projection evaluated once and split by a boolean — two
filter-reads of the SAME cached/columnar source, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _all_not_null(cols: list[Column]) -> Column:
    c = cols[0]
    for x in cols[1:]:
        c = c & x
    return c


def _row_violation(pred: str) -> Column:
    """1 where the row FAILS the expectation (false or NULL)."""
    return F.when(F.coalesce(F.expr(pred), F.lit(False)), F.lit(0)).otherwise(
        F.lit(1)
    )


def check_rules(
    df: DataFrame,
    row_rules: dict[str, str] | None = None,
    unique_rules: dict[str, list[str]] | None = None,
    fk_rules: dict[str, tuple[DataFrame, list[str], list[str]]] | None = None,
) -> DataFrame:
    """Evaluate every rule and return the violations report:
    (rule, kind, n_violations, n_rows) — one output row per rule,
    deterministic, driver-free.  The report is ONE lazy plan: calling
    this function runs no job; collecting the report costs one scan
    for all row rules, one hash aggregate per uniqueness rule, and one
    broadcast-anti aggregate per referential rule (cache ``df`` when
    several rule kinds share a non-columnar input).

    ``row_rules``: {name: sql_predicate} — all fold into ONE
    conditional-sum aggregate over a single scan.
    ``unique_rules``: {name: [cols]} — violations = n_rows minus the
    number of distinct groups (rows beyond the first per duplicate).
    ``fk_rules``: {name: (parent_df, child_cols, parent_cols)} —
    violations = child rows (with fully non-NULL keys) whose key tuple
    is absent from the parent.
    """
    row_rules = row_rules or {}
    unique_rules = unique_rules or {}
    fk_rules = fk_rules or {}
    reports: list[DataFrame] = []

    if row_rules:
        aggs = [F.count(F.lit(1)).alias("__n")] + [
            F.sum(_row_violation(pred)).alias(name)
            for name, pred in sorted(row_rules.items())
        ]
        one = df.agg(*aggs)
        # unpivot the single wide row with stack — still zero driver data
        names = sorted(row_rules)
        stack = ", ".join(f"'{n}', `{n}`" for n in names)
        reports.append(
            one.selectExpr(
                f"stack({len(names)}, {stack}) AS (rule, n_violations)",
                "__n AS n_rows",
            ).select(
                "rule", F.lit("row").alias("kind"),
                F.coalesce(F.col("n_violations"), F.lit(0))
                .cast("long").alias("n_violations"),
                F.col("n_rows").cast("long").alias("n_rows"),
            )
        )

    # ONE lazy single-row total, cross-joined into every unique/fk
    # report row — no eager driver-side .count() anywhere (r9 advisor:
    # check_rules must stay a lazy plan, and fk rules must not each
    # recompute the total)
    total = df.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))

    for name, cols in sorted(unique_rules.items()):
        nn = _all_not_null([F.col(c).isNotNull() for c in cols])
        # count_distinct skips rows with any NULL key column; count
        # those rows in the SAME aggregate so an all-NULL-key relation
        # does not read as fully duplicated.  A row with a NULL key
        # never violates uniqueness (SQL UNIQUE semantics).
        rep = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(*[F.col(c) for c in cols]).alias("__d"),
            F.sum(F.when(nn, F.lit(0)).otherwise(F.lit(1))).alias(
                "__null_any"
            ),
        )
        reports.append(
            rep.select(
                F.lit(name).alias("rule"),
                F.lit("unique").alias("kind"),
                (
                    F.col("n_rows")
                    - F.coalesce(F.col("__null_any"), F.lit(0))
                    - F.col("__d")
                ).cast("long").alias("n_violations"),
                F.col("n_rows").cast("long").alias("n_rows"),
            )
        )

    for name, (parent, child_cols, parent_cols) in sorted(fk_rules.items()):
        nn = _all_not_null([F.col(c).isNotNull() for c in child_cols])
        child = df.filter(nn)
        pk = parent.select(
            *[F.col(p).alias(c) for c, p in zip(child_cols, parent_cols)]
        ).distinct()
        orphans = child.join(F.broadcast(pk), on=child_cols, how="left_anti")
        reports.append(
            orphans.agg(
                F.count(F.lit(1)).cast("long").alias("n_violations")
            )
            .crossJoin(total)
            .select(
                F.lit(name).alias("rule"),
                F.lit("fk").alias("kind"),
                "n_violations",
                "n_rows",
            )
        )

    if not reports:
        raise ValueError("no rules given")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def split_quarantine(
    df: DataFrame, row_rules: dict[str, str]
) -> tuple[DataFrame, DataFrame]:
    """DLT's expect-or-drop with a paper trail: returns
    (passing_rows, quarantined_rows) where quarantined rows carry a
    deterministic comma-joined ``violated_rules`` column (rule names
    in sorted order).  The rule projection is computed ONCE per row in
    codegen; the two outputs are filters of the same relation, so
    caching the input (or writing both sides in one job via
    partitionBy on a pass flag) keeps this a single scan."""
    if not row_rules:
        raise ValueError("no rules given")
    names = sorted(row_rules)
    flagged = df.withColumn(
        "violated_rules",
        F.concat_ws(
            ",",
            F.array_compact(
                F.array(
                    *[
                        F.when(
                            _row_violation(row_rules[n]) == 1, F.lit(n)
                        )
                        for n in names
                    ]
                )
            ),
        ),
    )
    passing = flagged.filter(F.col("violated_rules") == "").drop(
        "violated_rules"
    )
    quarantined = flagged.filter(F.col("violated_rules") != "")
    return passing, quarantined
