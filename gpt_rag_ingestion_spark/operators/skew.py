"""Skew-handling primitives: salting for hot keys (100 TB design note).

AQE's skew-join splitting handles most runtime skew, but two shapes
still need explicit salting on very hot keys (a parent document with
millions of chunks, a null-heavy join key):

- ``salted_aggregate``: two-phase aggregation — partial agg on
  (key, salt), final agg on key.  The classic map-side-combine
  generalization for aggregates that are algebraic (count/sum/min/max).
- ``salted_join``: replicate the small side ``salt_factor`` times and
  scatter the big side's hot keys across salts, so one reducer never
  receives a whole hot key.

Both are semantics-preserving rewrites — results equal the unsalted
plan (asserted in tests)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key: str,
    aggs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase agg: ``aggs`` maps output column -> one of
    count|sum:<col>|min:<col>|max:<col> (algebraic, so partials merge)."""
    salted = df.withColumn(
        "_salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )

    partial_exprs = []
    final_exprs = []
    for out, spec in aggs.items():
        if spec == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"_p_{out}"))
            final_exprs.append(F.sum(f"_p_{out}").alias(out))
        else:
            op, col = spec.split(":", 1)
            partial_exprs.append(getattr(F, op)(col).alias(f"_p_{out}"))
            merge = {"sum": F.sum, "min": F.min, "max": F.max}[op]
            final_exprs.append(merge(f"_p_{out}").alias(out))

    partial = salted.groupBy(key, "_salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has hot keys: big rows get a random salt
    in [0, salt_factor); small rows are replicated once per salt.  The
    shuffle key becomes (key, salt), splitting each hot key across
    ``salt_factor`` reducers.

    Only inner/left are semantics-preserving: an unmatched SMALL-side
    row exists once per salt, so right/full joins would emit it
    ``salt_factor`` times."""
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_join preserves semantics only for how in ('inner','left')"
        )
    big_s = big.withColumn("_salt", (F.rand(seed=11) * salt_factor).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    return big_s.join(small_s, on=[key, "_salt"], how=how).drop("_salt")
