"""Bucketed co-located joins: correctness vs a plain join AND the
plan property the layout exists for (zero Exchange operators)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gpt_rag_ingestion_spark.operators.bucketing import (
    assert_colocated_join,
    colocated_join,
    write_bucketed,
)


def test_bucketed_join_is_exchange_free_and_correct(spark, tmp_path):
    left = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("a")
    ).repartition(7)  # deliberately unaligned input partitioning
    right = spark.range(0, 5000, 2).select(
        F.col("id").alias("k"), (F.col("id") * 5).alias("b")
    ).repartition(5)

    write_bucketed(left, "t_bkt_left", str(tmp_path / "l"), "k", 8)
    write_bucketed(right, "t_bkt_right", str(tmp_path / "r"), "k", 8)
    try:
        joined = colocated_join(spark, "t_bkt_left", "t_bkt_right", on="k")
        assert_colocated_join(joined)  # no Exchange anywhere

        want = sorted(
            tuple(r) for r in left.join(right, "k").collect()
        )
        got = sorted(tuple(r) for r in joined.collect())
        assert got == want
        assert len(got) == 2500

        # groupBy on the bucket key is exchange-free too
        agg = spark.table("t_bkt_left").groupBy("k").agg(F.sum("a"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_left")
        spark.sql("DROP TABLE IF EXISTS t_bkt_right")


def test_mismatched_buckets_detected(spark, tmp_path):
    """A bucket-count mismatch silently reintroduces the shuffle —
    the assertion hook must catch exactly that."""
    a = spark.range(0, 100).select(F.col("id").alias("k"))
    b = spark.range(0, 100).select(F.col("id").alias("k"))
    write_bucketed(a, "t_bkt_m1", str(tmp_path / "m1"), "k", 8)
    write_bucketed(b, "t_bkt_m2", str(tmp_path / "m2"), "k", 4)
    try:
        joined = colocated_join(spark, "t_bkt_m1", "t_bkt_m2", on="k")
        with pytest.raises(AssertionError, match="Exchange"):
            assert_colocated_join(joined)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_m1")
        spark.sql("DROP TABLE IF EXISTS t_bkt_m2")
