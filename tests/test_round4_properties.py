"""Property tests for the round-4 additions (hypothesis)."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=4),  # few keys -> real skew
        min_size=1,
        max_size=60,
    ),
    cap=st.integers(min_value=1, max_value=12),
    priors=st.dictionaries(
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=0, max_value=15),
        max_size=5,
    ),
)
@pytest.mark.slow
def test_per_key_capped_rank_equals_raw_window(spark, keys, cap, priors):
    """The two-phase capped rank must reproduce EXACTLY the rank of
    ``row_number() over (partition by key order by md5(id), id)`` plus
    the prior offset — for every row of every over-cap key — and emit
    NO row for keys that cannot exceed the cap."""
    from pyspark.sql import Window

    from gpt_rag_ingestion_spark.operators.ranking import per_key_capped_rank

    rows = [(i, k) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "doc_id long, key long")
    prior_df = (
        spark.createDataFrame(
            [(k, n) for k, n in priors.items()], "key long, n_ranked long"
        )
        if priors
        else None
    )
    got = {
        r["doc_id"]: r["_rank"]
        for r in per_key_capped_rank(
            df, "key", "doc_id", cap, prior_counts=prior_df
        ).collect()
    }
    # reference: raw window + prior offset, computed independently
    w = Window.partitionBy("key").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ref = df.withColumn("_raw", F.row_number().over(w)).collect()
    from collections import Counter

    counts = Counter(keys)
    for r in ref:
        k, raw = r["key"], r["_raw"]
        prior = priors.get(k, 0)
        if counts[k] + prior > cap:
            assert got[r["doc_id"]] == raw + prior, (r["doc_id"], k)
        else:
            assert r["doc_id"] not in got, (r["doc_id"], k)


@settings(**_SETTINGS)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=50,
    ),
)
def test_zorder_value_roundtrip(spark, pts):
    """The Morton code is a bijection on the quantized grid: de-
    interleaving the Z-value recovers (x, y) exactly — which also pins
    the exact-integer fast path (no float rounding for pre-quantized
    inputs)."""
    from gpt_rag_ingestion_spark.operators.layout import zorder_value

    df = spark.createDataFrame(pts, "x long, y long")
    z = zorder_value(["x", "y"], {"x": 0, "y": 0}, {"x": 255, "y": 255}, bits=8)
    for r in df.withColumn("z", z).collect():
        zx = sum(((r["z"] >> (2 * b)) & 1) << b for b in range(8))
        zy = sum(((r["z"] >> (2 * b + 1)) & 1) << b for b in range(8))
        assert (zx, zy) == (r["x"], r["y"])
