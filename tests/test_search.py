"""BM25 + hybrid RRF retrieval (operators/search): ranking semantics
on hand-checkable corpora.  Cross-engine value parity is q155/q156's
oracle job."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpt_rag_ingestion_spark.operators.search import (
    bm25_topk,
    build_text_index,
    rrf_fuse,
)


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id string, terms array<string>")


def test_bm25_ranks_term_matches_above_nonmatches(spark):
    docs = spark.createDataFrame(
        [
            (1, "cat dog cat dog cat"),          # heavy on both terms
            (2, "cat bird fish tree house"),      # one term, once
            (3, "tree house bird fish stone"),    # no query term
            (4, "cat cat cat cat cat cat cat"),   # one term, saturated
        ],
        "doc_id long, text string",
    )
    index = build_text_index(docs)
    out = bm25_topk(index, _queries(spark, [("q", ["cat", "dog"])]), k=10)
    got = [(r["rank"], r["doc"]) for r in out.collect()]
    docs_ranked = [d for _r, d in sorted(got)]
    assert docs_ranked[0] == 1          # both terms, high tf
    assert 3 not in docs_ranked         # no matching term -> no row
    assert set(docs_ranked) == {1, 2, 4}
    # rare term (dog: df=1) outscores common term (cat: df=3) evidence
    assert docs_ranked[1] == 4 or docs_ranked[1] == 2


def test_bm25_length_normalization(spark):
    """Same tf: the SHORTER document ranks first (b > 0)."""
    docs = spark.createDataFrame(
        [
            (1, "cat " + "filler " * 50),
            (2, "cat filler"),
        ],
        "doc_id long, text string",
    )
    index = build_text_index(docs)
    out = bm25_topk(index, _queries(spark, [("q", ["cat"])]), k=2)
    ranked = [r["doc"] for r in sorted(out.collect(), key=lambda r: r["rank"])]
    assert ranked == [2, 1]


def test_rrf_fusion_prefers_agreement(spark):
    """A doc ranked mid by BOTH systems beats a doc ranked top by one
    and absent from the other (the point of RRF)."""
    a = spark.createDataFrame(
        [("q", 10, 1), ("q", 20, 2), ("q", 30, 3)],
        "query_id string, doc long, rank int",
    )
    b = spark.createDataFrame(
        [("q", 20, 1), ("q", 10, 2), ("q", 99, 3)],
        "query_id string, doc long, rank int",
    )
    out = rrf_fuse([a, b], k=4)
    ranked = [r["doc"] for r in sorted(out.collect(), key=lambda r: r["rank"])]
    # 10 and 20 appear in both (ranks {1,2}) -> tie on rrf, doc asc
    assert ranked[:2] == [10, 20]
    # 30 and 99 each appear once at rank 3 -> equal, doc asc
    assert ranked[2:] == [30, 99]


def test_bm25_empty_and_unknown_terms(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string"
    )
    index = build_text_index(docs)
    out = bm25_topk(
        index, _queries(spark, [("q", ["zzz", "qqq"])]), k=5
    )
    assert out.count() == 0
