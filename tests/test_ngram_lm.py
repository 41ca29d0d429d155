"""Corpus-trained n-gram LM fluency scoring (operators/ngram_lm):
semantic sanity (predictable text scores LOWER than gibberish under
the inverse-probability score), degenerate docs, bucket split
exactness.  Cross-engine value parity is the q153 oracle's job."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpt_rag_ingestion_spark.operators.ngram_lm import (
    lm_quality_buckets,
    lm_score,
    train_bigram_counts,
)


def _score_map(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    c12, c1, v = train_bigram_counts(docs)
    scored = lm_score(docs, c12, c1, v)
    return {r["doc_id"]: r for r in scored.collect()}


def test_fluent_text_scores_lower_than_gibberish(spark):
    common = "the cat sat on the mat and the cat sat on the mat again"
    rows = [(i, common) for i in range(20)]  # fluent mass
    rows.append((100, common))              # fluent probe
    rows.append((101, "zq xv wk jm qp zx vb nk lw pf td gh rs mn"))
    got = _score_map(spark, rows)
    assert got[100]["score"] < got[101]["score"]
    # every bigram of the gibberish doc is unique: den = n_bigrams * 2
    g = got[101]
    assert g["n_bigrams"] == 13  # 14 words -> 13 bigrams


def test_short_docs_carry_no_sequence_evidence(spark):
    rows = [(1, "hello world again"), (2, "single"), (3, ""), (4, "a b")]
    got = _score_map(spark, rows)
    assert set(got) == {1, 4}  # <2 words -> no bigrams -> dropped


def test_buckets_split_into_exact_thirds(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i} w{i % 7} common tail words here") for i in range(90)],
        "doc_id long, text string",
    )
    c12, c1, v = train_bigram_counts(docs)
    out = lm_quality_buckets(lm_score(docs, c12, c1, v))
    counts = {
        r["bucket"]: r["n"]
        for r in out.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"head": 30, "middle": 30, "tail": 30}
    # deterministic under re-evaluation
    a = sorted(tuple(r) for r in out.collect())
    b = sorted(tuple(r) for r in out.collect())
    assert a == b


def test_min_count_prunes_model_not_semantics_of_common_text(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 5) for i in range(10)]
        + [(99, "rare pair here")],
        "doc_id long, text string",
    )
    c12a, c1, v = train_bigram_counts(docs)
    c12b, _c1, _v = train_bigram_counts(docs, min_count=5)
    assert c12b.count() < c12a.count()
    sa = {r["doc_id"]: r["score"] for r in lm_score(docs, c12a, c1, v).collect()}
    sb = {r["doc_id"]: r["score"] for r in lm_score(docs, c12b, c1, v).collect()}
    assert sa[0] == sb[0]  # common bigrams survive the prune untouched
    assert sb[99] >= sa[99]  # pruned rare bigrams fall back to smoothing


def test_char_coverage_cut(spark):
    """operators/vocab.char_coverage: rare chars past the coverage
    target fall out of the base alphabet (byte-fallback territory)."""
    from gpt_rag_ingestion_spark.operators.vocab import char_coverage

    text = "a" * 9000 + "b" * 990 + "c" * 9 + "z"
    docs = spark.createDataFrame([(text,)], "text string")
    got = {
        r["ch"]: (r["rank"], r["in_vocab"])
        for r in char_coverage(docs, coverage_num=9990,
                               coverage_den=10000).collect()
    }
    assert got["a"] == (1, True)
    assert got["b"] == (2, True)
    # 'c' starts at cum 9990 = exactly the target -> already covered
    assert got["c"] == (3, False)
    assert got["z"] == (4, False)


def test_incremental_counts_equal_full_retrain(spark):
    """maintain_bigram_counts(old, +added, -removed) must equal a full
    retrain on the post-change corpus — the additive-counts identity."""
    from gpt_rag_ingestion_spark.operators.ngram_lm import (
        maintain_bigram_counts,
    )

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    base = docs([(i, f"alpha beta w{i} gamma delta beta") for i in range(20)])
    added = docs([(100 + i, f"new words w{i} arriving now") for i in range(5)])
    removed = docs([(i, f"alpha beta w{i} gamma delta beta") for i in range(3)])

    c12, c1, _v = train_bigram_counts(base)
    i12, i1, iv = maintain_bigram_counts(c12, c1, added=added, removed=removed)

    after = docs(
        [(i, f"alpha beta w{i} gamma delta beta") for i in range(3, 20)]
        + [(100 + i, f"new words w{i} arriving now") for i in range(5)]
    )
    f12, f1, fv = train_bigram_counts(after)

    assert sorted(tuple(r) for r in i12.collect()) == sorted(
        tuple(r) for r in f12.collect()
    )
    assert sorted(tuple(r) for r in i1.collect()) == sorted(
        tuple(r) for r in f1.collect()
    )
    assert iv == fv


def test_char_collision_index_semantics(spark):
    from gpt_rag_ingestion_spark.operators.text_analysis import (
        char_collision_features,
    )

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abcd"), (3, "aabb"), (4, "x"), (5, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in char_collision_features(docs).collect()}
    assert (got[1]["collisions"], got[1]["pairs"]) == (12, 12)  # all equal
    assert got[1]["collision_index"] == 1.0
    assert got[2]["collisions"] == 0                            # all distinct
    assert got[3]["collisions"] == 4                            # 2+2
    assert got[4]["collision_index"] is None                    # n < 2
    assert got[5]["n_chars"] == 0


def test_compression_ratio_orders_repetition_below_noise(spark):
    from gpt_rag_ingestion_spark.operators.text_analysis import (
        compression_ratio,
    )
    import random

    rng = random.Random(3)
    noise = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(2000))
    docs = spark.createDataFrame(
        [(1, "spam " * 400), (2, noise), (3, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["zlib_ratio"] for r in compression_ratio(docs).collect()}
    assert got[1] < 0.05          # pure repetition collapses
    assert got[2] > 0.5           # near-random barely compresses
    assert got[3] is None
