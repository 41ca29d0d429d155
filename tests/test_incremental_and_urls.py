"""Round-2 additions: incremental cross-corpus dedup, epoch-weighted
mixture expansion, incremental rollup maintenance, NFC normalization,
URL canonicalization."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_incremental_dedup_decisions(spark):
    from gpt_rag_ingestion_spark.operators.dedup import incremental_dedup

    base = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "an entirely different base document about spark engines"),
            (3, "the quick brown fox jumps over the lazy dog today"),
        ],
        "doc_id long, text string",
    )
    incr = spark.createDataFrame(
        [
            # byte-identical to base docs 1 and 3 -> dup_of = min = 1
            (10, "the quick brown fox jumps over the lazy dog today"),
            # identical to 10 within the batch, but base wins priority
            (11, "the quick brown fox jumps over the lazy dog today"),
            # batch-only duplicate pair -> 13 dups 12
            (12, "a fresh batch document with no counterpart in base"),
            (13, "a fresh batch document with no counterpart in base"),
            # near-dup of base 2 (one word changed)
            (14, "an entirely different base document about flink engines"),
            # genuinely new
            (15, "completely unrelated text mentioning nothing shared"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["decision"], r["dup_of"])
        for r in incremental_dedup(base, incr, threshold=0.3).collect()
    }
    assert got[10] == ("exact_dup_base", 1)
    assert got[11] == ("exact_dup_base", 1)
    assert got[12] == ("new", None)
    assert got[13] == ("exact_dup_batch", 12)
    assert got[14] == ("near_dup_base", 2)
    assert got[15] == ("new", None)


def test_epoch_expand_copy_counts(spark):
    from gpt_rag_ingestion_spark.operators.sampling import (
        _SCALE,
        epoch_expand,
        hash_bucket,
    )

    df = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    out = epoch_expand(df, F.lit(23000), id_col="doc_id")  # 2.3 epochs
    per_doc = {
        r["doc_id"]: r["n"]
        for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    # every doc appears; floor = 2, extra copy for a ~0.3 hash share
    assert set(per_doc) == set(range(200))
    assert set(per_doc.values()) <= {2, 3}
    n3 = sum(1 for v in per_doc.values() if v == 3)
    assert 0 < n3 < 200
    # the extra-copy choice matches the hash rule exactly
    buckets = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id", hash_bucket(F.col("doc_id"), "epoch-v1").alias("b")
        ).collect()
    }
    for d, n in per_doc.items():
        expect = 2 + (1 if (buckets[d] * 10000) // _SCALE < 3000 else 0)
        assert n == expect, d
    # copy_idx is 1..n
    idx = out.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("copy_idx")).alias("idx")
    )
    for r in idx.collect():
        assert r["idx"] == list(range(1, per_doc[r["doc_id"]] + 1))


def test_epoch_expand_below_one_epoch_downsamples(spark):
    from gpt_rag_ingestion_spark.operators.sampling import epoch_expand

    df = spark.range(0, 400).select(F.col("id").alias("doc_id"))
    out = epoch_expand(df, F.lit(5000), id_col="doc_id")  # 0.5 epochs
    n = out.count()
    assert 100 < n < 300  # ~200 expected, deterministic
    assert out.groupBy("doc_id").count().agg(F.max("count")).first()[0] == 1
    # deterministic: identical on re-run
    assert out.count() == n


def test_maintain_rollup_equals_recompute(spark):
    from gpt_rag_ingestion_spark.operators.incremental import maintain_rollup

    rows = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3], i * 10) for i in range(30)],
        "k long, grp string, v long",
    )
    old = rows.groupBy("grp").agg(
        F.count("*").alias("n_rows"), F.sum("v").alias("v")
    )
    removed = rows.filter(F.col("k") % 5 == 0)
    added = removed.select(
        "k", F.lit("d").alias("grp"), (F.col("v") + 7).alias("v")
    )
    maintained = maintain_rollup(old, removed, added, "grp", ["v"])
    merged = rows.join(
        removed.select("k"), "k", "left_anti"
    ).unionByName(added)
    recomputed = merged.groupBy("grp").agg(
        F.count("*").alias("n_rows"), F.sum("v").alias("v")
    )
    assert sorted(map(tuple, maintained.collect())) == sorted(
        map(tuple, recomputed.collect())
    )


def test_maintain_rollup_drops_emptied_groups(spark):
    from gpt_rag_ingestion_spark.operators.incremental import maintain_rollup

    rows = spark.createDataFrame(
        [(1, "only", 5), (2, "keep", 6)], "k long, grp string, v long"
    )
    old = rows.groupBy("grp").agg(
        F.count("*").alias("n_rows"), F.sum("v").alias("v")
    )
    removed = rows.filter(F.col("grp") == "only")
    added = removed.limit(0)
    out = maintain_rollup(old, removed, added, "grp", ["v"])
    assert [r["grp"] for r in out.collect()] == ["keep"]


def test_nfc_normalize_merges_combining_marks(spark):
    from gpt_rag_ingestion_spark.functions.text import nfc_normalize_udf

    decomposed = "cafe\u0301 e\u0301tude"  # e + COMBINING ACUTE
    composed = "caf\u00e9 \u00e9tude"  # precomposed
    df = spark.createDataFrame(
        [(decomposed,), (composed,), ("plain",), (None,)],
        "s string",
    )
    out = df.select(
        "s", nfc_normalize_udf(F.col("s")).alias("n")
    ).collect()
    got = {r["s"]: r["n"] for r in out}
    assert decomposed != composed
    assert got[decomposed] == composed
    assert got[composed] == composed
    assert got["plain"] == "plain"
    assert got[None] is None


def test_url_canonicalization_cases(spark):
    from gpt_rag_ingestion_spark.functions.urls import (
        canonical_url,
        url_domain,
        url_host,
    )

    cases = [
        (
            "HTTPS://WWW.Example.COM:443/Path/To?utm_source=x&q=1&utm_medium=y#frag",
            "https://www.example.com/Path/To?q=1",
            "example.com",
            "example.com",
        ),
        (
            "http://Sub.Domain.ORG:80/a",
            "http://sub.domain.org/a",
            "sub.domain.org",
            "domain.org",
        ),
        (
            "https://example.com/?fbclid=abc",
            "https://example.com/",
            "example.com",
            "example.com",
        ),
        (
            "https://example.com:8080/x?a=1&gclid=z&b=2",
            "https://example.com:8080/x?a=1&b=2",
            "example.com",
            "example.com",
        ),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "url string")
    out = df.select(
        "url",
        canonical_url(F.col("url")).alias("c"),
        url_host(F.col("url")).alias("h"),
        url_domain(F.col("url")).alias("d"),
    ).collect()
    got = {r["url"]: (r["c"], r["h"], r["d"]) for r in out}
    for url, want_c, want_h, want_d in cases:
        assert got[url] == (want_c, want_h, want_d), url


def test_pagerank_sink_attracts_rank(spark):
    from gpt_rag_ingestion_spark.operators.linkgraph import pagerank_quantized

    # star: every node links to 0; 0 links to 1
    nodes = spark.range(0, 10).select(F.col("id").alias("id"))
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 10)] + [(0, 1)], "src long, dst long"
    )
    out = {
        r["id"]: r["rank_q"]
        for r in pagerank_quantized(nodes, edges, iters=10).collect()
    }
    assert len(out) == 10
    # the 0<->1 cycle concentrates rank; leaves hold only teleport mass
    assert out[0] > out[2] and out[1] > out[2]
    assert len({out[i] for i in range(2, 10)}) == 1
    # leaves get exactly the teleport share (nothing links to them)
    assert out[2] == ((10**12 * 1500) // 10000) // 10
    # deterministic re-run
    out2 = {
        r["id"]: r["rank_q"]
        for r in pagerank_quantized(nodes, edges, iters=10).collect()
    }
    assert out == out2


def test_pagerank_no_edges_is_uniform_teleport(spark):
    from gpt_rag_ingestion_spark.operators.linkgraph import pagerank_quantized

    nodes = spark.range(0, 4).select(F.col("id").alias("id"))
    edges = spark.createDataFrame([], "src long, dst long")
    out = {
        r["id"]: r["rank_q"]
        for r in pagerank_quantized(nodes, edges, iters=3).collect()
    }
    # teleport-only: (scale * 0.15) / n for every node
    assert set(out.values()) == {((10**12 * 1500) // 10000) // 4}


def test_snapshot_diff_classes(spark):
    from gpt_rag_ingestion_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None)],
        "k long, s string, v long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 21), (4, "d", 40)],
        "k long, s string, v long",
    )
    got = {
        r["k"]: r["change"] for r in snapshot_diff(old, new, key="k").collect()
    }
    assert got == {2: "changed", 3: "removed", 4: "added"}
    full = snapshot_diff(old, new, key="k", include_unchanged=True)
    assert {r["k"]: r["change"] for r in full.collect()}[1] == "unchanged"


def test_snapshot_diff_null_vs_empty_string_differ(spark):
    from gpt_rag_ingestion_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame([(1, None)], "k long, s string")
    new = spark.createDataFrame([(1, "")], "k long, s string")
    out = snapshot_diff(old, new, key="k").collect()
    assert [r["change"] for r in out] == ["changed"]


def test_vocab_build_and_encode_roundtrip(spark):
    from gpt_rag_ingestion_spark.operators.vocab import (
        OOV_ID,
        build_vocab,
        encode_with_vocab,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "a rare unicorn"),
        ],
        "doc_id long, text string",
    )
    vocab = build_vocab(docs, min_freq=2)
    v = {r["token"]: r["token_id"] for r in vocab.collect()}
    # only tokens with freq >= 2 present; 'the' (freq 3) ranks first
    assert set(v) == {"the", "sat"}
    assert v["the"] == 1 and v["sat"] == 2

    enc = {r["doc_id"]: r for r in encode_with_vocab(docs, vocab).collect()}
    assert enc[1]["ids"] == [1, OOV_ID, 2, OOV_ID, 1, OOV_ID]
    assert enc[1]["n_tokens"] == 6 and enc[1]["n_oov"] == 3
    assert enc[3]["ids"] == [OOV_ID, OOV_ID, OOV_ID]
    assert enc[2]["ids"] == [1, OOV_ID, 2]


def test_column_stats_single_pass(spark):
    from gpt_rag_ingestion_spark.operators.profiling import column_stats

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (2, None, 7.5)],
        "k long, s string, v double",
    )
    got = {r["column"]: r for r in column_stats(df).collect()}
    assert got["k"]["n_nonnull"] == 3
    assert got["k"]["n_null"] == 0
    assert got["k"]["n_distinct"] == 2
    assert got["k"]["min_value"] == "1" and got["k"]["max_value"] == "2"
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 2
    assert got["v"]["n_nonnull"] == 2
    assert got["v"]["min_value"] == "5.0"
    # min/max respect native numeric order, not string order
    df2 = spark.createDataFrame([(9,), (10,)], "n long")
    g2 = {r["column"]: r for r in column_stats(df2).collect()}
    assert g2["n"]["min_value"] == "9" and g2["n"]["max_value"] == "10"


def test_kmv_set_algebra_estimates_overlap(spark):
    from gpt_rag_ingestion_spark.operators.sketches import kmv_set_algebra

    # A = 0..999, B = 500..1499 -> union 1500, intersection 500
    rows = [("A", i) for i in range(1000)] + [
        ("B", i) for i in range(500, 1500)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    out = kmv_set_algebra(df, "g", "v", k=128).collect()
    assert len(out) == 1
    r = out[0]
    assert r["g_a"] == "A" and r["g_b"] == "B"
    # KMV with k=128: ~±15% typical — generous bounds, deterministic
    assert 1000 < r["est_union"] < 2100
    assert 250 < r["est_intersection"] < 800
    # small sets: exact (n_all <= k path)
    small = spark.createDataFrame(
        [("X", i) for i in range(30)] + [("Y", i) for i in range(20, 50)],
        "g string, v long",
    )
    s = kmv_set_algebra(small, "g", "v", k=128).collect()[0]
    assert s["est_union"] == 50
    assert s["est_intersection"] == 10  # exact: rho over |K_union|=50


def test_token_blocks_exact_layout(spark):
    from gpt_rag_ingestion_spark.operators.packing import token_blocks

    docs = spark.createDataFrame(
        [(1, 5), (2, 3), (3, 10), (4, 2), (5, 0)],
        "doc_id long, n long",
    )
    out = token_blocks(
        docs, "n", [F.asc("doc_id")], block_tokens=8
    ).collect()
    segs = sorted((r["block_id"], r["doc_id"],
                   r["start_in_doc"], r["end_in_doc"]) for r in out)
    # stream: d1[0,5) d2[5,8) d3[8,18) d4[18,20); blocks of 8
    assert segs == [
        (0, 1, 0, 5),
        (0, 2, 0, 3),
        (1, 3, 0, 8),
        (2, 3, 8, 10),
        (2, 4, 0, 2),
    ]
    # every block except the last is exactly full
    per_block = {}
    for b, d, s, e in segs:
        per_block[b] = per_block.get(b, 0) + (e - s)
    assert per_block[0] == 8 and per_block[1] == 8 and per_block[2] == 4
    # zero-length docs emit nothing
    assert all(d != 5 for _, d, _, _ in segs)


def test_scd2_intervals_run_compression(spark):
    import datetime as dt

    from gpt_rag_ingestion_spark.operators.incremental import scd2_intervals

    def t(h):
        return dt.datetime(2024, 1, 1, h)

    rows = [
        ("u1", t(1), 1, "x"),
        ("u1", t(2), 2, "x"),  # same value: compressed away
        ("u1", t(3), 3, "y"),
        ("u1", t(4), 4, "x"),  # value returns: NEW interval
        ("u2", t(5), 5, "z"),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long, state string"
    )
    out = sorted(
        (r["user_id"], r["state"], r["valid_from"].hour,
         r["valid_to"].hour if r["valid_to"] else None)
        for r in scd2_intervals(
            df, "user_id", "ts", ["state"], tiebreak=["event_id"]
        ).collect()
    )
    assert out == [
        ("u1", "x", 1, 3),
        ("u1", "x", 4, None),
        ("u1", "y", 3, 4),
        ("u2", "z", 5, None),
    ]


def test_triangle_count_known_graph(spark):
    from gpt_rag_ingestion_spark.operators.linkgraph import triangle_count

    # K4 has 4 triangles; plus a dangling edge and a loop (ignored)
    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a != b]
        + [(3, 9), (5, 5)],
        "src long, dst long",
    )
    assert triangle_count(edges).collect()[0]["n_triangles"] == 4


def test_collocations_finds_frozen_pair(spark):
    from gpt_rag_ingestion_spark.operators.text_analysis import collocations

    # "hong kong" always adjacent; filler words common but unpaired
    rows = [
        (i, "hong kong " + ("the of a to " * 5)) for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    top = collocations(docs, min_count=5, k=3).collect()
    assert (top[0]["word_a"], top[0]["word_b"]) == ("hong", "kong")
    assert top[0]["rank"] == 1
    # the frozen pair's lift beats any filler bigram
    assert top[0]["lift_q"] > top[1]["lift_q"]


def test_grouped_correlation_known_values(spark):
    from gpt_rag_ingestion_spark.operators.profiling import (
        grouped_correlation,
    )

    rows = (
        # perfectly correlated group
        [("pos", float(i), float(2 * i + 3)) for i in range(1, 20)]
        # perfectly anti-correlated group
        + [("neg", float(i), float(100 - 5 * i)) for i in range(1, 20)]
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {
        r["g"]: r["corr"]
        for r in grouped_correlation(df, "g", "x", "y", 100, 100).collect()
    }
    assert got["pos"] == 1.0
    assert got["neg"] == -1.0


def test_grouped_mode_tie_break(spark):
    from gpt_rag_ingestion_spark.operators.profiling import grouped_mode

    df = spark.createDataFrame(
        [("g1", "b"), ("g1", "b"), ("g1", "a"), ("g1", "a"), ("g1", "c"),
         ("g2", "z")],
        "g string, v string",
    )
    got = {
        r["g"]: (r["mode_value"], r["mode_count"])
        for r in grouped_mode(df, "g", "v").collect()
    }
    assert got["g1"] == ("a", 2)  # tie with "b": smaller value wins
    assert got["g2"] == ("z", 1)


def test_fuzzy_join_blocking_and_distance(spark):
    from gpt_rag_ingestion_spark.operators.linkage import fuzzy_join

    left = spark.createDataFrame(
        [(1, "Jonathan Smith"), (2, "Alice Jones"), (3, "Bob")],
        "lk long, name string",
    )
    right = spark.createDataFrame(
        [(10, "Jonathon Smith"),   # 1 substitution -> match 1
         (11, "alice  jones"),     # extra space -> match 2 (dist 1)
         (12, "Robert"),           # far from Bob
         (13, "Zonathan Smith")],  # dist 1 BUT prefix differs: blocked out
        "rk long, name string",
    )
    got = {
        (r["lk"], r["rk"]): r["distance"]
        for r in fuzzy_join(left, right, "lk", "rk").collect()
    }
    assert got[(1, 10)] == 1
    assert got[(2, 11)] == 1
    assert (3, 12) not in got
    # prefix blocking trades recall for never doing all-pairs:
    assert (1, 13) not in got


def test_cms_join_size_overestimates_within_bound(spark):
    import pyspark.sql.functions as F  # noqa: F811

    from gpt_rag_ingestion_spark.operators.sketches import cms_join_size

    left = spark.range(0, 2000).select((F.col("id") % 500).alias("k"))
    right = spark.range(0, 3000).select((F.col("id") % 500).alias("r"))
    row = cms_join_size(left, right, "k", "r").collect()[0]
    # exact = 500 keys x 4 x 6
    assert row["exact_rows"] == 500 * 4 * 6
    # CMS inner product never underestimates, collision overshoot bounded
    assert row["est_rows"] >= row["exact_rows"]
    assert row["est_rows"] < row["exact_rows"] * 3


def test_strip_accents_udf(spark):
    from gpt_rag_ingestion_spark.functions.text import strip_accents_udf

    df = spark.createDataFrame(
        [("café",), ("café",), ("Zürich",), ("plain",),
         (None,)],
        "s string",
    )
    got = {
        r["s"]: r["n"]
        for r in df.select(
            "s", strip_accents_udf(F.col("s")).alias("n")
        ).collect()
    }
    assert got["café"] == "cafe"       # precomposed
    assert got["café"] == "cafe"      # decomposed
    assert got["Zürich"] == "Zurich"
    assert got["plain"] == "plain"
    assert got[None] is None


def test_fuzzy_join_delvar_equals_block_path(spark):
    """The deletion-neighborhood candidate generator (r4 judge brief:
    q125 was the suite's worst plan) must produce EXACTLY the verified
    pair set of the (prefix, length-bucket) block join on arbitrary
    corrupted strings — mutations anywhere, including ones that touch
    the prefix (excluded by both) and the length bounds."""
    import random

    from gpt_rag_ingestion_spark.operators.linkage import fuzzy_join

    rng = random.Random(42)
    alphabet = "abcdefgh0123456789"
    base = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(3, 20)))
        for _ in range(120)
    ]

    def mutate(s):
        ops = rng.randint(0, 3)  # up to 3 edits: some exceed max_distance
        out = list(s)
        for _ in range(ops):
            kind = rng.choice("sid")
            pos = rng.randrange(max(1, len(out)))
            if kind == "s" and out:
                out[pos] = rng.choice(alphabet)
            elif kind == "i":
                out.insert(pos, rng.choice(alphabet))
            elif kind == "d" and len(out) > 1:
                del out[pos]
        return "".join(out)

    left = spark.createDataFrame(
        [(i, s) for i, s in enumerate(base)], "lk long, name string"
    )
    right = spark.createDataFrame(
        [(1000 + i, mutate(rng.choice(base))) for i in range(200)],
        "rk long, name string",
    )
    delvar = sorted(
        tuple(r) for r in fuzzy_join(left, right, "lk", "rk").collect()
    )
    block = sorted(
        tuple(r)
        for r in fuzzy_join(
            left, right, "lk", "rk", delvar_max_len=0
        ).collect()
    )
    assert delvar == block
    assert len(delvar) > 0

    # d=1 flavor too
    d1a = sorted(
        tuple(r)
        for r in fuzzy_join(left, right, "lk", "rk", max_distance=1).collect()
    )
    d1b = sorted(
        tuple(r)
        for r in fuzzy_join(
            left, right, "lk", "rk", max_distance=1, delvar_max_len=0
        ).collect()
    )
    assert d1a == d1b

    # long strings (> delvar_max_len) silently take the block path
    longl = left.selectExpr("lk", "repeat(name, 12) AS name")
    longr = right.selectExpr("rk", "repeat(name, 12) AS name")
    assert fuzzy_join(longl, longr, "lk", "rk").count() >= 0


def test_fuzzy_join_duplicate_input_rows_dedup(spark):
    """Advisor r6: duplicate input ROWS per key used to multiply
    through the two text-attach joins on the deletion-variant path.
    The terminal dropDuplicates must emit one row per (lk, rk) pair
    regardless of input row duplication."""
    from gpt_rag_ingestion_spark.operators.linkage import fuzzy_join

    left = spark.createDataFrame(
        [(1, "jonathan smith")] * 3 + [(2, "alice jones")],
        "lk long, name string",
    )
    right = spark.createDataFrame(
        [(10, "jonathon smith")] * 2 + [(11, "alice  jones")],
        "rk long, name string",
    )
    rows = fuzzy_join(left, right, "lk", "rk").collect()
    pairs = [(r["lk"], r["rk"]) for r in rows]
    assert sorted(pairs) == [(1, 10), (2, 11)]  # no multiplicity
    assert all(r["distance"] == 1 for r in rows)
