"""Property tests for the round-2 operator families (hypothesis)."""

from __future__ import annotations

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
    lengths=st.lists(st.integers(min_value=0, max_value=37), min_size=1, max_size=30),
    block=st.integers(min_value=3, max_value=16),
)
def test_token_blocks_partition_property(spark, lengths, block):
    """Blockization is a PARTITION of the concatenated stream: per-doc
    segments are contiguous and cover [0, n); every block except the
    last holds exactly ``block`` tokens."""
    from gpt_rag_ingestion_spark.operators.packing import token_blocks

    docs = spark.createDataFrame(
        [(i, n) for i, n in enumerate(lengths)], "doc_id long, n long"
    )
    segs = token_blocks(docs, "n", [F.asc("doc_id")], block).collect()
    per_doc: dict[int, list[tuple[int, int, int]]] = {}
    per_block: dict[int, int] = {}
    for r in segs:
        per_doc.setdefault(r["doc_id"], []).append(
            (r["start_in_doc"], r["end_in_doc"], r["block_id"])
        )
        per_block[r["block_id"]] = (
            per_block.get(r["block_id"], 0) + r["end_in_doc"] - r["start_in_doc"]
        )
    total = sum(lengths)
    for i, n in enumerate(lengths):
        spans = sorted(per_doc.get(i, []))
        if n == 0:
            assert spans == []
            continue
        # contiguous cover of [0, n), block ids consecutive
        assert spans[0][0] == 0 and spans[-1][1] == n
        for (s1, e1, b1), (s2, e2, b2) in zip(spans, spans[1:]):
            assert e1 == s2 and b2 == b1 + 1
    if total:
        last = max(per_block)
        for b, tot in per_block.items():
            assert tot == block or (b == last and tot == total - last * block)
        assert sum(per_block.values()) == total


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # group
            st.integers(min_value=-50, max_value=50),  # value
        ),
        min_size=0,
        max_size=40,
    ),
    removed_mask=st.lists(st.booleans(), min_size=40, max_size=40),
)
def test_maintain_rollup_matches_recompute_property(spark, rows, removed_mask):
    from gpt_rag_ingestion_spark.operators.incremental import maintain_rollup

    data = [(i, f"g{g}", v) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k long, grp string, v long")
    old = df.groupBy("grp").agg(
        F.count("*").alias("n_rows"), F.sum("v").alias("v")
    )
    removed = df.filter(
        F.col("k").isin([i for i in range(len(data)) if removed_mask[i]])
        if data
        else F.lit(False)
    )
    added = removed.select("k", F.lit("gX").alias("grp"), (F.col("v") * 2).alias("v"))
    maintained = maintain_rollup(old, removed, added, "grp", ["v"])
    merged = df.join(removed.select("k"), "k", "left_anti").unionByName(added)
    recomputed = merged.groupBy("grp").agg(
        F.count("*").alias("n_rows"), F.sum("v").alias("v")
    )
    assert sorted(map(tuple, maintained.collect())) == sorted(
        map(tuple, recomputed.collect())
    )


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.sampled_from(
            [
                "alpha beta gamma delta epsilon zeta",
                "alpha beta gamma delta epsilon eta",
                "one two three four five six seven",
                "totally different words here now indeed",
            ]
        ),
        min_size=2,
        max_size=10,
    )
)
def test_incremental_dedup_exact_classes_property(spark, texts):
    """Exact decisions agree with a brute-force reference: batch docs
    whose text appears in base are exact_dup_base; duplicates-within-
    batch (not in base) point at the smallest batch id."""
    from gpt_rag_ingestion_spark.operators.dedup import incremental_dedup

    half = len(texts) // 2
    base_rows = [(i, t) for i, t in enumerate(texts[:half])]
    incr_rows = [(100 + i, t) for i, t in enumerate(texts[half:])]
    base = spark.createDataFrame(base_rows or [(0, "x")], "doc_id long, text string")
    if not base_rows:
        base = base.filter(F.lit(False))
    incr = spark.createDataFrame(incr_rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["decision"], r["dup_of"])
        for r in incremental_dedup(base, incr, threshold=0.95).collect()
    }
    base_texts = {t: i for i, t in sorted(base_rows, reverse=True)}
    first_in_batch: dict[str, int] = {}
    for i, t in sorted(incr_rows):
        first_in_batch.setdefault(t, i)
    for i, t in incr_rows:
        dec, dup = got[i]
        if t in base_texts:
            assert dec == "exact_dup_base"
            assert dup == min(j for j, tt in base_rows if tt == t)
        elif first_in_batch[t] < i:
            assert (dec, dup) == ("exact_dup_batch", first_in_batch[t])
        else:
            assert dec in ("new", "near_dup_base")


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pvals=st.lists(
        st.text(
            alphabet="ab/:=%#\\'\" .\t-_0123456789",
            min_size=0, max_size=12,
        ) | st.none(),
        min_size=1, max_size=4, unique=True,
    ),
    data=st.data(),
)
def test_partitioned_merge_escaping_property(spark, tmp_path_factory, pvals, data):
    """Round-3: the partition-pruned merge must be byte-identical to
    the unpartitioned rewrite for ARBITRARY partition values — the
    directory addressing mirrors Spark's escapePathName, so slashes,
    quotes, '%', '=', ':', whitespace, and NULL must all round-trip
    through the partition swap.  The one Spark-inherent exception:
    Hive layout maps the EMPTY STRING to the default partition, so it
    reads back as NULL — canonicalize '' to NULL on both sides."""
    import pyspark.sql.functions as _F

    from gpt_rag_ingestion_spark.operators.upsert import merge_upsert

    n = len(pvals)
    rows1 = [(f"k{i}", pvals[i % n], i) for i in range(2 * n)]
    # second batch re-ingests half the keys, possibly moving partitions
    moved = data.draw(st.permutations(pvals))
    rows2 = [(f"k{i}", moved[i % n], 100 + i) for i in range(n)]

    base = tmp_path_factory.mktemp("merge_prop")
    plain, parted = str(base / "plain"), str(base / "parted")
    schema = "parent_id string, part string, v int"
    for table, pc in ((plain, None), (parted, ["part"])):
        merge_upsert(spark, table, spark.createDataFrame(rows1, schema),
                     partition_cols=pc)
        merge_upsert(spark, table, spark.createDataFrame(rows2, schema),
                     partition_cols=pc)
    canon = lambda p: sorted(  # noqa: E731
        (r["parent_id"], r["part"] or None, r["v"])
        for r in spark.read.parquet(p)
        .select("parent_id", _F.col("part").cast("string"), "v").collect()
    )
    assert canon(parted) == canon(plain)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    words=st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=6),
        min_size=3, max_size=60,
    ),
    k=st.integers(min_value=2, max_value=8),
)
def test_bpe_exact_batching_property(spark, words, k):
    """exact=True batched BPE must learn the IDENTICAL merge table to
    the one-merge-per-round sequential baseline on ARBITRARY corpora —
    the safe-prefix selection rule, property-tested."""
    import gpt_rag_ingestion_spark.operators.bpe as bpe

    docs = spark.createDataFrame(
        [(i, " ".join(words[i::3])) for i in range(3)], ["doc_id", "text"]
    )
    seq = [tuple(r) for r in bpe.bpe_train(docs, num_merges=10).collect()]
    bat = [
        tuple(r)
        for r in bpe.bpe_train(
            docs, num_merges=10, merges_per_round=k, exact=True
        ).collect()
    ]
    assert bat == seq
