"""Distributed BPE merge training (beyond-reference, LLM-pipeline
family).

Sennrich et al. 2016 byte-pair encoding: repeatedly merge the most
frequent adjacent symbol pair.  The distributed formulation exploits
the classic observation that BPE trains on the WORD-FREQUENCY table,
not the corpus: one corpus-sized aggregation up front (word -> count),
then every iteration touches only the vocabulary relation — at 100 TB
the corpus is read once and the loop runs over a table that fits any
cluster comfortably (|distinct words| ≪ corpus size).

Per iteration (all relational):
  1. adjacent pairs via two ``slice`` views zipped — a narrow map;
  2. pair counts = one groupBy(left, right) weighted by word freq;
  3. argmax pair = orderBy + limit(1) (TakeOrdered — no global sort),
     ties broken (count desc, left asc, right asc) so the learned
     merge sequence is deterministic in any engine;
  4. apply the merge with a left-to-right ``F.aggregate`` fold over
     each word's symbol array — pure codegen, no UDF.

The only driver data is one (left, right, count) row per iteration —
the merge being learned — and ``localCheckpoint`` truncates the plan
between iterations so lineage stays O(1) rather than O(num_merges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequencies(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """Corpus -> (word, freq) — the single corpus-sized pass."""
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    words = df.select(
        F.explode(F.split(c, r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    n = F.size("syms")
    pairs = vocab.select(
        "freq",
        F.explode(
            F.arrays_zip(
                F.slice("syms", 1, n - 1).alias("l"),
                F.slice("syms", 2, n - 1).alias("r"),
            )
        ).alias("p"),
    ).select("freq", F.col("p.l").alias("left"), F.col("p.r").alias("right"))
    return pairs.groupBy("left", "right").agg(F.sum("freq").alias("n_pair"))


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Left-to-right non-overlapping merge of (left, right) in every
    word, as a fold: append each symbol, replacing the tail pair when
    it matches — exactly the sequential BPE merge order."""
    merged = F.lit(left + right)
    syms = F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return vocab.withColumn("syms", syms)


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 32,
    min_pair_count: int = 2,
) -> DataFrame:
    """Learn up to ``num_merges`` BPE merges; returns the merge table
    (rank, left, right, token, n_pair) in learned order.  Stops early
    when no pair reaches ``min_pair_count``."""
    spark = df.sparkSession
    vocab = word_frequencies(df, text_col).withColumn(
        "syms", F.split("word", "")
    )
    vocab = vocab.localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        top = (
            _pair_counts(vocab)
            .orderBy(
                F.desc("n_pair"), F.asc("left"), F.asc("right")
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["n_pair"] < min_pair_count:
            break
        left, right, n_pair = (
            top[0]["left"],
            top[0]["right"],
            int(top[0]["n_pair"]),
        )
        merges.append((rank, left, right, left + right, n_pair))
        vocab = _apply_merge(vocab, left, right).localCheckpoint(eager=True)

    return spark.createDataFrame(
        merges, "rank int, left string, right string, token string, n_pair bigint"
    )


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list to a corpus: (id, tokens array).
    Folds the merges in rank order — same pure-codegen merge fold, so
    segmentation needs no UDF and no broadcast beyond the literal merge
    list baked into the plan (bounded by vocabulary size)."""
    out = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias(
            "pos", "word"
        ),
    ).filter(F.col("word") != "")
    out = out.withColumn("syms", F.split("word", ""))
    for left, right in merges:
        out = _apply_merge(out, left, right)
    # reassemble in word order (collect_list order is not guaranteed
    # after a shuffle — sort by the original position)
    return out.groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "syms"))),
                lambda s: s["syms"],
            )
        ).alias("tokens")
    )
