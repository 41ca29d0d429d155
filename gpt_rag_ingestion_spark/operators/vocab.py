"""Vocabulary construction + integer encoding of a text corpus.

The step between raw text and a training dataloader: build a
frequency-ranked token→id dictionary over the corpus, then rewrite
every document as an id sequence (with a reserved OOV id).  Word-level
here; compose with ``operators/bpe.py`` when subword units are wanted
(train merges → segment → THIS module assigns ids to the segmented
units).

Scale shape:
- vocabulary = one corpus aggregation (token, freq) + a distributed
  global rank (``ranking.distributed_row_number`` — never an
  unpartitioned window over the vocabulary);
- encoding = explode (token, pos) → equi-join against the vocab
  (broadcast when the dictionary fits, the common case: even 1M-entry
  vocabs are ~tens of MB) → ordered re-assembly per document.  The
  corpus shuffles once, on (doc, pos)-sized rows.

Determinism: ids are assigned by (freq DESC, token ASC) — a total
order any engine reproduces; the whole build+encode round-trip is
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gpt_rag_ingestion_spark.operators.ranking import distributed_row_number

OOV_ID = 0


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_freq: int = 1,
) -> DataFrame:
    """(token, token_id, freq) with ids 1.. by (freq DESC, token ASC);
    id 0 is reserved for OOV."""
    toks = df.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
            )
        ).alias("token")
    )
    freqs = toks.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    if min_freq > 1:
        freqs = freqs.filter(F.col("freq") >= min_freq)
    ranked = distributed_row_number(
        freqs, [F.desc("freq"), F.asc("token")], rank_col="token_id"
    )
    return ranked.select("token", "token_id", "freq")


def encode_with_vocab(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, ids ARRAY<LONG>, n_tokens, n_oov) — every token mapped
    to its vocab id, unknowns to OOV_ID, document order preserved."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
            )
        ).alias("pos", "token"),
    )
    mapped = toks.join(
        F.broadcast(vocab.select("token", "token_id")), on="token", how="left"
    ).select(
        id_col,
        "pos",
        F.coalesce(F.col("token_id"), F.lit(OOV_ID)).alias("tid"),
    )
    return mapped.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tid"))),
            lambda s: s["tid"],
        ).alias("ids"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum((F.col("tid") == OOV_ID).cast("long")).alias("n_oov"),
    )


def char_coverage(
    docs,
    text_col: str = "text",
    coverage_num: int = 9995,
    coverage_den: int = 10_000,
):
    """SentencePiece-style character coverage (its
    ``character_coverage=0.9995`` default): rank every character by
    corpus frequency and mark the prefix of the ranking that the
    tokenizer's base alphabet must cover — everything past it falls to
    ``<unk>``/byte-fallback.  The tokenizer-training twin of
    ``build_vocab``.

    Pure integer arithmetic end to end (a char is in-vocab iff the
    cumulative count BEFORE it has not yet reached
    ceil(total * num/den): ``(cum - n) * den < total * num``) — so the
    whole ranking hash-matches any SQL engine.

    Scale note: the window runs over DISTINCT CHARACTERS — bounded by
    the unicode repertoire (thousands of rows at web scale, after a
    corpus-wide count shuffle on 1-char keys) — so the unpartitioned
    window here is safe by cardinality, unlike one over rows."""
    from pyspark.sql import Window

    chars = docs.select(
        F.explode(F.split(F.col(text_col), "")).alias("ch")
    ).filter(F.col("ch") != "")
    counts = chars.groupBy("ch").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("ch").asc())
    total = counts.agg(F.sum("n")).first()[0] or 0
    ranked = counts.select(
        "ch", "n",
        F.row_number().over(w).alias("rank"),
        F.sum("n").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum_n"),
    )
    # literals cast to LONG: int32 literals would constant-fold the
    # total*num product in 32-bit and overflow past ~215k corpus chars
    in_vocab = (
        (F.col("cum_n") - F.col("n"))
        * F.lit(int(coverage_den)).cast("long")
        < F.lit(int(total)).cast("long")
        * F.lit(int(coverage_num)).cast("long")
    )
    return ranked.select("ch", "n", "rank", in_vocab.alias("in_vocab"))


def decode_with_vocab(
    encoded: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    ids_col: str = "ids",
    oov_token: str = "<unk>",
) -> DataFrame:
    """(id_col, text) — the inverse of ``encode_with_vocab``: each id
    array mapped back through the vocabulary (OOV ids become
    ``oov_token``) and re-joined with single spaces.  Exactly the
    encode's mirror: posexplode → broadcast vocab join → ordered
    re-aggregation (one shuffle bounded by token count) —
    the round-trip identity (decode(encode(x)) == normalized x for
    fully in-vocab text) is the tokenizer-validation audit every
    training pipeline should run before a corpus ships."""
    toks = encoded.select(
        F.col(id_col),
        F.posexplode(F.col(ids_col)).alias("pos", "tid"),
    )
    mapped = toks.join(
        F.broadcast(vocab.select(F.col("token_id").alias("tid"), "token")),
        on="tid", how="left",
    ).select(
        id_col, "pos",
        F.coalesce(F.col("token"), F.lit(oov_token)).alias("tok"),
    )
    return mapped.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("text")
    )
