"""Inverted-index construction (the reference's target artifact).

The reference ships chunk documents into Azure AI Search, whose data
structure is an inverted index (term -> posting list) plus a vector
index.  This operator builds the inverted half AS A TABLE — the
Spark-native re-expression of "indexing": one relation
(token, df, posting prefix) that a serving layer can load, and that
downstream jobs can query relationally (term lookups become joins).

Reference: the uploaded docs at jobs/blob_storage_indexer.py:793-818
are exactly the rows such an index is built from.

100 TB design: tokenize is a narrow map; the posting build is ONE
shuffle on the token (8-byte hashable key); per-token state is capped
by ``max_postings`` (a serving prefix — full postings stay derivable
from the base table), so no token's reduce-side state is unbounded.
Skewed ultra-common tokens ("the") cost one large sorted group each —
cap-first-then-sort keeps memory at O(cap) via the rank filter, not
O(occurrences).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 10,
) -> DataFrame:
    """(token, df, n_occurrences, postings) where ``df`` counts
    distinct documents, ``n_occurrences`` counts every hit, and
    ``postings`` is the first ``max_postings`` occurrences in
    (doc, pos) order serialized canonically as "doc:pos,doc:pos" —
    flat strings, so the result is engine-comparable (no nested-type
    hashing ambiguity)."""
    from gpt_rag_ingestion_spark.operators.dedup import tokenize

    toks = tokenize(df, text_col, id_col).select(
        F.col(id_col).alias("doc"), "pos", "token"
    )
    stats = toks.groupBy("token").agg(
        F.countDistinct("doc").alias("df"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )
    w = Window.partitionBy("token").orderBy("doc", "pos")
    prefix = (
        toks.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_postings)
        .groupBy("token")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc", "pos"))),
                    lambda s: F.concat_ws(
                        ":", s["doc"].cast("string"), s["pos"].cast("string")
                    ),
                ),
                ",",
            ).alias("postings")
        )
    )
    return stats.join(prefix, on="token")
