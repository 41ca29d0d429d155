"""Full-text BM25 + hybrid RRF fusion — the retrieval side of the
reference's index.

The reference uploads chunks into Azure AI Search and delegates
retrieval to its hybrid ranking: BM25 full-text + vector similarity,
fused by Reciprocal Rank Fusion (the documented AI Search hybrid
mode).  This module re-expresses that retrieval Spark-first so a user
of the reference can run the SAME query shapes against the engine's
chunk tables: an inverted-index BM25 scorer and an RRF fuser that
combines any number of rankings (BM25, exact cosine, ANN).

Determinism contract (the q66 linear-idf convention, extended):
classic BM25 sums ln-idf floats whose last ulp differs across libms,
so every factor here is INTEGER arithmetic with documented surrogates
— rankings reproduce bit-identically in any SQL engine:

- ``idf_q  = (N - df + 1) * S div (df + 1)``       (linear-idf surrogate;
                                                    the +1 keeps ubiquitous
                                                    terms df = N strictly
                                                    positive, Lucene-style)
- ``dlq    = 18 * dl * N div L``                   (18/20 = b-scaled length
                                                    ratio, avgdl = L/N)
- ``term_q = idf_q * 44 * tf div (20*tf + 6 + dlq)``
                                                   (k1 = 6/5, b = 3/4:
                                                    tf*(k1+1)/(tf + k1*(1-b
                                                    + b*dl/avgdl)) cross-
                                                    multiplied by 20)
- ``score_q = SUM(term_q)``; ties break (score desc, doc asc).

RRF: ``rrf_q = SUM(S div (K + rank))`` with the standard K = 60 —
exact integers again (AI Search uses the same 1/(60+rank) form).

Scale shape: the postings build is one (doc, token) shuffle; scoring
SEMI-JOINS the postings on the query term set first (broadcast — a
query batch is small), so only documents containing a query term are
ever touched; the per-query top-k window partitions by query id over
that candidate set.  No corpus-wide pass per query — the inverted
index IS the pre-computation, exactly like the search service.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IDF_SCALE = 1_000_000
RRF_SCALE = 1_000_000
RRF_K = 60


def build_text_index(
    chunks: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Inverted index state: postings (token, doc, tf), document
    frequencies (token, df), doc lengths (doc, dl), and the corpus
    constants N (docs) and L (total tokens).  One tokenize pass + one
    (doc, token) shuffle; persist the returned tables for reuse across
    query batches (they are the search service's index build)."""
    toks = chunks.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), "\\s+"), lambda t: t != "")
        ).alias("token"),
    )
    postings = toks.groupBy("token", "doc").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = postings.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    doclen = toks.groupBy("doc").agg(F.count(F.lit(1)).alias("dl"))
    agg = doclen.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("l")
    ).first()
    return {
        "postings": postings,
        "dfreq": dfreq,
        "doclen": doclen,
        "n_docs": int(agg["n"] or 0),
        "total_len": int(agg["l"] or 0),
    }


def bm25_topk(
    index: dict,
    queries: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    terms_col: str = "terms",
) -> DataFrame:
    """(query_id, rank, doc, score_q): integer-exact BM25 top-k per
    query.  ``queries``: (query_id, terms ARRAY<STRING>).  The postings
    are probed by a broadcast semi-join on the query term set — only
    candidate documents flow into scoring."""
    from pyspark.sql import Window

    n, l = index["n_docs"], index["total_len"]
    qterms = queries.select(
        F.col(query_id_col), F.explode(F.col(terms_col)).alias("token")
    ).distinct()
    cand = (
        index["postings"]
        .join(F.broadcast(qterms), "token")
        .join(F.broadcast(index["dfreq"]), "token")
        .join(index["doclen"].hint("shuffle_hash"), "doc")
    )
    term_q = F.expr(
        f"((({n} - df + 1) * {IDF_SCALE}) div (df + 1)) * 44 * tf"
        f" div (20 * tf + 6 + ((18 * dl * {n}) div {max(l, 1)}))"
    )
    scored = (
        cand.select(query_id_col, "doc", term_q.alias("term_q"))
        .groupBy(query_id_col, "doc")
        .agg(F.sum("term_q").cast("long").alias("score_q"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score_q"), F.asc("doc")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(query_id_col, "rank", "doc", "score_q")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    query_id_col: str = "query_id",
    rrf_k: int = RRF_K,
) -> DataFrame:
    """(query_id, rank, doc, rrf_q): Reciprocal Rank Fusion of any
    number of (query_id, doc, rank) rankings — the AI Search hybrid
    combiner, integer-exact: rrf_q = SUM(S div (K + rank)).  A doc
    absent from one ranking simply contributes nothing from it."""
    import functools

    from pyspark.sql import Window

    contribs = [
        r.select(
            query_id_col, "doc",
            F.expr(f"{RRF_SCALE} div ({int(rrf_k)} + rank)").alias("_c"),
        )
        for r in rankings
    ]
    allc = functools.reduce(lambda a, b: a.unionByName(b), contribs)
    fused = allc.groupBy(query_id_col, "doc").agg(
        F.sum("_c").cast("long").alias("rrf_q")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("rrf_q"), F.asc("doc"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(query_id_col, "rank", "doc", "rrf_q")
    )
