

def test_retrieval_metrics_edges(spark):
    """Hand-computable fixture: q_a has 2 relevant docs, both hit at
    ranks 1 and 3; q_b has 3 relevant docs, none retrieved; q_c has 12
    relevant (> k) so idcg caps at the k-prefix; a query absent from
    qrels is excluded (nDCG undefined)."""
    import math

    from gpt_rag_ingestion_spark.operators.ranking import retrieval_metrics

    k, scale = 5, 1_000_000
    w = [round(scale / math.log2(i + 1)) for i in range(1, k + 1)]
    hits = spark.createDataFrame(
        [("q_a", f"d{r}", r) for r in range(1, 6)]
        + [("q_b", f"x{r}", r) for r in range(1, 6)]
        + [("q_c", f"c{r}", r) for r in range(1, 6)]
        + [("q_nr", f"z{r}", r) for r in range(1, 6)],
        "query_id string, doc string, rank int",
    )
    qrels = spark.createDataFrame(
        [("q_a", "d1"), ("q_a", "d3")]
        + [("q_b", f"m{i}") for i in range(3)]
        + [("q_c", f"c{r}") for r in range(1, 3)]
        + [("q_c", f"cc{i}") for i in range(10)],
        "query_id string, doc string",
    )
    out = {
        r["query_id"]: r.asDict()
        for r in retrieval_metrics(hits, qrels, k=k).collect()
    }
    assert set(out) == {"q_a", "q_b", "q_c"}  # q_nr excluded
    a = out["q_a"]
    assert a["n_rel"] == 2 and a["hits_at_k"] == 2
    assert a["rr_q"] == scale  # first relevant at rank 1
    assert a["recall_q"] == scale
    assert a["dcg_q"] == w[0] + w[2]
    assert a["idcg_q"] == w[0] + w[1]
    assert a["ndcg_q"] == (w[0] + w[2]) * scale // (w[0] + w[1])
    b = out["q_b"]
    assert (b["hits_at_k"], b["rr_q"], b["dcg_q"], b["ndcg_q"]) == (
        0, 0, 0, 0,
    )
    assert b["recall_q"] == 0 and b["n_rel"] == 3
    c = out["q_c"]
    assert c["n_rel"] == 12
    assert c["idcg_q"] == sum(w)  # capped at the k-prefix
    assert c["hits_at_k"] == 2 and c["rr_q"] == scale
