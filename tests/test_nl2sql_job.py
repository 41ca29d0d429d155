"""NL2SQL metadata lifecycle: kind routing, typed tables, question
embedding, purge identity."""

from __future__ import annotations

import json

from gpt_rag_ingestion_spark.embeddings import embed_text_deterministic
from gpt_rag_ingestion_spark.plans.nl2sql_job import (
    nl2sql_purge_targets,
    run_nl2sql_job,
)


def _fixture(tmp_path):
    (tmp_path / "queries").mkdir()
    (tmp_path / "tables").mkdir()
    (tmp_path / "measures").mkdir()
    (tmp_path / "queries" / "total sales.json").write_text(
        json.dumps(
            {"datasource": "wwi", "question": "total sales?", "query": "SELECT 1"}
        )
    )
    (tmp_path / "tables" / "dim_city.json").write_text(
        json.dumps(
            {
                "table": "dim_city",
                "description": "city dimension",
                "datasource": "wwi",
                "columns": [{"name": "city", "description": "name"}],
            }
        )
    )
    (tmp_path / "measures" / "revenue.json").write_text(
        json.dumps(
            {
                "datasource": "wwi", "name": "revenue",
                "description": "sum of sales", "type": "sum",
                "source_table": "fact_sale",
            }
        )
    )
    return tmp_path


def test_nl2sql_job_three_tables(spark, tmp_path):
    out = run_nl2sql_job(spark, str(_fixture(tmp_path)), embedding_dim=8)
    q = out["queries"].collect()[0]
    assert q["id"] == "queries-total-sales"  # sanitized path-derived id
    # queries embed the QUESTION, not the content
    assert list(q["contentVector"]) == embed_text_deterministic("total sales?", 8)
    t = out["tables"].collect()[0]
    assert t["id"] == "tables-dim_city"
    assert t["columns"][0]["name"] == "city"  # nested struct preserved
    assert list(t["contentVector"]) == embed_text_deterministic("city dimension", 8)
    m = out["measures"].collect()[0]
    assert m["source_table"] == "fact_sale"


def test_nl2sql_purge_identity(spark, tmp_path):
    _fixture(tmp_path)
    index_ids = spark.createDataFrame(
        [("queries-total-sales",), ("queries-deleted-one",)], ["id"]
    )
    live = spark.createDataFrame(
        [("queries", "x/queries/total sales.json")], ["kind", "src_file"]
    )
    targets = nl2sql_purge_targets(index_ids, live)
    assert [r["id"] for r in targets.collect()] == ["queries-deleted-one"]
