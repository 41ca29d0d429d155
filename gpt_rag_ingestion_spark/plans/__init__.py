from gpt_rag_ingestion_spark.plans.ingest_job import run_ingest_job  # noqa: F401
