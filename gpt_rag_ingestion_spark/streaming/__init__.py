from gpt_rag_ingestion_spark.streaming.micro_batch import (  # noqa: F401
    run_incremental_ingest,
    windowed_event_counts,
)
