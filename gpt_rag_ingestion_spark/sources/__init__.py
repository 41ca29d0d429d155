from gpt_rag_ingestion_spark.sources.binary_docs import (  # noqa: F401
    read_binary_documents,
)
