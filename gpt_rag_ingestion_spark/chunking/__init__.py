from gpt_rag_ingestion_spark.chunking.splitter import (  # noqa: F401
    chunk_fixed,
    split_text_recursive,
)
from gpt_rag_ingestion_spark.chunking.pipeline import chunk_documents  # noqa: F401
