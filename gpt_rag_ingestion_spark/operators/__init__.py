from gpt_rag_ingestion_spark.operators.freshness import (  # noqa: F401
    freshness_candidates,
    index_watermarks,
)
from gpt_rag_ingestion_spark.operators.purge import purge_targets  # noqa: F401
