"""gpt_rag_ingestion_spark — a PySpark-native re-expression of the
Azure/gpt-rag-ingestion document-ingestion engine, extended with
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Architecture: everything is declared with the DataFrame API so Catalyst
owns the physical plan (predicate pushdown, column pruning, broadcast
selection, AQE).  Python drops in only for genuinely non-relational
work (recursive JSON partitioning, charset detection, byte-exact
truncation) and then always as Arrow-batched pandas UDFs.

Reference parity citations in docstrings point into
/root/reference (Azure/gpt-rag-ingestion v2.3.2).
"""

__version__ = "0.1.0"
