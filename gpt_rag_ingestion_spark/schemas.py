"""Explicit StructTypes for the engine's tables.

The reference keeps its schema implicit — every writer hand-builds the
same flat dict (reference jobs/blob_storage_indexer.py:793-818,
jobs/sharepoint_indexer.py:905-967).  Here the chunk schema is a single
source-of-truth StructType; Parquet/Delta storage is columnar, a strict
upgrade over the reference's JSON-document index.
"""

from __future__ import annotations

from pyspark.sql import types as T

EMBEDDING_DIM_DEFAULT = 3072  # reference chunking/chunkers/base_chunker.py:148

#: The main chunks table — mirrors the search-index document
#: (reference jobs/blob_storage_indexer.py:793-818).
CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("parent_id", T.StringType(), False),
        T.StructField("metadata_storage_path", T.StringType(), True),
        T.StructField("metadata_storage_name", T.StringType(), True),
        T.StructField("metadata_storage_last_modified", T.TimestampType(), True),
        T.StructField("metadata_security_user_ids", T.ArrayType(T.StringType()), True),
        T.StructField("metadata_security_group_ids", T.ArrayType(T.StringType()), True),
        T.StructField("metadata_security_rbac_scope", T.StringType(), True),
        T.StructField("chunk_id", T.IntegerType(), True),
        T.StructField("page", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("length", T.IntegerType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("imageCaptions", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("filepath", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("summary", T.StringType(), True),
        T.StructField("relatedImages", T.ArrayType(T.StringType()), True),
        T.StructField("relatedFiles", T.ArrayType(T.StringType()), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("contentVector", T.ArrayType(T.FloatType()), True),
        T.StructField("captionVector", T.ArrayType(T.FloatType()), True),
    ]
)

#: Source-document listing (reference jobs/blob_storage_indexer.py:286-302,
#: 587-595) — what spark.read.format("binaryFile") produces, plus ACL strings.
SOURCE_DOC_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("file_name", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("last_modified", T.TimestampType(), True),
        T.StructField("size", T.LongType(), True),
        T.StructField("security_user_ids", T.StringType(), True),
        T.StructField("security_group_ids", T.StringType(), True),
    ]
)

#: Ops log (run summaries / per-file logs, reference
#: jobs/blob_storage_indexer.py:240-256, 464-479, 598-706) as an
#: append-only table instead of JSON-blob-per-file.
OPS_LOG_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("file_key", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("attempts", T.IntegerType(), True),
        T.StructField("blocked", T.BooleanType(), True),
        T.StructField("started_at", T.TimestampType(), True),
        T.StructField("finished_at", T.TimestampType(), True),
        T.StructField("chunks", T.IntegerType(), True),
        T.StructField(
            "timings",
            T.StructType(
                [
                    T.StructField("downloadSec", T.DoubleType(), True),
                    T.StructField("analysisSec", T.DoubleType(), True),
                    T.StructField("chunkEmbedSec", T.DoubleType(), True),
                    T.StructField("retryWaitSec", T.DoubleType(), True),
                    T.StructField("retryCount", T.IntegerType(), True),
                    T.StructField("indexUploadSec", T.DoubleType(), True),
                    T.StructField("overheadSec", T.DoubleType(), True),
                    T.StructField("totalSec", T.DoubleType(), True),
                ]
            ),
            True,
        ),
        T.StructField(
            "costEstimate",
            T.StructType(
                [
                    T.StructField("pagesAnalyzed", T.IntegerType(), True),
                    T.StructField("embeddingTokens", T.LongType(), True),
                    T.StructField("completionTokensIn", T.LongType(), True),
                    T.StructField("completionTokensOut", T.LongType(), True),
                    T.StructField("totalUSD", T.DoubleType(), True),
                ]
            ),
            True,
        ),
        T.StructField("error", T.StringType(), True),
    ]
)

#: NL2SQL metadata trio (reference jobs/nl2sql_indexer.py:282-328).
NL2SQL_QUERY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("datasource", T.StringType(), True),
        T.StructField("question", T.StringType(), True),
        T.StructField("query", T.StringType(), True),
        T.StructField("reasoning", T.StringType(), True),
        T.StructField("contentVector", T.ArrayType(T.FloatType()), True),
    ]
)

NL2SQL_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("table", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("datasource", T.StringType(), True),
        T.StructField(
            "columns",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType(), True),
                        T.StructField("description", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField("contentVector", T.ArrayType(T.FloatType()), True),
    ]
)

NL2SQL_MEASURE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("datasource", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("source_table", T.StringType(), True),
        T.StructField("data_type", T.StringType(), True),
        T.StructField("source_model", T.StringType(), True),
        T.StructField("contentVector", T.ArrayType(T.FloatType()), True),
    ]
)
