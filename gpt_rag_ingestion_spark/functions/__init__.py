"""Column-expression library (SURVEY.md §2.7).

Everything here is built from pyspark.sql.functions so it stays inside
whole-stage codegen; pandas UDFs appear only where a byte-exact or
recursive semantic genuinely cannot be expressed relationally
(byte-safe truncation, charset detection, recursive JSON packing).
"""

from gpt_rag_ingestion_spark.functions.keys import (  # noqa: F401
    chunk_key,
    parent_key,
    sanitize_key,
)
from gpt_rag_ingestion_spark.functions.text import (  # noqa: F401
    byte_truncate_udf,
    decode_text_udf,
    extension_of,
    filename_of,
    title_from_filename,
)
from gpt_rag_ingestion_spark.functions.tokens import (  # noqa: F401
    approx_token_count,
    token_truncate_udf,
)
from gpt_rag_ingestion_spark.functions.acl import parse_acl_ids  # noqa: F401
