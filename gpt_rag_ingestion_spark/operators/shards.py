"""Sized training-shard writer (beyond-reference, LLM-pipeline
family).

Training-data consumers read fixed-budget shards ("~1 GB / ~100 M
tokens per file"), not whatever file sizes the last shuffle happened
to leave.  This sink assigns every document a deterministic shard id
by its position in a global token-count prefix sum, then writes one
parquet file per shard.

Scale shape: the prefix sum is the range-partition + local-prefix +
offset pattern (`ranking.distributed_running_sum`) — token counts move
as 8-byte longs, the driver sees one (partition, total) pair per
partition.  The write is one hash shuffle on shard id; each shard's
rows land in a single task, so `partitionBy(shard)` emits exactly one
file per shard directory.  Shard budgets hold within one document of
``target_tokens`` (a document never splits across shards).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gpt_rag_ingestion_spark.operators.ranking import distributed_running_sum


def assign_shards(
    df: DataFrame,
    tokens_col: str,
    order: Sequence[Column],
    target_tokens: int,
    shard_col: str = "shard_id",
    id_col: str | None = None,
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Deterministic shard id: the shard in which the document STARTS
    under the global running token sum over ``order`` (a total order —
    pass a unique tiebreaker).  shard = floor(start_offset / target).

    When ``id_col`` is given, the prefix sum runs on the PROJECTED
    (id, tokens) relation — 16-byte rows — and the shard id joins back
    by id, so wide columns (document text) never ride the prefix-sum
    exchanges; with ``bucket_expr`` (order-aligned buckets, see
    ``distributed_running_sum``) the projection shuffles exactly once."""
    if id_col is not None:
        slim = df.select(F.col(id_col), F.col(tokens_col))
        run = distributed_running_sum(
            slim, order, tokens_col, sum_col="__cum", bucket_expr=bucket_expr
        )
        start = F.col("__cum") - F.col(tokens_col)
        assigned = run.select(
            F.col(id_col),
            (start / target_tokens).cast("long").alias(shard_col),
        )
        return df.join(assigned, on=id_col)
    run = distributed_running_sum(
        df, order, tokens_col, sum_col="__cum", bucket_expr=bucket_expr
    )
    start = F.col("__cum") - F.col(tokens_col)
    return run.withColumn(
        shard_col, (start / target_tokens).cast("long")
    ).drop("__cum")


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    tokens_col: str,
    order: Sequence[Column],
    target_tokens: int,
    shard_col: str = "shard_id",
    id_col: str | None = None,
    bucket_expr: Column | None = None,
    fmt: str = "parquet",
) -> int:
    """Assign shards and write ``out_dir/shard_id=N/`` with ONE file
    per shard.  Returns the number of shards written.

    ``fmt``: "parquet" (columnar, default) or "jsonl" — gzip-compressed
    JSON lines, the standard LLM-training interchange format most
    dataloaders stream directly.

    The repartition on shard id co-locates each shard in one task;
    rows inside a shard keep ``order`` via sortWithinPartitions, so a
    reader streaming one file sees documents in global order."""
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"fmt must be parquet|jsonl: {fmt}")
    assigned = assign_shards(
        df, tokens_col, order, target_tokens, shard_col,
        id_col=id_col, bucket_expr=bucket_expr,
    )
    writer = (
        assigned.repartition(F.col(shard_col))
        .sortWithinPartitions(*order)
        .write.mode("overwrite")
        .partitionBy(shard_col)
    )
    reader = df.sparkSession.read
    if fmt == "jsonl":
        writer.option("compression", "gzip").json(out_dir)
        read_back = reader.json(out_dir)
    else:
        writer.parquet(out_dir)
        read_back = reader.parquet(out_dir)
    return read_back.select(shard_col).distinct().count()
