"""Dataset manifests: audit + reproducibility for managed tables.

Every write to a training corpus should be checkable later: how many
rows, which columns, and a content digest that proves two tables (or
two runs) hold identical data without comparing them row by row.

The digest is ORDER-INDEPENDENT by construction — the sum of per-row
xxhash64 values over the canonicalized projection, in int64 wraparound
arithmetic — so it is invariant to partitioning, shuffle order, and
file layout, and it is computed as one narrow scan + one aggregate
(no sort, no collect).  Idempotent jobs are then provable: re-merging
the same increment leaves the digest bit-identical (tested), which is
the property the reference's delete-then-upload contract promises.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def table_digest(df: DataFrame, cols: list[str] | None = None) -> dict:
    """(n_rows, content digest) over ``cols`` (default: all columns,
    sorted by name for a canonical order).  NULLs hash distinctly from
    empty strings via an explicit marker."""
    cols = sorted(cols or df.columns)
    canon = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null")).alias(c)
        for c in cols
    ]
    row_hash = F.xxhash64(*[F.concat(F.lit(c + "="), F.col(c)) for c in cols])
    # the order-free sum runs in DECIMAL(38,0) (ANSI mode forbids long
    # wraparound) and reduces mod 2^64 on the driver — one scalar
    agg = (
        df.select(*canon)
        .select(row_hash.cast("decimal(38,0)").alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("h").alias("digest"),
        )
        .collect()[0]
    )
    return {
        "n_rows": int(agg["n"]),
        "digest": int(agg["digest"] or 0) % (1 << 64),
        "columns": cols,
    }


def write_manifest(
    spark: SparkSession,
    table_path: str,
    run_id: str | None = None,
    cols: list[str] | None = None,
) -> dict:
    """Compute the digest of the table at ``table_path`` and append a
    manifest entry (JSON lines) next to it.  Returns the entry."""
    df = spark.read.parquet(table_path)
    entry = table_digest(df, cols)
    entry["table_path"] = table_path
    entry["run_id"] = run_id
    entry["written_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    manifest = table_path.rstrip("/") + ".manifest.jsonl"
    with open(manifest, "a") as f:
        f.write(json.dumps(entry) + "\n")
    return entry


def read_manifest(table_path: str) -> list[dict]:
    manifest = table_path.rstrip("/") + ".manifest.jsonl"
    if not os.path.exists(manifest):
        return []
    with open(manifest) as f:
        return [json.loads(line) for line in f if line.strip()]
