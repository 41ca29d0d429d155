"""Ops/observability layer (SURVEY.md §2 A2-A6, P3, W4-W6; reference §5).

The reference keeps per-file JSON logs with runHistory, retry counts, a
blocklist, and per-run summary counters, all maintained imperatively
under asyncio locks (reference jobs/blob_storage_indexer.py:240-338,
444-505, 598-706; api/admin.py:202-357).  Here the ops state is an
append-only DataFrame/table and every ops feature is a query over it:

- blocklist (P3): an aggregation, not mutable state — a file is blocked
  when its failed-attempt count reaches MAX_ATTEMPTS.
- run summary (A2): one groupBy over the per-file result rows.
- cost accounting (A4): arithmetic over usage columns.
- retention (W6): row_number over run start times.
- stale-run detection (reference CHANGELOG.md:16): started > 2h ago and
  never finished.

Everything is built-in column algebra — no UDFs, scales to any log
volume (shuffle keys are file/run ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_FILE_PROCESSING_ATTEMPTS = 3  # reference blob_storage_indexer.py:82
STALE_RUN_HOURS = 2  # reference CHANGELOG.md:16

COST_PER_PAGE_ANALYSIS = 0.01  # reference blob_storage_indexer.py:645
COST_PER_1K_EMBEDDING_TOKENS = 0.00013  # :646
COST_PER_1K_COMPLETION_IN = 0.0025  # :647
COST_PER_1K_COMPLETION_OUT = 0.01  # :648


def blocked_files(
    attempts: DataFrame,
    file_col: str = "file_key",
    status_col: str = "status",
    max_attempts: int = MAX_FILE_PROCESSING_ATTEMPTS,
    ts_col: str = "attempt_ts",
) -> DataFrame:
    """P3: files whose consecutive-failure count reached the cap.  The
    reference mutates a ``blocked`` flag per file (blob_storage_indexer
    .py:449-505); relationally, blocked == 'failures since last success
    >= max'."""
    w = Window.partitionBy(file_col)
    last_success = F.max(
        F.when(F.col(status_col) == "success", F.col(ts_col))
    ).over(w)
    fails_after = (
        attempts.withColumn("_last_ok", last_success)
        .filter(
            (F.col(status_col) == "failed")
            & (F.col("_last_ok").isNull() | (F.col(ts_col) > F.col("_last_ok")))
        )
        .groupBy(file_col)
        .agg(F.count(F.lit(1)).alias("consecutive_failures"))
    )
    return fails_after.filter(
        F.col("consecutive_failures") >= max_attempts
    ).withColumn("blocked", F.lit(True))


def apply_blocklist(
    candidates: DataFrame, blocked: DataFrame, file_col: str = "file_key"
) -> DataFrame:
    """Skip blocked files: anti-join (the reference's per-file check)."""
    return candidates.join(
        F.broadcast(blocked.select(file_col)), on=file_col, how="left_anti"
    )


def unblock_files(
    attempts: DataFrame,
    keys: DataFrame,
    file_col: str = "file_key",
    status_col: str = "status",
    ts_col: str = "attempt_ts",
) -> DataFrame:
    """Admin unblock (reference api/admin.py:364-383 resets
    ``blocked``/attempt counters in the file's log blob).  Relationally
    — where blocked == 'consecutive failures since last success' (see
    ``blocked_files``) — unblocking a file means forgetting its failed
    attempts to date: append one synthetic ``unblocked`` success marker
    per key, timestamped at the file's latest attempt, so the
    consecutive-failure count restarts at 0 while history stays
    append-only (no row mutation, merge-friendly at any scale).
    Returns the attempts table with markers appended; re-running
    ``blocked_files`` on it no longer reports the unblocked keys."""
    latest = (
        attempts.join(F.broadcast(keys.select(file_col)), on=file_col, how="left_semi")
        .groupBy(file_col)
        .agg(F.max(ts_col).alias(ts_col))
    )
    markers = latest.select(
        file_col,
        F.lit("success").alias(status_col),
        ts_col,
        *[
            F.lit(None).cast(attempts.schema[c].dataType).alias(c)
            for c in attempts.columns
            if c not in (file_col, status_col, ts_col)
        ],
    ).select(*attempts.columns)
    return attempts.unionByName(markers)


def run_summary(results: DataFrame, run_col: str = "run_id") -> DataFrame:
    """A2: per-run counters (reference :267-338) as one aggregation over
    per-file result rows with a ``status`` column."""
    s = F.col("status")
    return results.groupBy(run_col).agg(
        F.count(F.lit(1)).alias("sourceFiles"),
        F.sum(F.when(s == "success", 1).otherwise(0)).alias("success"),
        F.sum(F.when(s == "failed", 1).otherwise(0)).alias("failed"),
        F.sum(F.when(s == "skipped_no_change", 1).otherwise(0)).alias(
            "skippedNoChange"
        ),
        F.sum(F.when(s == "skipped_blocked", 1).otherwise(0)).alias("skippedBlocked"),
        F.sum(F.coalesce(F.col("chunks"), F.lit(0))).alias("totalChunksUploaded"),
    )


def cost_estimate(
    usage: DataFrame,
    pages_col: str = "pages_analyzed",
    embed_tokens_col: str = "embedding_tokens",
    in_tokens_col: str = "completion_tokens_in",
    out_tokens_col: str = "completion_tokens_out",
) -> DataFrame:
    """A4: the reference's cost model (blob_storage_indexer.py:634-653)
    as a column expression, rounded to 4 dp like the reference.

    The arithmetic is EXACT but runs on scaled longs, not BigDecimal
    (r12, guide §1.2 "per-task work" / §2.3 "narrower types"): double
    rounding at a 4 dp boundary diverges between engines when enough
    rows exist to hit one (the sf0.1 oracle sweep caught exactly
    that), and the original formulation therefore did every product
    and sum in the decimal domain — but those intermediates exceed 18
    digits of precision, so every row paid interpreted
    BigDecimal-backed arithmetic.  Since all four per-token rates are
    exact multiples of 10^-12 USD (0.01, 0.00013/1000 = 13e-12·10^4,
    0.0025/1000 = 250e-12·10^4, 0.01/1000 = 1000e-12·10^4), the whole
    model is integer arithmetic in 10^-12-USD units:

    - each input enters through ONE decimal cast — the identical cast
      the decimal form used (decimal(20,0) for pages, decimal(20,4)
      for token counts, i.e. HALF_UP at 0/4 dp for non-integral
      doubles) — then scales to a long (exact: the fraction digits
      are zero after the *10^4);
    - cost_e12 = pages·10^10 + embed_e4·13 + cin_e4·250 + cout_e4·1000
      (exact long math; bounds: |pages| ≤ 9.2e8, token counts ≤ 7e13
      per ROW — per-file/run usage counters, not corpus sums — far
      under int64);
    - round-HALF-UP to 4 dp == (cost_e12 + 5e7) - pmod(·, 1e8), an
      exact multiple m of 10^8 (HALF_UP == floor(x+half) for the
      non-negative counters this models; pmod keeps even a negative
      input on the floor form);
    - estimated = m / 10^12 as ONE double division: m < 2^53 is exact
      in double and m/10^12 equals the rational r·10^-4 exactly, so
      IEEE nearest gives the same double as decimal(·,4).cast(double).

    Bit-equality with the decimal form is pinned by
    tests/test_r12_optimizations.py::test_cost_estimate_long_matches_decimal
    (4 dp boundary values, null/None, non-integral doubles) and the
    full-table sweep noted in OPTIMIZATION_r12.md; the oracle SQL
    (unchanged) still computes the decimal construction."""
    pages_l = (
        F.coalesce(F.col(pages_col), F.lit(0)).cast("decimal(20,0)").cast("long")
    )

    def _e4(col: str):
        # one decimal cast (the HALF_UP-at-4dp contract), then exact long
        return (
            (F.coalesce(F.col(col), F.lit(0)).cast("decimal(20,4)") * 10000)
            .cast("long")
        )

    cost_e12 = (
        pages_l * F.lit(10_000_000_000)
        + _e4(embed_tokens_col) * F.lit(13)
        + _e4(in_tokens_col) * F.lit(250)
        + _e4(out_tokens_col) * F.lit(1000)
    )
    half = cost_e12 + F.lit(50_000_000)
    m = half - F.pmod(half, F.lit(100_000_000))
    return usage.withColumn(
        "estimated_cost_usd", m.cast("double") / F.lit(1_000_000_000_000.0)
    )


def retention_targets(
    runs: DataFrame,
    ts_col: str = "started_at",
    keep: int = 500,
) -> DataFrame:
    """W6: run summaries beyond the newest ``keep`` (reference
    api/admin.py:202-237) — deletion candidates.

    Ranked with the distributed global row_number (range partition +
    local rank + offset), not an unpartitioned window — years of run
    history never funnel through one task."""
    from gpt_rag_ingestion_spark.operators.ranking import distributed_row_number

    ranked = distributed_row_number(runs, [F.desc(ts_col)], rank_col="rn")
    return ranked.filter(F.col("rn") > keep)


def stale_runs(runs: DataFrame, now_ts, hours: int = STALE_RUN_HOURS) -> DataFrame:
    """Runs started > ``hours`` ago with no finish — mark interrupted
    (reference CHANGELOG.md:16)."""
    age_ok = F.col("started_at") < (
        F.lit(now_ts) - F.expr(f"INTERVAL {hours} HOURS")
    )
    return runs.filter(F.col("finished_at").isNull() & age_ok).withColumn(
        "status", F.lit("interrupted")
    )


def run_history(
    file_logs: DataFrame,
    file_col: str = "file_key",
    ts_col: str = "started_at",
) -> DataFrame:
    """W4: per-file runHistory newest-first (reference :701-706) as an
    ordered collect_list."""
    return file_logs.groupBy(file_col).agg(
        F.reverse(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(ts_col).alias("startedAt"), F.col("status"))
                )
            )
        ).alias("runHistory")
    )
