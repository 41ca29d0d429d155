"""Sequence packing for LLM training-data pipelines (beyond-reference).

Training examples are built by concatenating documents up to a fixed
token budget per sequence; the packing assignment itself is a data-
engineering operator.  This module implements deterministic contiguous
packing: documents are laid out in a deterministic pseudo-random order
inside each group (md5 of the id — a stable shuffle), a running token
total is computed with one window, and each document's bin is the
running total BEFORE it divided by the budget.  A document that crosses
a bin boundary starts… wherever the cumulative layout puts it — this is
the "concat-then-split" packing used in practice (GPT-style pipelines),
not bin-packing: zero coordination, one shuffle, exact integers.

100 TB design: one hash-partition shuffle on ``group_col`` (the unit a
training shard is built from — source, language, topic…).  Windows
inside a group are linear scans; a skewed giant group should be salted
upstream into sub-groups (each sub-group becomes its own shard stream),
which changes nothing semantically since bins never cross groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each document to a training-sequence bin.

    Output: ``id_col``, ``group_col``, ``n_tokens`` (= ``token_col``),
    ``bin_id`` (0-based within group), ``bin_tokens`` (total tokens of
    the bin — tail bins may exceed ``budget`` by at most one document's
    overhang, exactly like concat-then-split packing), ``bin_docs``.

    Deterministic: layout order is (md5(id), id) — reshuffling input
    rows cannot change any assignment.  Exact integers end to end."""
    order = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    w = Window.partitionBy(group_col).orderBy(*order)
    cum = F.sum(F.col(token_col)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    # tokens BEFORE this doc, integer-divided by the budget: a doc
    # belongs to the bin its first token lands in (modulo subtraction,
    # not float division — exact for any magnitude)
    before = cum - F.col(token_col).cast("long")
    staged = df.select(
        F.col(id_col),
        F.col(group_col),
        F.col(token_col).cast("long").alias("n_tokens"),
        ((before - (before % budget)) / budget).cast("long").alias("bin_id"),
    )
    wb = Window.partitionBy(group_col, "bin_id")
    return (
        staged.withColumn("bin_tokens", F.sum("n_tokens").over(wb))
        .withColumn("bin_docs", F.count(F.lit(1)).over(wb))
    )


def mixture_take(
    df: DataFrame,
    token_col: str,
    targets: dict[str, int],
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budget corpus mixing: for each group, keep documents in
    deterministic hash order while the RUNNING token total (inclusive)
    stays within the group's target budget — the mixture-construction
    step that turns per-source weights into an actual document set
    ("2 % books, 60 % web…" becomes per-source token targets).

    Keeps the first document that crosses the budget (standard
    practice: budgets are soft by at most one document, so every
    group with data gets at least one doc).  Groups absent from
    ``targets`` are dropped.

    Output: ``id_col``, ``group_col``, ``n_tokens``, ``cum_tokens``,
    ``taken``.  Exact integers; one window shuffle on the group —
    identical shape to pack_sequences, so mixing and packing compose
    into a single stage at scale."""
    order = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    w = Window.partitionBy(group_col).orderBy(*order)
    # reference the projected alias, not token_col — the select below
    # renames it
    cum = F.sum(F.col("n_tokens")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    target = F.coalesce(
        *[
            F.when(F.col(group_col) == g, F.lit(int(t)))
            for g, t in sorted(targets.items())
        ],
        F.lit(-1),
    ) if targets else F.lit(-1)
    return (
        df.select(
            F.col(id_col),
            F.col(group_col),
            F.col(token_col).cast("long").alias("n_tokens"),
        )
        .withColumn("cum_tokens", cum)
        .withColumn("_target", target)
        .filter(F.col("_target") >= 0)
        .withColumn(
            # take while the PREVIOUS total is under target: the doc
            # that crosses the boundary is kept, later ones are not
            "taken",
            (F.col("cum_tokens") - F.col("n_tokens")) < F.col("_target"),
        )
        .drop("_target")
    )


def token_blocks(
    df: DataFrame,
    tokens_col: str,
    order: list,
    block_tokens: int,
    id_col: str = "doc_id",
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Fixed-context BLOCKIZATION: lay the corpus out as one token
    stream (in ``order``) and cut it into exact ``block_tokens``-sized
    blocks, splitting documents across block boundaries — the
    GPT-style dataloader layout, where block N = tokens
    [N*B, (N+1)*B) of the concatenated stream.

    Output: (block_id, id_col, start_in_doc, end_in_doc) — one row per
    (document, block) overlap; a document spanning k boundaries emits
    k+1 segment rows.  Reassembling block N = concatenating its
    segments in ``order`` and slicing each document's tokens at
    [start_in_doc, end_in_doc).

    Differs from ``pack_sequences`` (whole-document first-fit bins,
    nothing split): blockization wastes zero tokens to padding and is
    what pre-training loaders consume; packing preserves document
    atomicity for SFT-style loads.

    Plan: slim (id, tokens) prefix sum (single-exchange with
    ``bucket_expr``), then a narrow explode of per-document block
    spans — integer arithmetic end to end (oracle-checkable).
    """
    from gpt_rag_ingestion_spark.operators.ranking import (
        distributed_running_sum,
    )

    slim = df.select(F.col(id_col), F.col(tokens_col)).filter(
        F.col(tokens_col) > 0
    )
    run = distributed_running_sum(
        slim, order, tokens_col, sum_col="__cum", bucket_expr=bucket_expr
    )
    spans = run.selectExpr(
        id_col,
        f"__cum - {tokens_col} AS __st",
        "__cum AS __en",
    )
    b = F.lit(block_tokens)
    blocks = spans.select(
        F.col(id_col),
        "__st",
        "__en",
        F.explode(
            F.sequence(
                F.expr(f"__st div {block_tokens}"),
                F.expr(f"(__en - 1) div {block_tokens}"),
            )
        ).alias("block_id"),
    )
    return blocks.select(
        "block_id",
        F.col(id_col),
        (F.greatest(F.col("__st"), F.col("block_id") * b) - F.col("__st"))
        .cast("long")
        .alias("start_in_doc"),
        (
            F.least(F.col("__en"), (F.col("block_id") + 1) * b)
            - F.col("__st")
        )
        .cast("long")
        .alias("end_in_doc"),
    )
