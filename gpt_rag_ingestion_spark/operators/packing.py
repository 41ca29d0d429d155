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

from pyspark.sql import DataFrame, Window
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
