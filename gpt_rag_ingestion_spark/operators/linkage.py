"""Record linkage — fuzzy (edit-distance) matching with blocking.

Entity resolution across dirty sources (customer lists, author names,
dataset provenance strings) is the string-side sibling of the
embedding/MinHash dedup families: candidate pairs must come from a
BLOCKING key join, never an all-pairs comparison, and the expensive
verifier (Levenshtein) runs only inside blocks.

Blocking here: (first ``prefix_len`` chars, length bucket).  An edit
distance ≤ d can change the length by at most d and can only change
the prefix if the edit touches it — so a same-prefix, ±d-length block
finds the bulk of true matches (standard multi-pass practice adds a
second blocking key, e.g. suffix or phonetic code, to cover
prefix-edited pairs; same plan, another key).

Levenshtein is exact integer — the whole operator oracle-checks
against any engine with the same function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    text_col: str = "name",
    max_distance: int = 2,
    prefix_len: int = 2,
    salt_factor: int | None = None,
    target_block_rows: int = 4096,
) -> DataFrame:
    """(left_key, right_key, distance) for pairs with
    levenshtein ≤ ``max_distance``, candidates from a same-prefix,
    ±max_distance length-bucket equi-join.

    The block join is SALTED when blocks are big (left side hashed
    into sub-blocks, right side exploded across them — exact same
    candidate pairs): on low-entropy corpora the blocking key can
    degenerate to a handful of giant blocks (every TPC-H customer name
    shares the same 2-char prefix), and an unsalted join then runs the
    entire quadratic verification in as many tasks as there are
    distinct keys — one multi-minute straggler at sf0.1, unbounded at
    100 TB.  Salting bounds per-task work at the price of replicating
    the (small, pre-verification) right side ``salt_factor``×.

    ``salt_factor=None`` (default) GATES the salting on a measured
    block-size estimate — one tiny aggregate over the blocked left
    side: factor = ceil(max block rows / ``target_block_rows``),
    capped at 64.  Well-distributed inputs measure factor 1 and pay
    neither the right-side replication nor the extra repartition
    (advisor finding r3); degenerate-block corpora still get the full
    treatment.  Pass an explicit int to skip the measurement."""
    def blocked(df: DataFrame, key: str, side: str) -> DataFrame:
        t = F.lower(F.col(text_col))
        base = df.select(
            F.col(key),
            t.alias(f"_t_{side}"),
            F.substring(t, 1, prefix_len).alias("_pfx"),
            F.length(t).alias(f"_len_{side}"),
        )
        if side == "l":
            # explode the length tolerance on the SMALLER side so the
            # equi-join covers ±max_distance without a range condition
            return base.select(
                "*",
                F.explode(
                    F.sequence(
                        F.col(f"_len_{side}") - max_distance,
                        F.col(f"_len_{side}") + max_distance,
                    )
                ).alias("_lb"),
            )
        return base.withColumn("_lb", F.col(f"_len_{side}"))

    lb = blocked(left, left_key, "l")
    rb = blocked(right, right_key, "r")
    if salt_factor is None:
        mx = (
            lb.groupBy("_pfx", "_lb")
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(F.max("_n"))
            .first()[0]
        ) or 0
        salt_factor = max(1, min(64, -(-int(mx) // target_block_rows)))
    if salt_factor > 1:
        lb = lb.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(left_key)), F.lit(salt_factor))
        )
        # distribute the verification even when the right side
        # broadcasts: a small-file left arrives as 1-2 scan partitions,
        # and a broadcast join would then run the whole quadratic
        # Levenshtein pass in those tasks regardless of salting —
        # spread the salted sub-blocks first
        lb = lb.repartition(
            max(
                left.sparkSession.sparkContext.defaultParallelism,
                salt_factor,
            ),
            "_pfx", "_lb", "_salt",
        )
        rb = rb.withColumn(
            "_salt",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"), F.lit(salt_factor - 1).cast("long")
                )
            ),
        )
        cand = lb.join(rb, on=["_pfx", "_lb", "_salt"])
    else:
        cand = lb.join(rb, on=["_pfx", "_lb"])
    dist = F.levenshtein(F.col("_t_l"), F.col("_t_r"))
    return (
        cand.withColumn("distance", dist)
        .filter(F.col("distance") <= max_distance)
        .select(left_key, right_key, "distance")
        .distinct()
    )
