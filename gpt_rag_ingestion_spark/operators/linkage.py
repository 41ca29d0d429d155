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
) -> DataFrame:
    """(left_key, right_key, distance) for pairs with
    levenshtein ≤ ``max_distance``, candidates from a same-prefix,
    ±max_distance length-bucket equi-join."""
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
    cand = lb.join(rb, on=["_pfx", "_lb"])
    dist = F.levenshtein(F.col("_t_l"), F.col("_t_r"))
    return (
        cand.withColumn("distance", dist)
        .filter(F.col("distance") <= max_distance)
        .select(left_key, right_key, "distance")
        .distinct()
    )
