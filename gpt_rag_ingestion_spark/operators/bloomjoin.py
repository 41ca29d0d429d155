"""Bloom-filter runtime join pruning (beyond-reference, scale family).

The 100 TB join problem: a fact table joins a dimension subset that is
too big to broadcast as a hash relation per-row but whose MEMBERSHIP
fits in kilobytes as a Bloom filter.  Pruning the fact side before the
shuffle turns "shuffle 100 TB, keep 1%" into "shuffle 1%".  Spark has
an automatic version (`spark.sql.optimizer.runtime.bloomFilter.enabled`,
SPARK-32268) whose hash family is engine-internal; this operator is the
explicit, deterministic variant — md5-derived bit positions, so the
exact same filter can be rebuilt in any engine (and the composition
stays oracle-checkable: false positives are removed by the exact join
that follows, so the pruned plan returns bit-identical results to the
unpruned one).

Shape: the filter is ONE row holding a map<word_idx, 64-bit word>
(≤ num_bits/64 entries — bounded by configuration, independent of data
volume).  Build = one groupBy over distinct bit positions; probe = a
broadcast of that single row + a pure-codegen bit test per fact row.
No explode on the fact side, no per-row UDF.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """Deterministic md5 hash family: position_j = int(md5("bf{j}:" || key)[:15 hex]) % num_bits."""
    return [
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"bf{j}:"), key.cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        % num_bits
        for j in range(num_hashes)
    ]


def bloom_bitmap(
    keys: DataFrame,
    key_col: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
) -> DataFrame:
    """Build the filter: a single-row DataFrame with column ``words``
    (map<long,long> of word index → OR-ed bits).

    One narrow pass over the key set: explode each key into its
    ``num_hashes`` positions, distinct, OR bits per 64-bit word.  The
    result has at most ``num_bits/64`` map entries regardless of how
    many keys went in.
    """
    pos = (
        keys.select(
            F.explode(
                F.array(*_positions(F.col(key_col), num_bits, num_hashes))
            ).alias("pos")
        )
        .distinct()
    )
    words = pos.groupBy((F.col("pos") / 64).cast("long").alias("word_idx")).agg(
        F.expr("bit_or(shiftleft(1L, CAST(pos % 64 AS INT)))").alias("word")
    )
    return words.groupBy().agg(
        F.map_from_arrays(
            F.collect_list("word_idx"), F.collect_list("word")
        ).alias("words")
    )


def bloom_prune(
    fact: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
) -> DataFrame:
    """Keep fact rows whose key MAY be in the key set (never drops a
    true match; false positives pass and must be removed by the exact
    join downstream).

    The single-row bitmap broadcasts; the probe is an AND of
    ``num_hashes`` element_at + bit-test expressions — whole-stage
    codegen, zero shuffle added to the fact side.
    """
    probed = fact.crossJoin(F.broadcast(bitmap))
    pos_cols = _positions(F.col(key_col), num_bits, num_hashes)
    for j, p in enumerate(pos_cols):
        probed = probed.withColumn(f"__bfpos{j}", p)
    tests = [
        F.expr(
            f"coalesce(element_at(words, CAST(__bfpos{j} / 64 AS BIGINT)), 0L)"
            f" & shiftleft(1L, CAST(__bfpos{j} % 64 AS INT)) != 0"
        )
        for j in range(num_hashes)
    ]
    return probed.filter(reduce(lambda a, b: a & b, tests)).drop(
        "words", *[f"__bfpos{j}" for j in range(num_hashes)]
    )


def bloom_semijoin(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
) -> DataFrame:
    """Exact semi-join with Bloom pre-pruning: prune the fact shuffle
    with the membership filter, then remove false positives with the
    real ``left_semi`` join.  Result is bit-identical to the plain
    semi-join — the filter only changes how many rows reach the
    exchange."""
    bitmap = bloom_bitmap(dim_keys, dim_key, num_bits, num_hashes)
    pruned = bloom_prune(fact, fact_key, bitmap, num_bits, num_hashes)
    return pruned.join(
        dim_keys.withColumnRenamed(dim_key, fact_key).select(fact_key).distinct(),
        on=fact_key,
        how="left_semi",
    )
