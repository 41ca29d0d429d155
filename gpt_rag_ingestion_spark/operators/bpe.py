"""Distributed BPE merge training (beyond-reference, LLM-pipeline
family).

Sennrich et al. 2016 byte-pair encoding: repeatedly merge the most
frequent adjacent symbol pair.  The distributed formulation exploits
the classic observation that BPE trains on the WORD-FREQUENCY table,
not the corpus: one corpus-sized aggregation up front (word -> count),
then every iteration touches only the vocabulary relation — at 100 TB
the corpus is read once and the loop runs over a table that fits any
cluster comfortably (|distinct words| ≪ corpus size).

Per iteration (all relational):
  1. adjacent pairs via two ``slice`` views zipped — a narrow map;
  2. pair counts = one groupBy(left, right) weighted by word freq;
  3. argmax pair = orderBy + limit(1) (TakeOrdered — no global sort),
     ties broken (count desc, left asc, right asc) so the learned
     merge sequence is deterministic in any engine;
  4. apply the merge with a left-to-right ``F.aggregate`` fold over
     each word's symbol array — pure codegen, no UDF.

The only driver data is one (left, right, count) row per iteration —
the merge being learned — and ``localCheckpoint`` truncates the plan
between iterations so lineage stays O(1) rather than O(num_merges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequencies(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """Corpus -> (word, freq) — the single corpus-sized pass."""
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    words = df.select(
        F.explode(F.split(c, r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    n = F.size("syms")
    pairs = vocab.select(
        "freq",
        F.explode(
            F.arrays_zip(
                F.slice("syms", 1, n - 1).alias("l"),
                F.slice("syms", 2, n - 1).alias("r"),
            )
        ).alias("p"),
    ).select("freq", F.col("p.l").alias("left"), F.col("p.r").alias("right"))
    return pairs.groupBy("left", "right").agg(F.sum("freq").alias("n_pair"))


def _merge_expr(syms, left: str, right: str):
    """The merge fold as an expression over ``syms`` — composable, so a
    batch of merges nests k folds into ONE projection (one Spark job)."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Left-to-right non-overlapping merge of (left, right) in every
    word, as a fold: append each symbol, replacing the tail pair when
    it matches — exactly the sequential BPE merge order."""
    return vocab.withColumn("syms", _merge_expr(F.col("syms"), left, right))


def _select_safe_batch(
    rows, k: int, min_pair_count: int, learned_tokens: set
) -> list:
    """Greedy prefix of the (count desc, left, right)-ordered pair list
    that is PROVABLY equivalent to applying the same merges one
    argmax-at-a-time.

    Merging (l, r) rewrites occurrences "l r" -> "lr", so it changes
    the count of a pair (a, b) ONLY when b == l (an "a l" adjacency is
    destroyed when that l merges), a == r (an "r b" adjacency is
    destroyed — this also covers chains like "l r l r" and self-merges
    l == r), or a/b equals the minted token string lr (only possible
    when lr already exists as a symbol).  Pairs like (e, s) and (e, r)
    therefore batch together even though they share 'e': a shared LEFT
    symbol never interacts.

    Selection — walk the (count desc, left, right)-ordered rows,
    never skipping:
    - stop at the first pair AFFECTED by an earlier pick (its count
      could change before the sequential argmax reaches it);
    - stop when a pair's merged token equals an existing symbol (a
      previously learned token or an earlier pick's token): merging
      would mint new occurrences of that symbol and could RAISE some
      count above later picks;
    - finally truncate to picks whose count is STRICTLY above the
      first unpicked pair's count (the boundary).  At sequential step
      i every competitor is bounded by the boundary: unpicked
      originals by the never-skip prefix order (counts only decrease),
      spawned pairs (x, lr) by count(x, l) — and (x, l) is necessarily
      unpicked, since (x, l) and (l, r) are mutually affected in
      either pick order.  The strict gap beats count ties; equal-count
      picks keep their original lexicographic order among themselves.

    Returns [(left, right, n_pair), ...]; may be empty (caller falls
    back to the single-merge step)."""
    picked: list = []
    boundary = None
    for r in rows:
        if len(picked) == k or r["n_pair"] < min_pair_count:
            boundary = r["n_pair"]
            break
        a, b = r["left"], r["right"]
        if _affected(a, b, picked, learned_tokens):
            boundary = r["n_pair"]
            break
        picked.append((a, b, int(r["n_pair"])))
        learned_tokens = learned_tokens | {a + b}
    if boundary is not None:
        picked = [p for p in picked if p[2] > boundary]
    return picked


def _affected(a: str, b: str, picked: list, learned_tokens: set) -> bool:
    """Can earlier picks change the count of pair (a, b)?  (See
    ``_select_safe_batch`` for the interaction derivation.)"""
    return (a + b) in learned_tokens or any(
        b == l or a == r or a == l + r or b == l + r for l, r, _ in picked
    )


def _select_skip_batch(
    rows, k: int, min_pair_count: int, learned_tokens: set
) -> list:
    """Standard batched BPE: greedily pick up to ``k`` mutually
    NON-INTERACTING pairs from the ordered list, SKIPPING affected
    pairs instead of stopping at them.  Rounds drop to ~merges/k even
    on character-level text where the exact prefix rule stalls — the
    price is that a skipped pair is learned one round later than the
    strict sequential argmax would have learned it (its count may have
    changed in between), so the learned table can deviate when top
    pairs interact.  Provably identical to sequential when the top
    pairs don't interact; the ``exact=True`` mode (and
    ``merges_per_round=1``) remains the oracle."""
    picked: list = []
    for r in rows:
        if len(picked) == k:
            break
        if r["n_pair"] < min_pair_count:
            break
        a, b = r["left"], r["right"]
        if _affected(a, b, picked, learned_tokens):
            continue
        picked.append((a, b, int(r["n_pair"])))
        learned_tokens = learned_tokens | {a + b}
    return picked


LAST_TRAIN_ROUNDS = 0  # cluster round-trips of the last bpe_train call


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 32,
    min_pair_count: int = 2,
    merges_per_round: int = 1,
    exact: bool = True,
) -> DataFrame:
    """Learn up to ``num_merges`` BPE merges; returns the merge table
    (rank, left, right, token, n_pair) in learned order.  Stops early
    when no pair reaches ``min_pair_count``.

    ``merges_per_round=1`` is the oracle baseline: one pair-count job +
    one merge application per learned rank.  ``merges_per_round=K``
    batches K merges into ONE composed projection per round, cutting
    cluster round-trips — the scaling lever, since at a production 32k
    vocabulary round count (not per-round cost) is the wall-clock
    driver:

    - ``exact=True``: applies only the longest PROVABLY-SAFE prefix of
      the ordered pair list (``_select_safe_batch``), falling back to
      the top-1 step when none is safe — the learned table is
      IDENTICAL to sequential, but character-level early merges
      interact heavily, so the round reduction is modest there.
    - ``exact=False``: standard batched BPE — greedily picks up to K
      mutually non-interacting pairs, SKIPPING interacting ones
      (``_select_skip_batch``); rounds ~ merges/K.  Identical to
      sequential when the picked pairs don't interact (unit-proven);
      may otherwise learn interacting merges a round later than the
      strict argmax order.

    ``LAST_TRAIN_ROUNDS`` records the round count for
    instrumentation."""
    global LAST_TRAIN_ROUNDS
    spark = df.sparkSession
    vocab = word_frequencies(df, text_col).withColumn(
        "syms", F.split("word", "")
    )
    vocab = vocab.localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, str, int]] = []
    rounds = 0
    while len(merges) < num_merges:
        k = min(merges_per_round, num_merges - len(merges))
        # exact mode needs the boundary row (k+1); skip mode scans a
        # deeper pool so K survivors remain after skips
        limit = k + 1 if exact else max(4 * k, k + 8)
        rows = (
            _pair_counts(vocab)
            .orderBy(
                F.desc("n_pair"), F.asc("left"), F.asc("right")
            )
            .limit(limit)
            .collect()
        )
        rounds += 1
        if not rows or rows[0]["n_pair"] < min_pair_count:
            break
        if k > 1:
            learned = {m[3] for m in merges}
            select = _select_safe_batch if exact else _select_skip_batch
            batch = select(rows, k, min_pair_count, learned)
        else:
            batch = []
        if not batch:
            # no safe prefix (or single-merge mode): the exact
            # sequential step
            r = rows[0]
            batch = [(r["left"], r["right"], int(r["n_pair"]))]
        syms = F.col("syms")
        for left, right, n_pair in batch:
            merges.append(
                (len(merges) + 1, left, right, left + right, n_pair)
            )
            syms = _merge_expr(syms, left, right)
        vocab = vocab.withColumn("syms", syms).localCheckpoint(eager=True)

    LAST_TRAIN_ROUNDS = rounds
    return spark.createDataFrame(
        merges, "rank int, left string, right string, token string, n_pair bigint"
    )


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list to a corpus: (id, tokens array).
    Folds the merges in rank order — same pure-codegen merge fold, so
    segmentation needs no UDF and no broadcast beyond the literal merge
    list baked into the plan (bounded by vocabulary size)."""
    out = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias(
            "pos", "word"
        ),
    ).filter(F.col("word") != "")
    out = out.withColumn("syms", F.split("word", ""))
    for left, right in merges:
        out = _apply_merge(out, left, right)
    # reassemble in word order (collect_list order is not guaranteed
    # after a shuffle — sort by the original position)
    return out.groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "syms"))),
                lambda s: s["syms"],
            )
        ).alias("tokens")
    )
