"""Text-analysis operators for training-data pipelines (beyond-reference).

All pure column expressions (codegen'd, shuffle-free narrow maps):
- token counting (whitespace + BPE-ish regex),
- quality scoring (length / punctuation / stopword ratios),
- language ID (stopword-vote n-gram heuristic),
- document fingerprinting (md5 of whitespace-normalized text).

Every function returns integer or exactly-derived values so results are
oracle-checkable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gpt_rag_ingestion_spark.functions.tokens import TOKEN_REGEX

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "no", "por"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "les"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "den"],
}


def _tokens(col: Column) -> Column:
    return F.filter(F.split(col, "\\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(_tokens(c))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish unit count (word pieces + punctuation)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), 0))


def stopword_count(col: Column | str, lang: str = "en") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(
        F.filter(_tokens(F.lower(c)), lambda t: F.array_contains(words, t))
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_chars/n_tokens/n_punct/stopword_ratio/avg_token_len —
    ingredients of standard quality filters (C4-style heuristics).

    Spreads a small unsplittable input across cores first (the per-row
    regex/token work otherwise runs inside the one scan task a
    single-row-group file produces — guide §2.5); no-op at scale."""
    from gpt_rag_ingestion_spark.session import spread_small_input

    df = spread_small_input(df)
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, "[!-/:-@\\[-`{-~]", ""))
    n_stop = stopword_count(c)
    return (
        df.withColumn("n_chars_calc", n_chars.cast("long"))
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("n_punct", n_punct.cast("long"))
        .withColumn("n_stopwords", n_stop.cast("long"))
        .withColumn(
            "stopword_ratio",
            F.round(F.col("n_stopwords") / F.greatest(F.col("n_tokens"), F.lit(1)), 6),
        )
        .withColumn(
            "avg_token_len",
            F.round(F.col("n_chars_calc") / F.greatest(F.col("n_tokens"), F.lit(1)), 6),
        )
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: count stopword hits per language, pick the
    argmax (ties -> lexicographically first language code).

    Spread first (guide §2.5): the per-language stopword scans are the
    heaviest narrow expression in the text family, and a single-row-
    group input would run them all on one core; no-op at scale."""
    from gpt_rag_ingestion_spark.session import spread_small_input

    df = spread_small_input(df)
    c = F.lower(F.col(text_col))
    toks = _tokens(c)
    scores = []
    for lang in sorted(STOPWORDS):
        words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        score = F.size(F.filter(toks, lambda t: F.array_contains(words, t)))
        # sort ascending on (-score, lang): element 0 = max score, ties
        # resolved to the alphabetically-first language code
        scores.append(F.struct((-score).alias("neg"), F.lit(lang).alias("lang")))
    best = F.array_sort(F.array(*scores))[0]
    pred = F.when(best["neg"] < 0, best["lang"]).otherwise(F.lit("unknown"))
    return df.withColumn("pred_lang", pred)


ROLLING_BASE = 1_000_003
ROLLING_MOD = (1 << 31) - 1  # Mersenne prime 2^31-1


def rolling_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 2048,
) -> DataFrame:
    """Order-sensitive polynomial rolling hash over tokens:
    ``h = Σ val(tok_i) * B^i  mod M`` with val = first 4 md5 bytes.

    Unlike the bag-of-words md5 fingerprint, token ORDER matters — two
    documents with the same words in different order get different
    prints.  Entirely relational and exact-integer: per-term products
    stay < 2^63 and per-term residues < 2^31, so any summation order
    gives the same result (oracle-checkable).

    One higher-order array aggregate per row carries ``(hash, B^i)``
    incrementally — the power B^i is folded alongside the hash, so no
    power lookup table is needed and the whole fingerprint is a narrow
    zero-shuffle map (the pre-r12 shape was posexplode + broadcast
    power-table join + groupBy: two Exchanges and a token-row blowup
    for a strictly per-document value).  Exactness is unchanged: the
    accumulator reduces mod M each step, the old form reduced once at
    the end — same residue class, and both end < M.  Docs with zero
    tokens (or NULL text) are dropped, matching the explode form and
    the oracle's unnest-over-empty-range."""
    from gpt_rag_ingestion_spark.session import spread_small_input

    # per-token md5 is the heavy narrow work; spread an unsplittable
    # single-file input across cores first (§2.5 — no-op at scale).
    # Measured at sf0.1 (interleaved A/B medians): explode form 1.09 s
    # -> aggregate form 0.63 s -> aggregate + spread 0.41 s.
    df = spread_small_input(df, by=id_col)
    toks = F.slice(
        F.filter(F.split(F.col(text_col), "\\s+"), lambda t: t != ""),
        1,
        max_tokens,
    )

    def step(acc, tok):
        val = (
            F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
            % ROLLING_MOD
        )
        return F.struct(
            ((acc["h"] + val * acc["p"] % ROLLING_MOD) % ROLLING_MOD).alias(
                "h"
            ),
            ((acc["p"] * ROLLING_BASE) % ROLLING_MOD).alias("p"),
        )

    fp = F.aggregate(
        F.col("_toks"),
        F.struct(
            F.lit(0).cast("long").alias("h"), F.lit(1).cast("long").alias("p")
        ),
        step,
        lambda acc: acc["h"],
    )
    return (
        df.select(F.col(id_col), toks.alias("_toks"))
        .filter(F.size("_toks") > 0)
        .select(F.col(id_col), fp.alias("rolling_fp"))
    )


def fingerprint(col: Column | str) -> Column:
    """md5 of whitespace-normalized lowercase text — the exact-dup key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.trim(F.regexp_replace(F.lower(c), "\\s+", " ")))


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by term-frequency ×
    inverse-document-frequency — the classic corpus-profiling operator
    (keyword extraction, topic hints, boilerplate detection).

    Output: (id, rank, token, tf, df, score_q).

    Determinism: ``score_q = (tf * 1_000_000) div df`` — a linear-idf
    surrogate that keeps every comparison in exact integer arithmetic so
    rankings reproduce bit-identically across engines (ln-idf ranks by
    a float whose last ulp differs between libms).  A production
    deployment swaps in a precomputed ln-idf dimension (a |vocab|-row
    broadcast join — same plan shape, same shuffles).  Total tie-break:
    (score desc, tf desc, token asc).

    Scale: tokenize is a narrow map; the tf groupBy shuffles
    (doc_id, token) pairs; the df aggregate reduces to |vocab| rows and
    joins back broadcast; the final top-k is one window over ≤|doc
    terms| rows.  Two shuffles total on compact keys, no text after
    tokenization.
    """
    from pyspark.sql import Window

    from gpt_rag_ingestion_spark.operators.dedup import tokenize

    toks = tokenize(df, text_col, id_col).select(id_col, "token")
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(dfreq), on="token").withColumn(
        "score_q", F.expr("tf * 1000000 div df")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score_q"), F.desc("tf"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col, F.col("rank").cast("int").alias("rank"),
            "token", "tf", "df", "score_q",
        )
    )


#: Gopher-style repetition/quality rule bounds (Rae et al. 2021, table A1
#: simplified to the deterministic-integer subset)
QF_MIN_WORDS = 5
QF_MAX_WORDS = 10_000
QF_MIN_MEAN_WORD_LEN_Q = 3_000   # 3.0 chars, ×1000
QF_MAX_MEAN_WORD_LEN_Q = 10_000  # 10.0 chars, ×1000
QF_MAX_SYMBOL_RATIO_Q = 100_000  # 10%, ×1e6


def quality_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style keep/drop document filter with per-rule reasons —
    the decision layer LLM-corpus pipelines run after feature
    extraction (word-count bounds, mean-word-length bounds, symbol
    ratio, must-contain-a-stopword).

    All ratios are integer-quantized (x1000 / x1e6 with integer
    division), so keep/drop decisions reproduce bit-identically across
    engines — an audit requirement when a filter decides what enters a
    training corpus.  Pure column algebra: narrow map, no shuffle, no
    Python.
    """
    c = F.col(text_col)
    words = F.filter(F.split(c, "\\s+"), lambda w: w != F.lit(""))
    n_words = F.size(words).cast("long")
    sum_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_symbols = F.length(F.regexp_replace(c, "[A-Za-z0-9\\s]", "")).cast("long")
    staged = df.select(
        "*",
        n_words.alias("n_words"),
        sum_len.alias("_sum_len"),
        n_symbols.alias("_n_symbols"),
        F.length(c).cast("long").alias("_n_chars"),
        (stopword_count(c) > 0).alias("has_stopword"),
    )
    return (
        staged.withColumn(
            "mean_word_len_q",
            F.when(
                F.col("n_words") > 0, F.expr("_sum_len * 1000 div n_words")
            ).otherwise(F.lit(0)).cast("long"),
        )
        .withColumn(
            "symbol_ratio_q",
            F.when(
                F.col("_n_chars") > 0,
                F.expr("_n_symbols * 1000000 div _n_chars"),
            ).otherwise(F.lit(0)).cast("long"),
        )
        .withColumn(
            "reason",
            F.when(F.col("n_words") < QF_MIN_WORDS, "too_few_words")
            .when(F.col("n_words") > QF_MAX_WORDS, "too_many_words")
            .when(F.col("mean_word_len_q") < QF_MIN_MEAN_WORD_LEN_Q, "short_words")
            .when(F.col("mean_word_len_q") > QF_MAX_MEAN_WORD_LEN_Q, "long_words")
            .when(F.col("symbol_ratio_q") > QF_MAX_SYMBOL_RATIO_Q, "symbol_heavy")
            .when(~F.col("has_stopword"), "no_stopwords")
            .otherwise("ok"),
        )
        .withColumn("keep", F.col("reason") == "ok")
        .drop("_sum_len", "_n_symbols", "_n_chars")
    )


# Gopher-style repetition thresholds, expressed as integer
# cross-multiplications (count-based analogs of the paper's
# fraction-of-characters rules — no float division anywhere):
#   top 2-gram covers > 1/10 of words   -> repetitive
#   top 3-gram covers > 1/15 of words   -> repetitive
#   duplicate words   > 1/2 of words    -> repetitive
REP_TOP2_DEN = 10
REP_TOP3_DEN = 15
REP_DUPWORD_DEN = 2


def _ngram_array(toks: Column, n: int) -> Column:
    """Word n-grams of a token array as a narrow array transform
    (no explode, no shuffle)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _max_multiplicity(arr: Column) -> Column:
    """max occurrences of any single element in ``arr`` — computed as
    the longest run in the sorted array via a codegen'd aggregate fold,
    so per-document mode statistics never leave the row (zero shuffle,
    in contrast to the explode+groupBy formulation the SQL oracle
    uses — both give identical counts)."""
    run_next = lambda acc, x: F.when(x == acc["prev"], acc["run"] + 1).otherwise(
        F.lit(1)
    )
    return F.aggregate(
        F.array_sort(arr),
        F.struct(
            F.lit("\x00").alias("prev"),
            F.lit(0).cast("int").alias("run"),
            F.lit(0).cast("int").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run_next(acc, x).cast("int").alias("run"),
            F.greatest(acc["best"], run_next(acc, x)).cast("int").alias("best"),
        ),
        lambda acc: acc["best"],
    )


def repetition_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1), exact
    integers only:

    - ``n_words`` / ``n_distinct_words`` — duplicate-word mass,
    - ``top2_count`` / ``top3_count`` — multiplicity of the most common
      word 2-/3-gram,
    - ``repetitive`` — the drop decision via integer cross-multiply.

    100 TB design: the whole operator is a narrow per-row projection
    (array transforms + an aggregate fold over the sorted n-gram
    array); cost is O(tokens log tokens) per document with NO shuffle,
    so it composes into any scan without a stage break.  The SQL-oracle
    formulation (explode + two groupBys) is the shuffle-heavy
    equivalent Spark would produce naively."""
    toks = _tokens(F.col(text_col))
    staged = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_words"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_words"),
        _max_multiplicity(_ngram_array(toks, 2)).cast("long").alias("top2_count"),
        _max_multiplicity(_ngram_array(toks, 3)).cast("long").alias("top3_count"),
    )
    return staged.withColumn(
        "repetitive",
        # a gram must actually repeat (count >= 2) before its mass can
        # trip the threshold — otherwise every short doc's unique top
        # gram "covers" a large fraction by arithmetic accident
        (
            (F.col("top2_count") >= 2)
            & (F.col("top2_count") * REP_TOP2_DEN > F.col("n_words"))
        )
        | (
            (F.col("top3_count") >= 2)
            & (F.col("top3_count") * REP_TOP3_DEN > F.col("n_words"))
        )
        | (
            (F.col("n_words") - F.col("n_distinct_words")) * REP_DUPWORD_DEN
            > F.col("n_words")
        ),
    )


def corpus_frequency_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_threshold: int = 3,
) -> DataFrame:
    """Unigram corpus-frequency scoring — the exact-integer analog of
    KenLM-style LM quality scoring used in corpus filtering (CCNet
    et al.): documents dominated by corpus-rare tokens are candidate
    noise; documents of only ultra-common tokens are candidate
    boilerplate.

    Two-pass: (1) corpus-wide token frequencies (one groupBy on the
    token), (2) per-doc join + aggregate.  Output: ``n_tokens``,
    ``n_rare`` (tokens with corpus count < ``rare_threshold``),
    ``sum_freq`` (Σ corpus counts — the exact-integer surrogate for
    Σ log p the floating-point LM would give), ``mean_freq_q``
    (= sum_freq*1000 div n_tokens).

    100 TB design: the frequency pass shuffles (8-byte token hash,
    count) pairs; the probe pass re-joins per-token.  The frequency
    table is |vocab| rows — broadcast it when it fits (natural-language
    vocab does), else it is a plain shuffle join on the hash.  For
    web-scale open vocab, production keeps top-K tokens and buckets the
    tail as "rare" — same plan, one extra filter."""
    toks = df.select(
        F.col(id_col),
        F.explode(_tokens(F.col(text_col))).alias("token"),
    ).select(F.col(id_col), F.xxhash64("token").alias("th"))
    freq = toks.groupBy("th").agg(F.count(F.lit(1)).alias("n_occ"))
    per_doc = (
        toks.join(freq, on="th")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("n_occ") < rare_threshold, 1).otherwise(0)).alias(
                "n_rare"
            ),
            F.sum("n_occ").alias("sum_freq"),
        )
    )
    base = df.select(F.col(id_col))
    return (
        base.join(per_doc, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_rare", F.lit(0)).cast("long").alias("n_rare"),
            F.coalesce("sum_freq", F.lit(0)).cast("long").alias("sum_freq"),
        )
        .withColumn(
            "mean_freq_q",
            F.when(
                F.col("n_tokens") > 0,
                F.expr("sum_freq * 1000 div n_tokens"),
            ).otherwise(F.lit(0)).cast("long"),
        )
    )


def collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` adjacent-word collocations by quantized LIFT —
    freq(ab)·N / (freq(a)·freq(b)) in 1e-4 units, the same ordering
    as PMI without a logarithm, so the score is exact integer
    arithmetic (oracle-checkable) at any scale.

    Corpus use: multiword-expression discovery ("new york",
    "machine learning") for tokenizer vocab seeding and quality
    signals.  Plan: one token pass builds unigram counts, one zipped
    slice pass builds adjacent-bigram counts (both narrow maps +
    compact-key aggregations), two broadcast joins attach unigram
    counts, TakeOrdered picks the top k."""
    from gpt_rag_ingestion_spark.operators.ranking import global_top_k

    arr = df.select(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
        ).alias("a")
    )
    toks = arr.select(F.explode("a").alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    n = F.size("a")
    pair_arr = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.struct(
                F.element_at(F.col("a"), i + 1).alias("w"),
                F.element_at(F.col("a"), i + 2).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w:string,w2:string>>"))
    bi = (
        arr.select(F.explode(pair_arr).alias("p"))
        .select("p.w", "p.w2")
        .groupBy("w", "w2")
        .agg(F.count(F.lit(1)).alias("f_ab"))
        .filter(F.col("f_ab") >= min_count)
    )
    scored = (
        bi.join(F.broadcast(uni.withColumnRenamed("f", "f_a")), on="w")
        .join(
            F.broadcast(
                uni.select(F.col("w").alias("w2"), F.col("f").alias("f_b"))
            ),
            on="w2",
        )
        .crossJoin(F.broadcast(total))
        .selectExpr(
            "w AS word_a",
            "w2 AS word_b",
            "f_ab",
            "(f_ab * n_total * 10000) div (f_a * f_b) AS lift_q",
        )
    )
    return global_top_k(
        scored,
        [F.desc("lift_q"), F.desc("f_ab"), F.asc("word_a"), F.asc("word_b")],
        k,
        rank_col="rank",
    )


def char_collision_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document character diversity via the Simpson collision
    index: p = Σ c_i(c_i−1) / (n(n−1)) — the probability two random
    characters are equal.  Low-entropy gibberish (padding runs, key
    mashing, binary-as-text) collides far above natural language, so
    this is the log-free ENTROPY filter of the FineWeb-style quality
    family: exact integer numerator/denominator (hash-matchable in any
    engine) plus the rounded ratio.

    100 TB shape: a narrow per-row fold over the sorted char array
    (the ``_max_multiplicity`` pattern) — zero shuffle, composes into
    any scan.  The SQL-oracle formulation is the explode+groupBy
    equivalent."""
    chars = F.filter(F.split(F.col(text_col), ""), lambda c: c != "")
    fold = F.aggregate(
        F.array_sort(chars),
        F.struct(
            F.lit("\x00").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("coll"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            (
                acc["coll"]
                + F.when(x == acc["prev"], acc["run"] * 2).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("coll"),
        ),
        # Σ c(c-1) accumulated incrementally: extending a run from
        # length r to r+1 adds (r+1)r - r(r-1) = 2r collisions
        lambda acc: acc["coll"],
    )
    n = F.size(chars).cast("long")
    return df.select(
        F.col(id_col),
        n.alias("n_chars"),
        fold.alias("collisions"),
        (n * (n - 1)).alias("pairs"),
        F.when(n >= 2, F.round(fold / (n * (n - 1)), 6)).alias(
            "collision_index"
        ),
    )


def compression_ratio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """zlib compressibility per document — the classic boilerplate /
    gibberish detector (highly repetitive text compresses far below
    natural language; random noise barely compresses).  Arrow-batched
    pandas UDF over stdlib zlib; deterministic for a given zlib, but
    NOT cross-engine oracle-able (no zlib in SQL) — unit-pinned by
    range instead."""
    import pandas as pd  # noqa: F401 (annotation namespace)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(texts):
        # type: (pd.Series) -> pd.Series
        import zlib

        def one(t):
            if not t:
                return None
            raw = t.encode("utf-8")
            return round(len(zlib.compress(raw, level)) / len(raw), 6)

        return texts.map(one)

    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        _ratio(F.col(text_col)).alias("zlib_ratio"),
    )


def dedup_lines_within_doc(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """INTRA-document line dedup (the RefinedWeb/CCNet per-document
    step, distinct from corpus-wide span removal): within each
    document, keep only the FIRST occurrence of every exact line and
    reassemble in original order.  Boilerplate (repeated headers,
    navigation, chorus lines) collapses without any cross-document
    state — the whole pass is posexplode → per-(doc, line) min-pos →
    ordered re-aggregation, shuffling (doc, line-hash, pos) triples
    only; at 100 TB this is one partial-aggregated shuffle bounded by
    line count, no corpus-wide table.

    Returns (id_col, text, n_lines, n_removed)."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    firsts = lines.groupBy(id_col, "line").agg(
        F.min("pos").alias("pos"), F.count(F.lit(1)).alias("_n")
    )
    return firsts.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias(text_col),
        F.sum("_n").cast("long").alias("n_lines"),
        (F.sum("_n") - F.count(F.lit(1))).cast("long").alias("n_removed"),
    )


def dedup_sentences_global(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep_re: str = r"\. ",
    joiner: str = ". ",
) -> DataFrame:
    """CROSS-document sentence-level exact dedup, keep-FIRST-global
    (the C4/RefinedWeb corpus-wide variant of
    ``dedup_lines_within_doc``): a sentence occurring in many
    documents survives only at its first occurrence — ordered by
    (``id_col``, position) — and every later document is reassembled
    without it.  This is the line-grain complement to document-level
    MinHash (dedup.py): boilerplate sentences shared across millions
    of pages never make it into training text.

    Scale shape: posexplode → ONE hash shuffle keyed by the sentence
    string with a SENTENCE-partitioned window picking the first
    (id, pos) — never an unpartitioned window, and no join back (the
    flag rides the same shuffle).  A corpus-wide duplicate's group is
    bounded by its duplicate count — the q212 line-group skew
    envelope.  Then one re-aggregation per document.

    Returns (id_col, text, n_sentences, n_kept)."""
    from pyspark.sql import Window

    sent = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep_re)).alias("pos", "__s"),
    ).filter(F.length("__s") > 0)
    w = Window.partitionBy("__s").orderBy(F.col(id_col), F.col("pos"))
    kept = sent.withColumn("__keep", F.row_number().over(w) == 1)
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("__keep"), F.struct("pos", "__s"))
                    )
                ),
                lambda s: s["__s"],
            ),
            joiner,
        ).alias(text_col),
        F.count(F.lit(1)).cast("long").alias("n_sentences"),
        F.sum(F.col("__keep").cast("long")).cast("long").alias("n_kept"),
    )


def strip_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    min_chars: int = 30,
    min_alpha_pct: int = 55,
) -> DataFrame:
    """LINE-LEVEL boilerplate removal — the jusText/C4-style cleanup
    between raw extraction and quality scoring: navigation menus,
    button rows, copyright footers and ASCII separators are SHORT or
    SYMBOL-HEAVY lines, so a line survives iff it has at least
    ``min_chars`` characters AND letters+spaces make up at least
    ``min_alpha_pct`` percent of it (integer percent — exact in any
    engine).  Adds ``n_lines`` / ``n_kept`` counters for the corpus
    report.

    Scale shape: one ``split -> filter(lambda) -> array_join`` chain of
    JVM higher-order functions inside whole-stage codegen — no
    shuffle, no Python, which is the only acceptable cost for a pass
    that touches every byte of a 100 TB corpus."""
    out = out_col or text_col
    keep = (
        f"x -> length(x) >= {int(min_chars)} AND "
        f"length(regexp_replace(x, '[^A-Za-z ]', '')) * 100 >= "
        f"{int(min_alpha_pct)} * length(x)"
    )
    lines = f"split({text_col}, '\\n')"
    kept = f"filter({lines}, {keep})"
    return df.select(
        "*",
        F.expr(f"size({lines})").cast("long").alias("n_lines"),
        F.expr(f"size({kept})").cast("long").alias("n_kept"),
    ).withColumn(out, F.expr(f"array_join({kept}, '\\n')"))
