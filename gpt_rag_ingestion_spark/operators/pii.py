"""PII redaction — beyond-reference, corpus-hygiene family.

Before text reaches a training corpus, emails / phone numbers / URLs
are masked or removed (the C4/RefinedWeb-style cleanup step).  At
100 TB this must be a narrow JVM-side map — one ``regexp_replace``
chain evaluated inside whole-stage codegen next to the scan, never a
Python UDF (a per-row Python hop on 100 TB of text is the difference
between hours and weeks).

Patterns deliberately use explicit character classes (no ``\\S`` / ``\\w``
shorthands) so Java's regex engine (Spark) and RE2 (DuckDB, used by the
oracle) match identically.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
URL_RE = "https?://[A-Za-z0-9./_-]+"
PHONE_RE = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"

# scrub order matters: URLs first (a URL may embed an email-like
# userinfo part), then emails, then phones
PATTERNS: list[tuple[str, str, str]] = [
    ("url", URL_RE, "<URL>"),
    ("email", EMAIL_RE, "<EMAIL>"),
    ("phone", PHONE_RE, "<PHONE>"),
]


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0))).cast("int")


def scrub_pii(
    df: DataFrame, text_col: str, out_col: str | None = None
) -> DataFrame:
    """Mask PII spans in ``text_col`` and attach per-kind redaction
    counts (``n_url``, ``n_email``, ``n_phone``) — the counts are taken
    BEFORE masking, on the original text, so they report what was
    found even when replacement tokens overlap later patterns."""
    out = out_col or text_col
    scrubbed = F.col(text_col)
    counts = []
    for name, pattern, token in PATTERNS:
        counts.append(_count(F.col(text_col), pattern).alias(f"n_{name}"))
        scrubbed = F.regexp_replace(scrubbed, pattern, token)
    return df.select("*", *counts).withColumn(out, scrubbed)


def k_anonymity_audit(
    df: DataFrame, qi_cols: list[str], k: int = 5
) -> DataFrame:
    """K-ANONYMITY audit over a quasi-identifier (QI) column set — the
    governance gate a training corpus runs before release: a row is
    k-anonymous iff at least ``k`` rows share its exact QI
    combination, so small groups are re-identification risks and must
    be suppressed or generalized.

    Returns one row PER QI GROUP: the QI values, ``group_n``, and
    ``meets_k`` — the caller either anti-joins the failing groups out
    (suppression) or coarsens a QI column and re-audits
    (generalization).  Cost: one grouped count on the QI key — the
    same single-shuffle shape as exact dedup; no row-level output, so
    the result is |distinct QI| rows regardless of corpus size."""
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("group_n"),
        (F.count(F.lit(1)) >= int(k)).alias("meets_k"),
    )


def k_anonymity_suppress(
    df: DataFrame, qi_cols: list[str], k: int = 5
) -> DataFrame:
    """Drop every row whose QI group is smaller than ``k`` (the
    suppression arm of the audit).  A window count would shuffle the
    full rows; instead the failing-group KEY SET (small by
    construction — each failing group has < k rows) broadcasts into a
    LEFT ANTI join, so the corpus passes through one hash join with
    no row-level shuffle."""
    failing = (
        df.groupBy(*qi_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") < int(k))
        .select(*qi_cols)
    )
    return df.join(F.broadcast(failing), on=qi_cols, how="left_anti")


#: SQL words the drop-list tokenizer never treats as column refs
#: (keywords + literal words common in generalization ladders)
_SQL_WORDS = frozenset({
    "and", "as", "asc", "between", "by", "case", "cast", "desc",
    "distinct", "div", "else", "end", "false", "from", "group", "if",
    "ilike", "in", "int", "integer", "interval", "is", "like", "not",
    "null", "or", "order", "over", "rlike", "select", "string", "then",
    "true", "when", "where", "bigint", "double", "float", "boolean",
    "date", "timestamp", "decimal", "varchar",
})


def k_anonymity_generalize(
    df: DataFrame,
    qi: dict[str, list[str]],
    k: int = 5,
    drop: list[str] | None = None,
) -> tuple[DataFrame, dict]:
    """GENERALIZATION ladder — the other arm of k-anonymity (suppression
    destroys rows; generalization coarsens them): ``qi`` maps each
    output QI column to an ordered list of SQL expressions over the
    input, coarser at higher levels (e.g. ``{"region": ["city",
    "state", "country"], "age_b": ["age", "age div 10 * 10",
    "age div 25 * 25"]}``).  Levels advance in LOCKSTEP (global
    recoding, the standard full-domain model): the smallest level
    whose under-k row count stops improving — or hits zero — wins,
    and any still-failing rows are suppressed.

    Returns ``(released_df, report)``: the released rows carry the
    chosen level's QI columns plus the non-QI input columns — the RAW
    quasi-identifier source columns (every input column referenced by
    any ladder expression, or the explicit ``drop`` list when given)
    are REMOVED, because a frame that still carries raw ``city``/
    ``age`` next to their generalizations is not k-anonymous with
    respect to its own columns.  ``report`` = {"level": L,
    "suppressed_rows": n, "released_rows": m, "dropped_cols": [...]}.
    Cost: one grouped count per level tried (≤ max ladder height, a
    handful) + one suppression anti-join — every pass is the
    exact-dedup shuffle shape, never a row-level sort."""
    if not qi or any(not lvls for lvls in qi.values()):
        raise ValueError("qi must map each column to >= 1 expression")
    max_level = max(len(v) for v in qi.values())
    if drop is None:
        # every input column referenced by ANY ladder expression is a
        # raw quasi-identifier and must not ship in the release.
        # Tokenization excludes (r8 advisor): string LITERALS (THEN
        # 'metro' must not drop a column named metro), tokens followed
        # by '(' (function names), and common SQL keywords — a bare
        # identifier regex alone would silently drop any unrelated
        # input column sharing such a name.  Genuinely ambiguous
        # ladders (a column named like a keyword) should pass an
        # explicit ``drop`` list.
        pat = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
        refs: set[str] = set()
        for lvls in qi.values():
            for e in lvls:
                cleaned = re.sub(r"'(?:[^']|'')*'", " ", e)
                for m in pat.finditer(cleaned):
                    tok = m.group(0)
                    if cleaned[m.end():].lstrip().startswith("("):
                        continue  # function call, not a column ref
                    if tok.lower() in _SQL_WORDS:
                        continue
                    refs.add(tok)
        drop = [c for c in df.columns if c in refs]
    drop_set = set(drop)

    def _select(level: int) -> DataFrame:
        exprs = [
            F.expr(lvls[min(level, len(lvls) - 1)]).alias(c)
            for c, lvls in qi.items()
        ]
        others = [
            F.col(c) for c in df.columns
            if c not in drop_set and c not in qi
        ]
        return df.select(*others, *exprs)

    def _violating(g: DataFrame) -> int:
        out = (
            g.groupBy(*qi.keys())
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") < int(k))
            .agg(F.coalesce(F.sum("_n"), F.lit(0)))
            .first()[0]
        )
        return int(out)

    chosen, best_bad = 0, None
    for level in range(max_level):
        bad = _violating(_select(level))
        if best_bad is None or bad < best_bad:
            chosen, best_bad = level, bad
        if bad == 0:
            break
    released = k_anonymity_suppress(
        _select(chosen), list(qi.keys()), k=k
    )
    n_released = released.count()
    return released, {
        "level": chosen,
        "suppressed_rows": int(best_bad),
        "released_rows": int(n_released),
        "dropped_cols": sorted(drop_set),
    }


#: A candidate PAN is a MAXIMAL digit run of length exactly 16 (r8
#: advisor: a bare '[0-9]{16}' matched the first 16 digits of any
#: 17+-digit run — long order ids, digit-rendered hashes — and the
#: masking fold then mangled that prefix everywhere it occurred).
#: Extraction scans maximal runs and keeps the 16-long ones — the
#: engine-portable equivalent of '(?<![0-9])[0-9]{16}(?![0-9])'
#: (DuckDB's RE2 has no lookaround, so the oracle replicates the
#: run-length form verbatim).
DIGIT_RUN_RE = "[0-9]+"


def _luhn_sql(s: str) -> str:
    """SQL boolean: does the 16-digit string expression ``s`` pass the
    Luhn mod-10 checksum?  Doubling every second digit from the RIGHT,
    folding >9 back by -9 — pure integer arithmetic, identical in
    Spark and DuckDB."""
    d = f"CAST(substr({s}, 17 - i, 1) AS INT)"
    return (
        "aggregate(sequence(1, 16), 0, (acc, i) -> acc + "
        f"CASE WHEN i % 2 = 0 THEN IF({d} * 2 > 9, {d} * 2 - 9, {d} * 2) "
        f"ELSE {d} END) % 10 = 0"
    )


def scrub_card_numbers(
    df: DataFrame, text_col: str, out_col: str | None = None
) -> DataFrame:
    """Credit-card scrubbing with CHECKSUM-VERIFIED candidates — the
    false-positive control real PII scrubbers use: a MAXIMAL digit
    run of length exactly 16 is masked ONLY if it passes the Luhn
    mod-10 test, so order numbers and hashes that merely look like
    PANs survive — including 17+-digit runs whose 16-digit prefix
    happens to checksum (r8 advisor).  Masking rebuilds the text from
    its digit-run / separator decomposition, so only whole
    digit-boundary-delimited runs are ever replaced — a valid PAN
    appearing as a SUBSTRING of a longer run elsewhere is left alone.
    Adds ``n_card_candidates`` (16-long runs) and ``n_luhn_valid``
    (masked) counters.

    Scale shape: regexp_extract_all + split + filter()/aggregate()
    higher-order lambdas — all JVM codegen, no shuffle, no Python,
    like the rest of this module's scrub chain."""
    out = out_col or text_col
    runs_c, seps_c, valid_c = "__pii_runs", "__pii_seps", "__pii_valid"
    cands = f"filter({runs_c}, s -> length(s) = 16)"
    rebuilt = (
        f"IF(size({runs_c}) = 0, element_at({seps_c}, 1), "
        f"aggregate(sequence(1, size({runs_c})), "
        f"element_at({seps_c}, 1), "
        f"(acc, i) -> concat(acc, "
        f"IF(array_contains({valid_c}, element_at({runs_c}, i)), "
        f"'<CARD>', element_at({runs_c}, i)), "
        f"element_at({seps_c}, i + 1))))"
    )
    return (
        df.withColumn(
            runs_c,
            F.expr(f"regexp_extract_all({text_col}, '{DIGIT_RUN_RE}', 0)"),
        )
        .withColumn(seps_c, F.expr(f"split({text_col}, '{DIGIT_RUN_RE}', -1)"))
        .withColumn(valid_c, F.expr(f"filter({cands}, s -> {_luhn_sql('s')})"))
        .withColumn("n_card_candidates", F.expr(f"size({cands})").cast("int"))
        .withColumn("n_luhn_valid", F.expr(f"size({valid_c})").cast("int"))
        .withColumn(out, F.expr(rebuilt))
        .drop(runs_c, seps_c, valid_c)
    )
