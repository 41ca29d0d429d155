"""End-to-end corpus curation funnel — beyond-reference composition.

Real training-data pipelines are not single operators but a FUNNEL:
quality gate → language gate → exact dedup → per-source cap, where
each stage sees only the survivors of the previous one and every
dropped document keeps an auditable disposition (which stage removed
it, and why).  This module composes the repo's existing primitives
(operators/text_analysis.quality_filter, language_id) into that funnel
as ONE logical plan.

Plan shape — deliberately not a chain of filters + unions (which would
rescan the corpus per stage): stage decisions are expressed as
*conditional window aggregates* so the whole funnel is a narrow map
plus exactly two exchanges:

1. ``min(CASE WHEN survivor THEN id END) OVER (PARTITION BY digest)``
   picks the canonical copy among quality+language survivors — one
   shuffle on the 32-hex digest, never on text;
2. a running ``count(CASE WHEN canonical THEN 1 END)`` over the
   per-source hash order implements the mixture cap as a conditional
   rank — one shuffle on source.

At 100 TB both exchanges carry (digest|source, id)-sized rows.  The
funnel emits one row per input document; `.filter(kept)` is the
corpus, the rest is the audit trail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gpt_rag_ingestion_spark.operators.text_analysis import (
    language_id,
    quality_filter,
)


def curation_funnel(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    keep_langs: tuple[str, ...] = ("en",),
    cap_per_source: int = 15,
    salt: str = "cur-v1",
) -> DataFrame:
    """Disposition every document: kept, or dropped at the first
    failing stage (``quality_<reason>`` / ``language`` / ``duplicate``
    / ``cap``).  Duplicate = non-minimal id within the normalized-text
    md5 group of survivors; cap = beyond ``cap_per_source`` in
    deterministic md5(salt||id) order among canonical survivors."""
    staged = language_id(quality_filter(docs, text_col), text_col)
    digest = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))
    )
    lang_ok = F.col("pred_lang").isin(*keep_langs)
    survivor = F.col("keep") & lang_ok

    staged = staged.withColumn("digest", digest).withColumn(
        "_survivor", survivor
    )
    w_dup = Window.partitionBy("digest")
    staged = staged.withColumn(
        "_canon_id",
        F.min(F.when(F.col("_survivor"), F.col(id_col))).over(w_dup),
    )
    canonical = F.col("_survivor") & (F.col(id_col) == F.col("_canon_id"))
    staged = staged.withColumn("_canonical", canonical)

    # conditional rank: qualifying rows up to and including this one in
    # the per-source deterministic hash order
    w_cap = (
        Window.partitionBy(source_col)
        .orderBy(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
            F.col(id_col),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = staged.withColumn(
        "_cap_rank",
        F.count(F.when(F.col("_canonical"), F.lit(1))).over(w_cap),
    )

    stage = (
        F.when(~F.col("keep"), F.concat(F.lit("quality_"), F.col("reason")))
        .when(~lang_ok, F.lit("language"))
        .when(~F.col("_canonical"), F.lit("duplicate"))
        .when(F.col("_cap_rank") > cap_per_source, F.lit("cap"))
        .otherwise(F.lit("kept"))
    )
    return staged.withColumn("stage", stage).withColumn(
        "kept", F.col("stage") == "kept"
    ).drop("_survivor", "_canon_id", "_canonical", "_cap_rank")
