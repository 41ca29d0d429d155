"""Training-corpus construction job — the beyond-reference flagship
composition: raw documents → audited curation funnel → token counting
→ sized training shards, as one pipeline of the repo's primitives.

This is the LLM-data analog of the reference's ingest lifecycle
(scan → filter → chunk → upsert): every document either lands in a
shard or carries an auditable disposition saying which gate dropped
it.

Plan shape: the funnel is a narrow map + two compact exchanges
(`operators/curation.py`); token counting is pure codegen; shard
assignment is the distributed prefix sum; the write is one hash
shuffle on shard id.  Nothing corpus-sized touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpt_rag_ingestion_spark.operators.curation import curation_funnel
from gpt_rag_ingestion_spark.operators.shards import write_training_shards
from gpt_rag_ingestion_spark.operators.text_analysis import bpe_ish_token_count


def run_training_corpus_job(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    target_tokens_per_shard: int = 50_000,
    keep_langs: tuple[str, ...] = ("en",),
    cap_per_source: int = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    epoch_weights: dict[str, float] | None = None,
    fmt: str = "parquet",
) -> tuple[DataFrame, int]:
    """Returns (audit, n_shards): ``audit`` is the per-stage
    disposition count relation (sums to the input row count); the
    kept corpus is written to ``out_dir`` as one file per
    ~``target_tokens_per_shard``-token shard (``fmt``: parquet or
    jsonl), each carrying (id, source, text, n_tokens, shard_id).

    ``epoch_weights`` (source → epochs, e.g. {"wiki": 2.3}) applies
    the DoReMi/LLaMA-style mixture expansion AFTER curation: each kept
    document repeats floor(w) times plus a deterministic hash-chosen
    frac(w) share once more (``sampling.epoch_expand``); unlisted
    sources default to 1.0.  Expanded rows carry ``copy_idx`` and a
    synthetic unique ``_uid`` so shard assignment stays a slim
    (id, tokens) prefix sum."""
    funnel = curation_funnel(
        docs,
        text_col=text_col,
        id_col=id_col,
        source_col=source_col,
        keep_langs=keep_langs,
        cap_per_source=cap_per_source,
    )
    kept = funnel.filter(F.col("kept")).select(
        id_col,
        source_col,
        text_col,
        bpe_ish_token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    shard_id_col = id_col
    if epoch_weights:
        from gpt_rag_ingestion_spark.operators.sampling import epoch_expand

        pairs = []
        for k, v in sorted(epoch_weights.items()):
            if v < 0:
                raise ValueError(f"negative epoch weight: {k}={v}")
            pairs += [F.lit(k), F.lit(int(round(v * 10000)))]
        w_q = F.coalesce(
            F.create_map(*pairs)[F.col(source_col)], F.lit(10000)
        )
        kept = epoch_expand(kept, w_q, id_col=id_col)
        # unique row id for the slim shard prefix sum (copies < 1000)
        kept = kept.withColumn(
            "_uid", F.col(id_col) * 1000 + F.col("copy_idx")
        )
        shard_id_col = "_uid"
    n_shards = write_training_shards(
        kept,
        out_dir,
        tokens_col="n_tokens",
        order=[F.asc(shard_id_col)],
        target_tokens=target_tokens_per_shard,
        id_col=shard_id_col,
        bucket_expr=(F.col(shard_id_col) / 4096).cast("long"),
        fmt=fmt,
    )
    audit = funnel.groupBy("stage").agg(F.count(F.lit(1)).alias("n_docs"))

    # provenance: content digest of the written corpus (order- and
    # layout-independent) — re-running the job on identical inputs is
    # provably byte-equivalent data
    from gpt_rag_ingestion_spark.operators.manifest import write_manifest

    write_manifest(spark, out_dir, run_id="training-corpus")
    return audit, n_shards
