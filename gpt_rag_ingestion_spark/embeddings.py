"""Embedding enrichers (SURVEY.md U1/U4).

The reference calls an Azure OpenAI embedding endpoint with bounded
concurrency and retry ladders (reference tools/aoai.py:210-264,
jobs/sharepoint_indexer.py:812-888).  The engine treats embedding as a
pluggable Arrow-batched pandas UDF; two providers:

- ``hash_embedding_udf(dim)``: deterministic offline provider — sha256
  counter-mode expansion of the text into ``dim`` floats in [-1,1],
  L2-normalized.  Fully reproducible across runs/engines, so vector
  columns are hash-comparable in tests (SURVEY.md §5.5).
- ``RemoteEmbedder`` (sketch): where the real endpoint would plug in;
  concurrency is bounded by ``df.repartition(n)`` (n partitions == n
  concurrent callers, the Spark analog of the reference's semaphore
  AOAI_MAX_CONCURRENCY, reference jobs/sharepoint_indexer.py:91-92) and
  retries stay inside the UDF.

At 100 TB the embedding call dominates cost; the deterministic provider
also serves as the benchmark stand-in so bench numbers measure engine
overhead, not network.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType


def embed_text_deterministic(text: str, dim: int) -> list[float]:
    """sha256(text) seeds a counter-mode keystream; each 4-byte word maps
    to [-1, 1); the vector is L2-normalized.  Pure stdlib+numpy, with
    the word->float mapping vectorized (bit-identical to the original
    per-word loop: same little-endian word order, same arithmetic)."""
    if text is None:
        text = ""
    seed = hashlib.sha256(text.encode("utf-8")).digest()
    nblocks = (dim + 7) // 8
    buf = b"".join(
        hashlib.sha256(seed + struct.pack("<I", c)).digest()
        for c in range(nblocks)
    )
    words = np.frombuffer(buf, dtype="<u4")[:dim]
    out = words.astype(np.float64) / 2147483648.0 - 1.0  # [0,2^32) -> [-1,1)
    norm = float(np.linalg.norm(out))
    if norm > 0:
        out = out / norm
    return out.astype(np.float32).tolist()


def embed_batch_np(texts, dim: int) -> list:
    """Vectorized batch form of ``embed_text_deterministic`` — the
    sha256 keystream is the only per-row Python work; the word→float
    mapping, normalization, and float32 cast run as ONE numpy pass over
    the whole batch, bit-identical to the scalar function row by row
    (same little-endian word order, same arithmetic).  Returns a list
    of float32 numpy vectors (Arrow-serializable as ARRAY<FLOAT>)."""
    n = len(texts)
    if n == 0:
        return []
    nblocks = (dim + 7) // 8
    counters = [struct.pack("<I", c) for c in range(nblocks)]
    buf = b"".join(
        hashlib.sha256(seed + c).digest()
        for t in texts
        for seed in (
            hashlib.sha256(("" if t is None else str(t)).encode("utf-8")).digest(),
        )
        for c in counters
    )
    words = np.frombuffer(buf, dtype="<u4").reshape(n, nblocks * 8)[:, :dim]
    out = words.astype(np.float64) / 2147483648.0 - 1.0
    norms = np.linalg.norm(out, axis=1)
    np.divide(out, norms[:, None], out=out, where=norms[:, None] > 0)
    return list(out.astype(np.float32))


def hash_embedding_udf(dim: int = 64):
    """Deterministic embedding provider as a pandas UDF (batch-
    vectorized via ``embed_batch_np``)."""
    from gpt_rag_ingestion_spark.session import ship_active

    ship_active()

    @pandas_udf(ArrayType(FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        return pd.Series(
            embed_batch_np(texts.fillna("").to_numpy(), dim), dtype=object
        )

    return _embed


def zero_vector(dim: int) -> list[float]:
    """Placeholder captionVector (reference base_chunker.py:228)."""
    return [0.0] * dim
