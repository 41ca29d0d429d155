"""Multimodal-column plumbing (beyond-reference, north-star).

Image/audio/video payloads ride as opaque ``BINARY`` columns with a
typed metadata struct, mirroring how the reference moves figure images
as base64 between analysis, captioning and blob upload (reference
chunking/chunkers/multimodal_chunker.py:15-546,
tools/doc_intelligence.py:322-348).

The decode / feature-extract steps are STUBBED (no image/audio libs in
this container): ``decode_image_stub`` raises unless
``deterministic_fake=True``, in which case it emits a seeded fake
(width/height/n_frames derived from sha256 of the payload) so the
Spark-side plumbing — schema, batch shape, mapInPandas iterator
signature, partition sizing — is real and tested end-to-end.

Scale notes: media batches are large; ``mapInPandas`` streams Arrow
batches so one task never materializes a partition of raw media at
once.  Partition the media table by (modality, size-bucket) so decode
tasks are uniform; 128 MB input splits keep per-task memory bounded.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("payload_sha256", T.StringType(), True),
        T.StructField("payload_bytes", T.LongType(), True),
    ]
)


def decode_image_stub(payload: bytes, deterministic_fake: bool = False) -> dict:
    """Image decode: PIL when installed (real width/height/frames),
    else a clearly-marked gate.  ``deterministic_fake=True`` is the
    seeded stand-in used by tests/bench in library-free containers."""
    if not deterministic_fake:
        try:
            import io

            from PIL import Image  # noqa: F401

            with Image.open(io.BytesIO(payload or b"")) as img:
                return {
                    "width": int(img.width),
                    "height": int(img.height),
                    "n_frames": int(getattr(img, "n_frames", 1)),
                }
        except ImportError:
            pass
        raise NotImplementedError(
            "media decoding requires image/audio libraries not available "
            "in this environment; pass deterministic_fake=True for the "
            "seeded stand-in used by tests/bench"
        )
    digest = hashlib.sha256(payload or b"").digest()
    return {
        "width": 64 + digest[0],
        "height": 64 + digest[1],
        "n_frames": 1 + digest[2] % 8,
    }


def extract_media_features(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over BINARY payloads.  The iterator
    form processes one Arrow batch at a time — constant memory per task
    regardless of partition size."""

    from gpt_rag_ingestion_spark.session import ensure_importable

    ensure_importable(media)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [(p if p is not None else b"") for p in pdf["payload"]]
            decoded = [
                decode_image_stub(p, deterministic_fake=deterministic_fake)
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "modality": pdf["modality"].to_numpy(),
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "n_frames": [d["n_frames"] for d in decoded],
                    "payload_sha256": [
                        hashlib.sha256(p).hexdigest() for p in payloads
                    ],
                    "payload_bytes": [len(p) for p in payloads],
                },
                columns=[f.name for f in FEATURE_SCHEMA.fields],
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("target_width", T.IntegerType(), True),
        T.StructField("target_height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("payload_sha256", T.StringType(), True),
    ]
)


def resize_images_stub(
    media: DataFrame, width: int, height: int, deterministic_fake: bool = True
) -> DataFrame:
    """Resize plumbing over BINARY payloads (the real PIL/ffmpeg resize
    plugs into the same mapInPandas slot).  The deterministic fake emits
    a content-addressed payload derived from (bytes, target dims) so the
    schema/batching/partitioning path is real and testable; without
    ``deterministic_fake`` it raises like decode_image_stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for p in pdf["payload"]:
                p = p if p is not None else b""
                if not deterministic_fake:
                    raise NotImplementedError(
                        "image resize requires imaging libraries not available "
                        "in this environment"
                    )
                out_payloads.append(
                    hashlib.sha256(p + f":{width}x{height}".encode()).digest()
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "target_width": width,
                    "target_height": height,
                    "payload": out_payloads,
                    "payload_sha256": [
                        hashlib.sha256(b).hexdigest() for b in out_payloads
                    ],
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode frame indices relationally
    (sequence/explode, JVM-side); the per-frame decode would be the same
    stubbed mapInPandas.  Demonstrates the fan-out schema."""
    # guard n >= 1: sequence(0, -1, step) has illegal boundaries, and a
    # 0-frame video should still not crash the job
    n = F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)), F.lit(1))
    idx = F.explode(F.sequence(F.lit(0), n - 1, F.lit(every_nth)))
    return media.filter(F.col("modality") == "video").select(
        "media_id", idx.alias("frame_index")
    )
