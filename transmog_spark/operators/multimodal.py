"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery is real and tested — schema, partition-preserving
``mapInPandas`` over Arrow batches, typed metadata structs, batch-shape
control. The codec step itself is STUBBED: the image/audio libraries are
not in this container, so ``decode_fn=None`` installs a deterministic fake
(payload-hash "features") and the library hooks raise ``NotImplementedError``
with a clear message. Swap in a real decoder (PIL/librosa/ffmpeg) by
passing ``decode_fn``; nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_DOC = """
media table contract:
  media_id : string
  kind     : string            -- image|audio|video
  payload  : binary            -- opaque encoded bytes
  meta     : struct<mime:string, width:int, height:int,
                    duration_ms:int, sample_rate:int>
"""


def attach_media_meta(df: DataFrame, kind_col: str = "kind") -> DataFrame:
    """Derive cheap metadata (payload size, sha1) without decoding."""
    return df.withColumn("payload_bytes", F.length("payload")).withColumn(
        "payload_sha1", F.sha1("payload")
    )


def _fake_feature(payload: bytes | None, n: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded feature vector (no media libs here)."""
    if payload is None:
        return [0.0] * n
    h = hashlib.sha256(bytes(payload)).digest()
    return [b / 255.0 for b in h[:n]]


def decode_stub(*_args, **_kwargs):
    raise NotImplementedError(
        "media decode requires an image/audio library (PIL/librosa/ffmpeg) "
        "not present in this environment; pass decode_fn=... to "
        "extract_features to plug one in"
    )


def extract_features(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "media_id",
    feature_dim: int = 8,
    decode_fn: Callable[[bytes], list[float]] | None = None,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched mapInPandas.

    Partition-preserving (no shuffle); each Arrow batch carries
    ``batch_size_hint`` rows of binary payloads. With ``decode_fn=None`` the
    deterministic fake (sha256-derived vector) keeps the pipeline testable.
    """
    fn = decode_fn or (lambda payload: _fake_feature(payload, feature_dim))
    out_schema = f"{id_col} string, feature array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype(str),
                    "feature": pdf[payload_col].map(fn),
                }
            )

    src = df.select(F.col(id_col).cast("string").alias(id_col), F.col(payload_col))
    return src.mapInPandas(run, schema=out_schema)


def frame_sample_plan(
    df: DataFrame, *, every_ms: int = 1000, id_col: str = "media_id"
) -> DataFrame:
    """Plan video frame sampling: one row per (media, frame_ts) to decode.

    Pure expression-level fan-out from duration metadata; the decode itself
    is the stubbed step above.
    """
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1)
    )
    return df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: (i * every_ms).cast("int"),
            )
        ).alias("frame_ts_ms"),
    )


def resize_media(
    df: DataFrame,
    out_w: int,
    out_h: int,
    *,
    payload_col: str = "payload",
    id_col: str = "media_id",
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize image payloads via Arrow-batched mapInPandas — the third leg
    of the multimodal plumbing (decode / feature-extract / RESIZE /
    frame-sample). Partition-preserving, binary in -> binary out, so it
    composes with ``extract_features`` downstream without a shuffle.

    Default codec is the dependency-free nearest-neighbor PPM resize
    (operators/codecs.py:ppm_resize_nn — exact integer source mapping,
    byte-reproducible); pass ``resize_fn`` to swap in a real image library
    where one is installed (PIL/OpenCV are not in this container).
    """
    from transmog_spark.operators.codecs import ppm_resize_nn

    fn = resize_fn or ppm_resize_nn
    out_schema = f"{id_col} string, payload binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype(str),
                    "payload": pdf[payload_col].map(
                        lambda p: fn(bytes(p), out_w, out_h)
                    ),
                }
            )

    src = df.select(F.col(id_col).cast("string").alias(id_col), F.col(payload_col))
    return src.mapInPandas(run, schema=out_schema)
