"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched pandas kernels.

The decode step itself is STUBBED (no image/audio codecs in this
environment): ``decode_image``/``decode_audio`` raise
NotImplementedError unless ``fake=True``, in which case a deterministic
seeded fake is produced.  Everything around the decode — schema,
partition strategy, UDF signatures, Arrow batch shapes, metadata
propagation — is real and tested, so swapping in a real codec is a
one-function change.

Scale notes: media blobs are the wide column; every op projects the
narrow columns first and forwards the blob untouched only when the
output needs it (column pruning keeps the scan narrow otherwise).
``mapInPandas`` processes Arrow batches so a real decoder amortizes
per-batch setup; batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` to cap executor
memory at large blob sizes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def _fake_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """Deterministic decode stand-in: seeded by the payload digest so
    identical payloads produce identical 'pixels'."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.random(out_dim, dtype=np.float32)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real implementation would be e.g. PIL/turbojpeg decode.
    Not available in this environment."""
    if not fake:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "pass fake=True for the deterministic test double"
        )
    return _fake_decode(payload, 64)


def decode_audio(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real implementation would be e.g. soundfile/ffmpeg."""
    if not fake:
        raise NotImplementedError(
            "audio codecs are not available in this environment; "
            "pass fake=True for the deterministic test double"
        )
    return _fake_decode(payload, 32)


def extract_image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + featurize images via mapInPandas (Arrow batches).

    The plan forwards only (media_id, payload) into Python — metadata
    columns are re-joined relationally if needed, keeping the Arrow
    transfer minimal.
    """

    def kernel(batches):
        for pdf in batches:
            feats = [
                decode_image(p, fake=fake).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": feats,
                }
            )

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_audio_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + featurize audio via mapInPandas (Arrow batches) — the
    audio twin of ``extract_image_features`` (real impl: MFCC /
    log-mel over the decoded waveform; here the decode is the
    documented deterministic stub, the batch plumbing is real)."""

    def kernel(batches):
        for pdf in batches:
            feats = [
                decode_audio(p, fake=fake).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "duration_ms": pdf["duration_ms"],
                    "feature": feats,
                }
            )

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "payload", "duration_ms"
    ).mapInPandas(kernel, schema=AUDIO_FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Resize stub: emits a deterministic payload of the target size
    (real impl: decoded resize + re-encode).  Shape/schema real."""

    def kernel(batches):
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                if not fake:
                    raise NotImplementedError("no image codecs in env")
                digest = hashlib.sha256(p).digest()
                reps = (width * height * 3) // len(digest) + 1
                out.append((digest * reps)[: width * height * 3])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out,
                    "width": np.full(len(pdf), width, dtype="int32"),
                    "height": np.full(len(pdf), height, dtype="int32"),
                    "sample_rate": pdf["sample_rate"],
                    "duration_ms": pdf["duration_ms"],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        kernel, schema=MEDIA_SCHEMA
    )


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, fake: bool = True
) -> DataFrame:
    """Frame sampling stub: one fake frame per ``every_ms`` of
    duration (real impl: ffmpeg seek+decode).  Demonstrates the
    one-to-many mapInPandas explode shape."""

    def kernel(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                n = max(1, int(dur or 0) // every_ms)
                for i in range(n):
                    if not fake:
                        raise NotImplementedError("no video codecs in env")
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(
                        hashlib.sha256(p + i.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_payload": frames}
            )

    return media.filter(F.col("kind") == "video").select(
        "media_id", "payload", "duration_ms"
    ).mapInPandas(kernel, schema=FRAME_SCHEMA)


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Test harness: build a media table with real binary payloads from
    the documents table (text bytes as payload), cycling kinds."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(32).alias("width").cast("int"),
        F.lit(32).alias("height").cast("int"),
        F.lit(16000).alias("sample_rate").cast("int"),
        (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
    )
