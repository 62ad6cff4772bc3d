"""Multimodal binary-column plumbing for training-data pipelines.

The reference has no multimodal surface (SURVEY.md §2B — its only scan is
the Whisper ring buffer); this module is part of the LLM-training-data
extension: image/audio/video content is carried as an opaque ``binary``
payload column plus a typed metadata struct, and every per-payload
transform (decode, feature-extract, resize, frame-sample) runs as an
Arrow-batched ``mapInPandas`` stage so the bytes never row-trip through
pickled Python objects.

Real codecs (Pillow / librosa / av) are NOT installed in this container,
so the decode/resize steps are stubbed behind ``NotImplementedError`` with
a deterministic fake stand-in — but the Spark-side plumbing (schema,
partitioning, UDF signatures, batch shapes) is real and tested:

- payloads are genuine BinaryType columns,
- metadata is a typed struct (not JSON strings),
- feature extraction / frame sampling are ``mapInPandas`` over Arrow
  batches (the 10-100x-over-row-UDF path),
- the compute-bound stages repartition the input first so per-payload work
  fans across executors rather than following file-split parallelism.

At 100 TB the payload column dominates storage; the design keeps scans of
metadata-only queries cheap because Parquet column pruning skips the
payload chunk entirely unless a stage actually reads ``payload``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pandas only needed executor-side inside mapInPandas
    import pandas as pd

MEDIA_KINDS = ("image", "audio", "video")

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),  # image/video
        T.StructField("height", T.IntegerType()),  # image/video
        T.StructField("n_frames", T.IntegerType()),  # video/audio
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("n_unique", T.IntegerType()),
        T.StructField("entropy", T.DoubleType()),
        T.StructField("head_md5", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def attach_payload(
    docs: DataFrame, kind: str = "image", frame_size: int = 64
) -> DataFrame:
    """documents → (doc_id, lang, source, payload binary, media struct).

    Deterministic fake media: the payload is the document's UTF-8 bytes
    standing in for decoded media content (the container has no codec
    libraries), and the metadata struct is derived from the payload so
    every downstream stage exercises the real schema. A production
    deployment replaces this with the actual bytes column from the lake.
    """
    if kind not in MEDIA_KINDS:
        raise ValueError(f"unknown media kind {kind!r}; one of {MEDIA_KINDS}")
    payload = F.encode(F.col("text"), "UTF-8")
    n_bytes = F.octet_length(F.col("text")).cast("long")
    width = (F.pmod(n_bytes, F.lit(64)) + F.lit(1)).cast("int")
    meta = F.struct(
        F.lit(kind).alias("kind"),
        n_bytes.alias("n_bytes"),
        width.alias("width"),
        F.ceil(n_bytes / width).cast("int").alias("height"),
        F.ceil(n_bytes / F.lit(frame_size)).cast("int").alias("n_frames"),
    )
    return docs.select(
        "doc_id",
        "lang",
        "source",
        payload.alias("payload"),
        meta.alias("media"),
    )


def decode_media(payload: bytes, kind: str) -> "object":
    """Decode one payload into a pixel/sample array — STUB.

    Real implementation needs Pillow (image), librosa/soundfile (audio) or
    av (video), none of which are installed here. The mapInPandas stages
    below call :func:`fake_decode` instead; swap this in when codecs are
    available.
    """
    raise NotImplementedError(
        f"no codec library available to decode kind={kind!r}; "
        "install Pillow/librosa/av and implement decode_media()"
    )


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize an image payload — STUB (needs a real codec, see above)."""
    raise NotImplementedError(
        "resize requires decode_media(); install an image codec"
    )


def fake_decode(payload: bytes) -> bytes:
    """Deterministic decode stand-in: identity on the raw bytes."""
    return payload


def extract_features(df: DataFrame) -> DataFrame:
    """(…, payload) → per-payload features via Arrow-batched mapInPandas.

    Byte histogram → Shannon entropy, distinct-byte count, and a content
    hash: the shape of a real quality/filter stage (NSFW scoring, codec
    sniffing, corruption detection) with the decode stubbed to the raw
    bytes. numpy-vectorized per payload; one pandas batch per Arrow chunk.
    """
    import numpy as np  # local: executors import lazily
    import pandas as pd

    def compute(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = fake_decode(bytes(payload))
                arr = np.frombuffer(data, dtype=np.uint8)
                counts = np.bincount(arr, minlength=256)
                p = counts[counts > 0] / max(len(arr), 1)
                entropy = float(-(p * np.log2(p)).sum()) if len(arr) else 0.0
                out.append(
                    (
                        doc_id,
                        len(data),
                        int((counts > 0).sum()),
                        entropy,
                        hashlib.md5(data).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    ncores = df.sparkSession.sparkContext.defaultParallelism
    # payload work is compute-bound: spread batches across cores, don't
    # inherit the (often single) file-split partitioning
    return df.repartition(ncores, "doc_id").mapInPandas(
        compute, FEATURE_SCHEMA
    )


def sample_frames(
    df: DataFrame, frame_size: int = 64, every: int = 2
) -> DataFrame:
    """(…, payload) → (doc_id, frame_idx, frame) for every ``every``-th
    fixed-size frame — the video frame-sampling shape (a real pipeline
    decodes containers; here frames are byte slices of the stub payload).

    One input row fans out to ceil(n_bytes/frame_size)/every output rows,
    so this runs as mapInPandas (vectorized generator) rather than an
    exploded column expression building every frame before discarding
    (every-1)/every of them.
    """
    import pandas as pd

    def cut(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = (len(data) + frame_size - 1) // frame_size
                for k in range(0, n_frames, every):
                    rows.append(
                        (doc_id, k, data[k * frame_size : (k + 1) * frame_size])
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    ncores = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(ncores, "doc_id").mapInPandas(cut, FRAME_SCHEMA)
