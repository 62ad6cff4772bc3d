"""Multimodal binary-column plumbing tests (hoard_spark.multimodal).

The decode/resize steps are stubs (no codec libs in the container); these
tests pin the REAL parts — BinaryType payloads, the typed metadata struct,
mapInPandas batch shapes, and byte-exact feature/frame values computed
against plain-Python references.
"""

import hashlib
import math
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hoard_spark.multimodal import (
    FEATURE_SCHEMA,
    FRAME_SCHEMA,
    attach_payload,
    decode_media,
    extract_features,
    fake_decode,
    resize_image,
    sample_frames,
)

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_attach_payload_schema(docs):
    media = attach_payload(docs, kind="image")
    schema = dict(media.dtypes)
    assert schema["payload"] == "binary"
    meta = media.schema["media"].dataType
    assert isinstance(meta, T.StructType)
    assert [f.name for f in meta.fields] == [
        "kind", "n_bytes", "width", "height", "n_frames",
    ]
    row = media.orderBy("doc_id").first()
    txt = docs.orderBy("doc_id").first()["text"]
    assert bytes(row["payload"]) == txt.encode("utf-8")
    assert row["media"]["n_bytes"] == len(txt.encode("utf-8"))
    assert row["media"]["kind"] == "image"


def test_attach_payload_rejects_unknown_kind(docs):
    with pytest.raises(ValueError, match="unknown media kind"):
        attach_payload(docs, kind="hologram")


def test_ppm_codec_roundtrip():
    import numpy as np

    from hoard_spark.multimodal import decode_ppm, encode_ppm

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    out = decode_ppm(encode_ppm(arr))
    assert out.shape == (5, 7, 3) and (out == arr).all()
    # header variants: comments and multi-whitespace are legal PPM
    body = arr.tobytes()
    variant = b"P6\n# a comment\n7 5\n255\n" + body
    assert (decode_ppm(variant) == arr).all()


def test_wav_codec_roundtrip():
    import numpy as np

    from hoard_spark.multimodal import decode_wav, encode_wav

    samples = (np.sin(np.arange(400) / 10.0) * 20000).astype(np.int16)
    got, rate = decode_wav(encode_wav(samples, rate=8000))
    assert rate == 8000 and (got == samples).all()


def test_ppm_stream_decode_and_media_dispatch():
    import numpy as np

    from hoard_spark.multimodal import encode_ppm

    frames = [
        np.full((2, 2, 3), i, dtype=np.uint8) for i in (0, 100, 200)
    ]
    stream = b"".join(encode_ppm(f) for f in frames)
    got = decode_media(stream, "video")
    assert len(got) == 3 and all((g == f).all() for g, f in zip(got, frames))
    assert fake_decode(b"\x00\x01") == b"\x00\x01"


def test_resize_nearest_neighbor_exact():
    import numpy as np

    from hoard_spark.multimodal import decode_ppm, encode_ppm

    arr = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3) % 256
    rs = decode_ppm(resize_image(encode_ppm(arr), 4, 4))
    # src = floor(dst * src_dim / dst_dim): rows/cols 0, 2, 4, 6
    assert (rs == arr[[0, 2, 4, 6]][:, [0, 2, 4, 6]]).all()


def test_malformed_payload_raises_not_silent():
    with pytest.raises(ValueError):
        decode_media(b"\x00\x01notappm", "image")
    with pytest.raises(ValueError):
        decode_media(b"P6\n4 4\n255\n\x00\x01", "image")  # truncated body
    with pytest.raises(ValueError):
        decode_media(b"nota-wav", "audio")
    with pytest.raises(ValueError):
        decode_media(b"x", "not-a-kind")


def test_register_codec_override():
    from hoard_spark.multimodal import _CODECS, register_codec

    orig = _CODECS["image"]
    try:
        register_codec("image", lambda b: b"decoded!")
        assert decode_media(b"anything", "image") == b"decoded!"
    finally:
        register_codec("image", orig)
    with pytest.raises(ValueError):
        register_codec("hologram", lambda b: b)


def test_extract_features_values(docs):
    media = attach_payload(docs, kind="image")
    feats = extract_features(media)
    assert feats.schema == FEATURE_SCHEMA
    got = {r["doc_id"]: r for r in feats.collect()}
    for r in docs.select("doc_id", "text").collect():
        data = r["text"].encode("utf-8")
        counts = {}
        for b in data:
            counts[b] = counts.get(b, 0) + 1
        expect_entropy = -sum(
            (n / len(data)) * math.log2(n / len(data)) for n in counts.values()
        )
        row = got[r["doc_id"]]
        assert row["n_bytes"] == len(data)
        assert row["n_unique"] == len(counts)
        assert row["entropy"] == pytest.approx(expect_entropy, abs=1e-9)
        assert row["head_md5"] == hashlib.md5(data).hexdigest()


def test_sample_frames_shapes_and_bytes(docs):
    media = attach_payload(docs, kind="video", frame_size=64)
    frames = sample_frames(media, frame_size=64, every=2)
    assert frames.schema == FRAME_SCHEMA
    by_doc = {}
    for r in frames.collect():
        by_doc.setdefault(r["doc_id"], {})[r["frame_idx"]] = bytes(r["frame"])
    for r in docs.select("doc_id", "text").collect():
        data = r["text"].encode("utf-8")
        n_frames = (len(data) + 63) // 64
        expect = {
            k: data[k * 64 : (k + 1) * 64] for k in range(0, n_frames, 2)
        }
        assert by_doc[r["doc_id"]] == expect


def test_payload_column_pruned_for_metadata_scan(docs, tmp_path):
    """Metadata-only reads must not deserialize the payload column: at
    100 TB the payload dominates storage and column pruning is the whole
    point of carrying media as a first-class binary column."""
    path = str(tmp_path / "media.parquet")
    attach_payload(docs).write.parquet(path)
    scan = (
        attach_payload(docs)
        .sparkSession.read.parquet(path)
        .select("doc_id", "media.n_bytes")
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan.split("ReadSchema")[-1]
