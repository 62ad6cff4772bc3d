"""binaryFile media ingest (hoard_spark/sources/media.py).

Round-trip real PPM/WAV files from a directory scan into payload rows,
check header parsing through the codec registry, and pin the
metadata-only scan's column pruning (no content read).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hoard_spark.multimodal import decode_ppm, encode_ppm, encode_wav
from hoard_spark.sources.media import read_media_dir


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    rng = np.random.default_rng(7)
    (d / "a.ppm").write_bytes(
        encode_ppm(rng.integers(0, 256, (8, 6, 3), dtype=np.uint8))
    )
    (d / "b.ppm").write_bytes(
        encode_ppm(rng.integers(0, 256, (4, 4, 3), dtype=np.uint8))
    )
    (d / "c.wav").write_bytes(
        encode_wav((1000 * np.sin(np.arange(320) / 10)).astype(np.int16))
    )
    (d / "notes.txt").write_bytes(b"not media")
    return str(d)


def test_scan_maps_kinds_and_payloads(spark, media_dir):
    rows = {
        r["path"].rsplit("/", 1)[-1]: r
        for r in read_media_dir(spark, media_dir).collect()
    }
    assert set(rows) == {"a.ppm", "b.ppm", "c.wav", "notes.txt"}
    assert rows["a.ppm"]["media"]["kind"] == "image"
    assert rows["c.wav"]["media"]["kind"] == "audio"
    assert rows["notes.txt"]["media"]["kind"] == "unknown"
    # payload round-trips bit-for-bit through the scan
    arr = decode_ppm(bytes(rows["a.ppm"]["payload"]))
    assert arr.shape == (8, 6, 3)
    # doc_id is stable across re-reads (same paths -> same ids)
    again = {
        r["path"].rsplit("/", 1)[-1]: r["doc_id"]
        for r in read_media_dir(spark, media_dir).collect()
    }
    assert again == {k: r["doc_id"] for k, r in rows.items()}


def test_glob_filters_at_listing(spark, media_dir):
    names = {
        r["path"].rsplit("/", 1)[-1]
        for r in read_media_dir(spark, media_dir, glob="*.ppm").collect()
    }
    assert names == {"a.ppm", "b.ppm"}


def test_parse_headers_fills_dimensions(spark, media_dir):
    rows = {
        r["path"].rsplit("/", 1)[-1]: r["media"]
        for r in read_media_dir(
            spark, media_dir, parse_headers=True
        ).collect()
    }
    assert (rows["a.ppm"]["width"], rows["a.ppm"]["height"]) == (6, 8)
    assert rows["b.ppm"]["n_frames"] == 1
    assert rows["c.wav"]["n_frames"] == 320
    # unknown kind parses to nulls, not an error
    assert rows["notes.txt"]["width"] is None


def test_metadata_only_scan_prunes_content(spark, media_dir):
    df = read_media_dir(spark, media_dir).select(
        "doc_id", F.col("media.n_bytes")
    )
    read = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("ReadSchema:")[-1]
    )
    assert "content" not in read, read
