"""Streaming incremental embedding near-dup (hoard_spark/streaming/vectors).

Mirror of test_streaming_neardup for the vector surface: embeddings
arrive in two micro-batches; batch 2 contains an exact clone and a
noisy clone (multiplicative ±10% perturbation, true cos ~0.995) of
batch-1 vectors plus a within-batch clone pair. The index must flag
exactly those from stored 64-bit signatures alone — the store never
keeps raw embeddings — and the checkpointed file source must process
only new files against the persisted store.
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from hoard_spark.streaming.vectors import (
    VectorDupIndex,
    vector_signatures,
)

DIM = 64


def _vec(vid: int) -> list:
    """Deterministic pseudo-random unit-scale vector; md5-derived so
    cross-cosines behave like random (~N(0, 1/64)) — a trig generator
    would plant accidental high-cos pairs."""
    out = []
    for j in range(DIM):
        d = hashlib.md5(f"v{vid}:{j}".encode()).digest()
        u = int.from_bytes(d[:8], "big") / float(1 << 64)
        out.append(2.0 * u - 1.0)
    return out


def _noisy(vid: int, src: int) -> tuple:
    base = _vec(src)
    return vid, [
        x * (1.0 + 0.1 * math.sin(0.7 * vid + j))
        for j, x in enumerate(base)
    ]


def _to_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


@pytest.fixture()
def index(spark, tmp_path):
    return VectorDupIndex(
        spark, str(tmp_path / "vecdup"), dim=DIM, threshold=0.92
    )


def test_incremental_matching_across_batches(spark, index):
    batch1 = _to_df(spark, [(i, _vec(i)) for i in range(1, 11)])
    index.process_batch(batch1, batch_id=0)
    assert index.matches().count() == 0  # all distinct
    assert index.signatures().count() == 10

    batch2 = _to_df(
        spark,
        [
            (11, _vec(3)),  # exact clone of vec 3
            _noisy(12, 5),  # noisy clone of vec 5 (cos ~0.995)
            (13, _vec(99)),  # new, distinct
            (14, _vec(99)),  # within-batch clone of 13
        ],
    )
    index.process_batch(batch2, batch_id=1)

    got = {
        (r["new_id"], r["matched_id"]): r["est_cos"]
        for r in index.matches().collect()
    }
    assert (11, 3) in got and got[(11, 3)] == 1.0
    assert (12, 5) in got and got[(12, 5)] >= 0.92
    assert (14, 13) in got and got[(14, 13)] == 1.0
    # no false positives: every reported pair is one of the planted three
    assert set(got) == {(11, 3), (12, 5), (14, 13)}
    assert index.signatures().count() == 14


def test_replay_is_idempotent(spark, index):
    """at-least-once: re-processing the same batch must not change the
    match set or corrupt the store."""
    batch = _to_df(spark, [(1, _vec(7)), (2, _vec(7)), (3, _vec(8))])
    index.process_batch(batch, batch_id=0)
    first = sorted(
        (r["new_id"], r["matched_id"]) for r in index.matches().collect()
    )
    index.process_batch(batch, batch_id=0)  # replay
    again = sorted(
        (r["new_id"], r["matched_id"]) for r in index.matches().collect()
    )
    assert first == again == [(2, 1)]
    assert index.signatures().count() == 3


def test_streaming_file_source_incremental(spark, index, tmp_path):
    """Drive the real streaming path: file source + checkpoint. The
    second start() must pick up only the new file and still match it
    against batch 1's persisted signatures."""
    src = tmp_path / "incoming"
    ckpt = str(tmp_path / "ckpt")
    _to_df(spark, [(i, _vec(i)) for i in range(1, 6)]).coalesce(
        1
    ).write.parquet(str(src))

    stream = lambda: spark.readStream.schema(  # noqa: E731
        "vec_id long, embedding array<double>"
    ).parquet(str(src))
    q = index.sink(stream(), ckpt)
    q.awaitTermination(120)
    assert index.matches().count() == 0

    _to_df(spark, [(6, _vec(2))]).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    q = index.sink(stream(), ckpt)
    q.awaitTermination(120)
    got = {
        (r["new_id"], r["matched_id"]) for r in index.matches().collect()
    }
    assert got == {(6, 2)}


def test_signature_estimate_tracks_true_cosine(spark):
    """The bit-agreement angle estimate must sit near the true cosine
    (it is the store's verify metric, so its calibration matters)."""
    vid, noisy = _noisy(2, 1)
    a, b = _vec(1), noisy
    dot = sum(x * y for x, y in zip(a, b))
    true_cos = dot / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    )
    sigs = {
        r["vec_id"]: r["sig"]
        for r in vector_signatures(
            _to_df(spark, [(1, a), (2, b)]), DIM
        ).collect()
    }
    agree = 64 - bin(sigs[1] ^ sigs[2]).count("1")
    est = math.cos(math.pi * (1.0 - agree / 64.0))
    assert abs(est - true_cos) < 0.1
    # and distinct vectors must estimate far below the dup threshold
    sigs2 = {
        r["vec_id"]: r["sig"]
        for r in vector_signatures(
            _to_df(spark, [(1, _vec(21)), (2, _vec(22))]), DIM
        ).collect()
    }
    agree2 = 64 - bin(sigs2[1] ^ sigs2[2]).count("1")
    est2 = math.cos(math.pi * (1.0 - agree2 / 64.0))
    assert est2 < 0.7
