"""Streaming incremental near-dup detection (hoard_spark/streaming/neardup).

Scenario: documents arrive in two micro-batches; batch 2 contains an
exact clone and a near-clone of batch-1 docs plus a within-batch clone
pair. The index must flag exactly those, never the distinct docs, and
the second run must process ONLY the new files (checkpointed file
source) against the persisted signature store — the genuinely
incremental path a training-data ingest pipeline runs.
"""

import pytest
from pyspark.sql import functions as F

from hoard_spark.streaming.neardup import NearDupIndex, minhash_signatures


def _doc(doc_id: int, seed: str, n: int = 60) -> tuple[int, str]:
    return doc_id, " ".join(f"{seed}w{i}" for i in range(n))


def _near(doc_id: int, seed: str, n: int = 60) -> tuple[int, str]:
    # change the last token: 3 of ~58 distinct shingles differ => J ~ 0.9
    words = [f"{seed}w{i}" for i in range(n - 1)] + ["CHANGED"]
    return doc_id, " ".join(words)


@pytest.fixture()
def index(spark, tmp_path):
    return NearDupIndex(spark, str(tmp_path / "neardup"), threshold=0.7)


def _to_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_matching_across_batches(spark, index):
    batch1 = _to_df(spark, [_doc(i, f"s{i}") for i in range(1, 11)])
    index.process_batch(batch1, batch_id=0)
    assert index.matches().count() == 0  # all distinct
    assert index.signatures().count() == 10

    batch2 = _to_df(
        spark,
        [
            _doc(11, "s3"),  # exact clone of doc 3
            _near(12, "s5"),  # near-clone of doc 5
            _doc(13, "fresh"),  # new, distinct
            _doc(14, "fresh"),  # within-batch clone of 13
        ],
    )
    index.process_batch(batch2, batch_id=1)

    got = {
        (r["new_id"], r["matched_id"]): r["est_jaccard"]
        for r in index.matches().collect()
    }
    assert (11, 3) in got and got[(11, 3)] == 1.0
    assert (12, 5) in got and got[(12, 5)] >= 0.7
    assert (14, 13) in got and got[(14, 13)] == 1.0
    # no false positives: every reported pair is one of the planted three
    assert set(got) == {(11, 3), (12, 5), (14, 13)}
    assert index.signatures().count() == 14


def test_replay_is_idempotent(spark, index):
    """at-least-once: re-processing the same batch must not change the
    match set or corrupt the store."""
    batch = _to_df(spark, [_doc(1, "a"), _doc(2, "a"), _doc(3, "b")])
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
    _to_df(spark, [_doc(i, f"s{i}") for i in range(1, 6)]).coalesce(
        1
    ).write.parquet(str(src))

    stream = lambda: spark.readStream.schema(
        "doc_id long, text string"
    ).parquet(str(src))
    q = index.sink(stream(), ckpt)
    q.awaitTermination(120)
    assert index.matches().count() == 0

    _to_df(spark, [_doc(6, "s2")]).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    q = index.sink(stream(), ckpt)
    q.awaitTermination(120)
    got = {
        (r["new_id"], r["matched_id"]) for r in index.matches().collect()
    }
    assert got == {(6, 2)}


def test_signature_estimate_tracks_exact_jaccard(spark):
    """The signature-agreement estimate must sit near the true Jaccard
    (it is the store's verify metric, so its calibration matters)."""
    a = _to_df(spark, [_doc(1, "x"), _near(2, "x")])
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(a).collect()}
    est = sum(x == y for x, y in zip(sigs[1], sigs[2])) / 128.0
    # true J = 55/61 ~ 0.90 (57 shared 3-grams minus the 3 touched)
    assert abs(est - 55 / 61) < 0.12
