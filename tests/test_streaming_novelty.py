"""Streaming incremental n-gram novelty (hoard_spark/streaming/novelty).

Contract: streamed in doc_id order, the per-doc scores equal the batch
q95 exactly; replays are idempotent; the checkpointed file source
processes only new files against the persisted seen-gram store; an
exact clone of an already-ingested doc scores novelty 0.
"""

import pytest
from pyspark.sql import functions as F

from hoard_spark.queries import all_queries, load
from hoard_spark.streaming.novelty import NoveltyIndex

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def index(spark, tmp_path):
    return NoveltyIndex(spark, str(tmp_path / "novelty"))


def _to_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _doc(doc_id: int, seed: str, n: int = 30) -> tuple[int, str]:
    return doc_id, " ".join(f"{seed}w{i}" for i in range(n))


def test_docid_order_stream_equals_batch_q95(spark, index):
    """Three doc_id-ordered micro-batches over the sf0.001 documents
    table must reproduce the batch q95 row for row — the streaming path
    is the incremental evaluation of the same first-occurrence rule."""
    docs = load(spark, SF, "documents").select("doc_id", "text")
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    cut1, cut2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    index.process_batch(docs.where(F.col("doc_id") < cut1), 0)
    index.process_batch(
        docs.where((F.col("doc_id") >= cut1) & (F.col("doc_id") < cut2)), 1
    )
    index.process_batch(docs.where(F.col("doc_id") >= cut2), 2)

    expect = {
        r["doc_id"]: (r["n_grams"], r["n_new"], r["novelty"])
        for r in all_queries()["q95_ngram_novelty"]
        .spark_fn(spark, SF)
        .collect()
    }
    got = {
        r["doc_id"]: (r["n_grams"], r["n_new"], r["novelty"])
        for r in index.scores().collect()
    }
    assert got == expect


def test_replay_is_idempotent(spark, index):
    """at-least-once: re-processing a batch must not change scores or
    grow the effective store."""
    b1 = _to_df(spark, [_doc(1, "a"), _doc(2, "b")])
    b2 = _to_df(spark, [_doc(3, "a"), _doc(4, "c")])  # 3 clones 1
    index.process_batch(b1, 0)
    index.process_batch(b2, 1)
    first_scores = sorted(map(tuple, index.scores().collect()))
    first_store = index.grams().count()
    index.process_batch(b2, 1)  # replay
    assert sorted(map(tuple, index.scores().collect())) == first_scores
    assert index.grams().count() == first_store
    got = {r["doc_id"]: r["novelty"] for r in index.scores().collect()}
    assert got == {1: 1.0, 2: 1.0, 3: 0.0, 4: 1.0}


def test_streaming_file_source_incremental(spark, index, tmp_path):
    """Checkpointed file source: the second start() picks up only the
    new file and scores it against the persisted seen-gram store."""
    src = tmp_path / "incoming"
    ckpt = str(tmp_path / "ckpt")
    _to_df(spark, [_doc(1, "x"), _doc(2, "y")]).coalesce(1).write.parquet(
        str(src)
    )
    stream = lambda: spark.readStream.schema(  # noqa: E731
        "doc_id long, text string"
    ).parquet(str(src))
    q = index.sink(stream(), ckpt)
    q.awaitTermination(120)
    assert {
        r["doc_id"]: r["novelty"] for r in index.scores().collect()
    } == {1: 1.0, 2: 1.0}

    _to_df(spark, [_doc(3, "x")]).coalesce(1).write.mode("append").parquet(
        str(src)
    )
    q = index.sink(stream(), ckpt)
    q.awaitTermination(120)
    got = {r["doc_id"]: r["novelty"] for r in index.scores().collect()}
    assert got == {1: 1.0, 2: 1.0, 3: 0.0}
    # scores carry the admitting batch for provenance
    assert index.scores().where("doc_id = 3").first()["batch"] == 1
