"""Streaming incremental containment dedup (streaming/containment.py).

Contract: the union of per-batch emitted pairs equals the batch
``containment_join`` over the full corpus's hashed gram rows (each pair
surfaces exactly once, in the batch where its later member arrives);
replays are idempotent; the checkpointed file source processes only new
files against the persisted posting store; a streamed-in truncation of
an already-ingested doc is flagged at containment 1.0.
"""

import pytest
from pyspark.sql import functions as F

from hoard_spark.queries import load
from hoard_spark.streaming.containment import (
    ContainmentIndex,
    ranked_gram_rows,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def index(spark, tmp_path):
    return ContainmentIndex(
        spark, str(tmp_path / "cont"), threshold=0.9, min_size=5
    )


def _to_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _doc(doc_id: int, seed: str, n: int = 30) -> tuple[int, str]:
    return doc_id, " ".join(f"{seed}w{i}" for i in range(n))


def _trunc(doc_id: int, seed: str, n: int = 30, k: int = 18):
    return doc_id, " ".join(f"{seed}w{i}" for i in range(n)[:k])


def _batch_twin(spark, docs):
    """Ground truth: the batch containment_join over the SAME hashed
    gram rows the stream uses (set_col = the hash)."""
    from hoard_spark.simjoin import containment_join

    rows = ranked_gram_rows(docs).select("doc_id", "g")
    return {
        (r["a_id"], r["b_id"]): (
            r["inter"], r["na"], r["nb"], r["containment"],
        )
        for r in containment_join(
            rows, 0.9, set_col="g", min_size=5
        ).collect()
    }


def test_stream_union_equals_batch_containment_join(spark, index):
    """Three micro-batches over the sf0.001 documents table (plus
    planted truncations split ACROSS batches, so cross-batch pairs must
    surface) reproduce the batch join pair for pair."""
    docs = load(spark, SF, "documents").select("doc_id", "text")
    toks = F.split(F.trim("text"), " +")
    k = F.greatest(F.lit(3), F.ceil(F.lit(0.6) * F.size(toks)).cast("int"))
    clones = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + F.lit(100000)).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, F.lit(1), k)).alias("text"),
    )
    aug = docs.unionByName(clones)

    ids = sorted(r["doc_id"] for r in aug.select("doc_id").collect())
    cut1, cut2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    index.process_batch(aug.where(F.col("doc_id") < cut1), 0)
    index.process_batch(
        aug.where((F.col("doc_id") >= cut1) & (F.col("doc_id") < cut2)), 1
    )
    index.process_batch(aug.where(F.col("doc_id") >= cut2), 2)

    got = {
        (r["a_id"], r["b_id"]): (
            r["inter"], r["na"], r["nb"], r["containment"],
        )
        for r in index.pairs().collect()
    }
    expect = _batch_twin(spark, aug)
    assert got == expect
    assert expect, "planted truncations must yield pairs"
    # the truncations sit in later batches than their sources — at least
    # one emitted pair must be cross-batch (later batch than batch 0)
    assert index.pairs().where("batch > 0").count() > 0


def test_replay_is_idempotent(spark, index):
    b1 = _to_df(spark, [_doc(1, "a"), _doc(2, "b")])
    b2 = _to_df(spark, [_trunc(3, "a"), _doc(4, "c")])  # 3 truncates 1
    index.process_batch(b1, 0)
    index.process_batch(b2, 1)
    first_pairs = sorted(map(tuple, index.pairs().collect()))
    first_store = index.postings().count()
    index.process_batch(b2, 1)  # replay
    assert sorted(map(tuple, index.pairs().collect())) == first_pairs
    assert index.postings().count() == first_store
    got = {
        (r["a_id"], r["b_id"]): r["containment"]
        for r in index.pairs().collect()
    }
    assert got == {(3, 1): 1.0}  # directed: truncation -> source only


def test_pair_emitted_in_later_members_batch(spark, index):
    """An old doc contained in a NEW doc must also surface (the
    store-A x new-B meeting): stream the short doc first."""
    index.process_batch(_to_df(spark, [_trunc(1, "z")]), 0)
    index.process_batch(_to_df(spark, [_doc(2, "z")]), 1)
    got = {
        (r["a_id"], r["b_id"]): (r["containment"], r["batch"])
        for r in index.pairs().collect()
    }
    assert got == {(1, 2): (1.0, 1)}


def test_streaming_file_source_incremental(spark, index, tmp_path):
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
    assert index.pairs().count() == 0

    _to_df(spark, [_trunc(3, "x")]).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    q = index.sink(stream(), ckpt)
    q.awaitTermination(120)
    got = {
        (r["a_id"], r["b_id"]): (r["containment"], r["batch"])
        for r in index.pairs().collect()
    }
    assert got == {(3, 1): (1.0, 1)}


# --- property pin: random corpora, random batch splits -----------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# small vocab forces organic overlap; docs long enough to clear min_size
_docs_strategy = st.lists(
    st.lists(
        st.sampled_from([f"w{i}" for i in range(12)]),
        min_size=7,
        max_size=20,
    ),
    min_size=4,
    max_size=10,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=_docs_strategy,
    splits=st.lists(st.integers(0, 2), min_size=10, max_size=10),
    t=st.sampled_from([0.6, 0.9]),
)
def test_property_stream_union_equals_batch(spark, tmp_path, docs, splits, t):
    """For ANY corpus and ANY assignment of docs to three micro-batches,
    the union of emitted pairs equals the batch containment_join over
    the full corpus — each qualifying directed pair exactly once."""
    import uuid

    from hoard_spark.simjoin import containment_join

    index = ContainmentIndex(
        spark,
        str(tmp_path / f"cont-{uuid.uuid4().hex[:8]}"),
        threshold=t,
        min_size=5,
    )
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    full = _to_df(spark, rows)
    for b in range(3):
        chosen = [r for r in rows if splits[r[0] % 10] == b]
        if chosen:
            index.process_batch(_to_df(spark, chosen), b)
    got = {
        (r["a_id"], r["b_id"]): (r["inter"], r["na"], r["nb"])
        for r in index.pairs().collect()
    }
    want = {
        (r["a_id"], r["b_id"]): (r["inter"], r["na"], r["nb"])
        for r in containment_join(
            ranked_gram_rows(full).select("doc_id", "g"),
            t,
            set_col="g",
            min_size=5,
        ).collect()
    }
    assert got == want


def test_reingest_conflict_raises(spark, index):
    """Append-only invariant guard (ADVICE r9; v2 reads the O(docs)
    fingerprint table, not the posting store): re-ingesting a doc_id
    with a DIFFERENT gram set raises before anything is written; a
    byte-identical replay passes."""
    index.process_batch(
        _to_df(spark, [_doc(1, "a"), _doc(2, "b")]), batch_id=0
    )
    store_before = index.postings().count()
    with pytest.raises(ValueError, match="different gram set"):
        index.process_batch(_to_df(spark, [_doc(1, "CHANGED")]), batch_id=1)
    assert index.postings().count() == store_before
    index.process_batch(_to_df(spark, [_doc(1, "a")]), batch_id=2)  # replay
    assert index.postings().count() == store_before


def test_width5_store_finds_cross_batch_truncation(spark, tmp_path):
    """The gram-width knob (r13): width=5 is the declared scale path for
    saturated gram domains (the sf10 width-3 run ENOSPC'd exactly like
    batch q98). The w5 store must still surface a planted cross-batch
    truncation, and its stream union must equal the batch
    containment_join over the SAME width-5 hashed gram rows."""
    from hoard_spark.simjoin import containment_join
    from hoard_spark.streaming.containment import (
        ContainmentIndex,
        ranked_gram_rows,
    )

    docs = [
        (i, " ".join(f"w{j}" for j in range(i, i + 12))) for i in range(20)
    ]
    # doc 100 = first 8 tokens of doc 0 -> 4 distinct 5-grams, all in doc 0
    docs.append((100, " ".join(f"w{j}" for j in range(0, 8))))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    index = ContainmentIndex(
        spark, str(tmp_path / "w5"), threshold=0.9, min_size=2, width=5
    )
    index.process_batch(df.where("doc_id < 50"), batch_id=0)
    index.process_batch(df.where("doc_id >= 50"), batch_id=1)

    got = {
        (r["a_id"], r["b_id"]): (r["inter"], r["na"], r["nb"])
        for r in index.pairs().collect()
    }
    want = {
        (r["a_id"], r["b_id"]): (r["inter"], r["na"], r["nb"])
        for r in containment_join(
            ranked_gram_rows(df, width=5).select("doc_id", "g"),
            0.9,
            set_col="g",
            min_size=2,
        ).collect()
    }
    assert got == want
    assert (100, 0) in got, got
