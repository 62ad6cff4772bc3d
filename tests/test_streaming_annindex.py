"""Streaming incremental ANN index maintenance (streaming/annindex).

The pin is the equivalence contract: after N micro-batches, the store's
assigned table is ROW-FOR-ROW equal to the batch index build
(``encode_pq(assign_cells(normalized(corpus), cents), books)``) over
the union corpus with the store's own model — so incremental
maintenance IS the batch build amortized over arrivals, and every
``hoard_spark.ann`` search runs against the store unchanged. Plus the
store disciplines shared with the neardup/vector stores (replay
idempotency, checkpointed file-source drive) and the drift trigger.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from hoard_spark.streaming.annindex import AnnIndexStore

DIM = 64


def _raw(tag: str) -> list:
    out = []
    for j in range(DIM):
        d = hashlib.md5(f"{tag}:{j}".encode()).digest()
        u = int.from_bytes(d[:8], "big") / float(1 << 64)
        out.append(2.0 * u - 1.0)
    return out


# CLUSTERED corpus (4 prototype directions + 15% noise): an isotropic
# random corpus has no structure for k-means to learn (assign-cos ~0.2
# for EVERYTHING, drifted or not), so the drift trigger would be
# untestable on it; clustered data gives in-distribution batches
# assign-cos ~0.95+ and leaves anything off-prototype clearly below.
_PROTOS = [_raw(f"p{c}") for c in range(4)]


def _vec(vid: int) -> list:
    noise = _raw(f"a{vid}")
    p = _PROTOS[vid % 4]
    return [p[j] + 0.15 * noise[j] for j in range(DIM)]


def _to_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


@pytest.fixture()
def store(spark, tmp_path):
    return AnnIndexStore(spark, str(tmp_path / "annidx"))


def _batches(spark, n=60, parts=3):
    rows = [(i, _vec(i)) for i in range(n)]
    step = n // parts
    return [
        _to_df(spark, rows[i * step : (i + 1) * step])
        for i in range(parts)
    ], _to_df(spark, rows)


def test_incremental_store_equals_batch_build(spark, store):
    """The headline contract (VERDICT r9 stretch 8)."""
    from hoard_spark.ann import assign_cells, encode_pq, normalized

    batches, corpus = _batches(spark)
    for b, df in enumerate(batches):
        store.process_batch(df, batch_id=b)
    cents, books = store.model()

    batch_rows = sorted(
        map(
            str,
            encode_pq(
                assign_cells(normalized(corpus, persist=False), cents),
                books,
            )
            .select("vec_id", "v", "nrm", "cell", "pq")
            .collect(),
        )
    )
    store_rows = sorted(map(str, store.table().collect()))
    assert store_rows == batch_rows
    assert len(store_rows) == 60


def test_search_over_store_finds_planted_clone(spark, store):
    """Search-shape smoke: an exact clone arriving in a LATER batch must
    come back as its source's top-1 through both the IVF and the ADC
    search over the store table (clone and source share a cell for any
    fixed model — the q39/q91 argument on the incremental store)."""
    from hoard_spark.ann import search_ivf, search_ivf_pq

    batches, _ = _batches(spark)
    for b, df in enumerate(batches):
        store.process_batch(df, batch_id=b)
    # batch 4: clones of vectors 3 and 17 at +1000
    store.process_batch(
        _to_df(spark, [(1003, _vec(3)), (1017, _vec(17))]), batch_id=3
    )
    cents, books = store.model()
    table = store.table()
    probes = table.where(F.col("vec_id") >= 1000).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("q_v"),
        F.col("nrm").alias("q_nrm"),
    )
    ivf = {
        (r["q_id"], r["n_id"])
        for r in search_ivf(table, cents, probes, k=1, nprobe=6).collect()
    }
    adc = {
        (r["q_id"], r["n_id"])
        for r in search_ivf_pq(
            table, table, cents, books, probes, k=1, nprobe=6, rerank=16
        ).collect()
    }
    assert ivf == adc == {(1003, 3), (1017, 17)}


def test_replay_is_idempotent(spark, store):
    batches, _ = _batches(spark)
    for b, df in enumerate(batches):
        store.process_batch(df, batch_id=b)
    before = sorted(map(str, store.table().collect()))
    stats_before = sorted(map(str, store.stats().collect()))
    store.process_batch(batches[1], batch_id=1)  # replay
    assert sorted(map(str, store.table().collect())) == before
    assert sorted(map(str, store.stats().collect())) == stats_before


def test_drift_trigger_flags_moved_distribution(spark, store):
    """Batches drawn from the same distribution stay unflagged (the
    baseline is the trailing non-model batches, NOT the model batch's
    optimistically-biased self-fit); a batch of basis vectors — near-
    orthogonal to every trained centroid, assign-cos ~|c_j| instead of
    the in-distribution level — must trip the trigger."""
    batches, _ = _batches(spark)
    for b, df in enumerate(batches):
        store.process_batch(df, batch_id=b)
    assert store.drifted_batches() == []
    basis = []
    for i in range(20):
        v = [0.0] * DIM
        v[i % DIM] = 1.0
        basis.append((2000 + i, v))
    store.process_batch(_to_df(spark, basis), batch_id=9)
    assert store.drifted_batches() == [9]


def test_streaming_file_source_incremental(spark, store, tmp_path):
    """Checkpointed file-source drive: only new files are processed per
    availableNow trigger, and the final store equals the batch build."""
    from hoard_spark.ann import assign_cells, encode_pq, normalized

    src = tmp_path / "src"
    ck = str(tmp_path / "ck")
    batches, corpus = _batches(spark)
    batches[0].write.parquet(f"{src}/b0")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", "1000")
        .parquet(f"{src}/*")
    )
    store.sink(stream, ck).awaitTermination()
    assert store.table().count() == 20
    batches[1].write.parquet(f"{src}/b1")
    batches[2].write.parquet(f"{src}/b2")
    store.sink(stream, ck).awaitTermination()
    cents, books = store.model()
    batch_rows = sorted(
        map(
            str,
            encode_pq(
                assign_cells(normalized(corpus, persist=False), cents),
                books,
            )
            .select("vec_id", "v", "nrm", "cell", "pq")
            .collect(),
        )
    )
    assert sorted(map(str, store.table().collect())) == batch_rows


def test_training_batch_replay_keeps_model_flag(spark, store, tmp_path):
    """Crash-window replay (ADVICE r10): model written, stats + checkpoint
    lost. The replayed training batch must re-append its stats row with
    is_model_batch=True — derived from the batch id in the model sidecar,
    not from "no model yet" — so the drift baseline never absorbs the
    training batch's optimistically-biased self-fit."""
    import shutil

    batches, _ = _batches(spark)
    store.process_batch(batches[0], batch_id=0)
    shutil.rmtree(store.stats_path)  # simulate crash before stats commit
    # fresh instance: the replay must read the flag from the sidecar
    replayer = AnnIndexStore(spark, store.path)
    replayer.process_batch(batches[0], batch_id=0)
    rows = replayer.stats().collect()
    assert len(rows) == 1
    assert rows[0]["batch"] == 0 and rows[0]["is_model_batch"] is True
    # and the baseline logic still excludes it
    replayer.process_batch(batches[1], batch_id=1)
    replayer.process_batch(batches[2], batch_id=2)
    assert replayer.drifted_batches() == []


def test_stats_append_idempotent_per_batch(spark, store):
    """A replay whose stats row already exists skips the append — the raw
    stats parquet (no dedupe) holds exactly one row per batch."""
    batches, _ = _batches(spark)
    for b in range(3):
        store.process_batch(batches[b], batch_id=b)
    store.process_batch(batches[1], batch_id=1)  # replay
    store.process_batch(batches[2], batch_id=2)  # replay
    raw = spark.read.parquet(store.stats_path)
    counts = {
        r["batch"]: r["n"]
        for r in raw.groupBy("batch").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {0: 1, 1: 1, 2: 1}


def test_reingest_conflict_raises(spark, store):
    """Append-only invariant guard (ADVICE r10, mirroring the containment
    store): re-ingesting an existing vec_id with a DIFFERENT embedding
    raises before anything is written; a byte-identical replay passes."""
    batches, _ = _batches(spark)
    store.process_batch(batches[0], batch_id=0)
    before = sorted(map(str, store.table().collect()))
    with pytest.raises(ValueError, match="re-ingested with a different"):
        store.process_batch(
            _to_df(spark, [(0, _vec(999))]), batch_id=1
        )
    # nothing written by the rejected batch
    assert sorted(map(str, store.table().collect())) == before
    # byte-identical replay of vec_id 0 still passes the guard
    store.process_batch(_to_df(spark, [(0, _vec(0))]), batch_id=2)
    assert sorted(map(str, store.table().collect())) == before


def test_retrain_reencodes_store_equal_to_fresh_batch_build(spark, store):
    """retrain() contract (VERDICT r10 item 7): after a drift-flagged
    stream, the retrained store is ROW-FOR-ROW equal to a fresh batch
    build over the union corpus with the store's own new model (same
    equivalence pin as the incremental path, one model version later);
    the model version bumps; the drift baseline resets; searches over
    the retrained table still find a planted clone; and post-retrain
    batches keep maintaining under the new model."""
    from hoard_spark.ann import (
        assign_cells,
        encode_pq,
        normalized,
        search_ivf,
    )

    batches, corpus = _batches(spark)
    for b, df in enumerate(batches):
        store.process_batch(df, batch_id=b)
    basis = []
    for i in range(20):
        v = [0.0] * DIM
        v[i % DIM] = 1.0
        basis.append((2000 + i, v))
    store.process_batch(_to_df(spark, basis), batch_id=3)
    assert store.drifted_batches() == [3]

    new_ver = store.retrain()
    assert new_ver == 2 and store.model_version() == 2
    cents, books = store.model()

    union = corpus.unionByName(_to_df(spark, basis))
    batch_rows = sorted(
        map(
            str,
            encode_pq(
                assign_cells(normalized(union, persist=False), cents),
                books,
            )
            .select("vec_id", "v", "nrm", "cell", "pq")
            .collect(),
        )
    )
    assert sorted(map(str, store.table().collect())) == batch_rows
    # drift baseline reset: old-version stats say nothing about the new
    # geometry
    assert store.drifted_batches() == []

    # a fresh instance resolves the same version/table from the sidecar
    reopened = AnnIndexStore(spark, store.path)
    assert reopened.model_version() == 2
    assert reopened.table().count() == 80

    # post-retrain maintenance: a later batch with a clone of vector 5
    # appends under the new model and is searchable
    store.process_batch(_to_df(spark, [(1005, _vec(5))]), batch_id=4)
    table = store.table()
    probes = table.where(F.col("vec_id") == 1005).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("q_v"),
        F.col("nrm").alias("q_nrm"),
    )
    hits = {
        (r["q_id"], r["n_id"])
        for r in search_ivf(table, cents, probes, k=1, nprobe=6).collect()
    }
    assert hits == {(1005, 5)}


def test_retrain_is_idempotent_and_replay_safe(spark, store):
    """Re-running retrain on the same store regenerates the same next
    version deterministically, and a pre-retrain batch REPLAYED after
    retrain neither corrupts the table nor duplicates stats (same
    model → byte-identical rows → guard passes, dedupe absorbs)."""
    batches, _ = _batches(spark)
    for b, df in enumerate(batches):
        store.process_batch(df, batch_id=b)
    store.retrain()
    after = sorted(map(str, store.table().collect()))
    stats_after = sorted(map(str, store.stats().collect()))
    store.process_batch(batches[1], batch_id=1)  # pre-retrain replay
    assert sorted(map(str, store.table().collect())) == after
    assert sorted(map(str, store.stats().collect())) == stats_after


def test_maintain_retrains_when_flagged_and_noops_otherwise(spark, store):
    """maintain() policy hook (VERDICT r11 missing-item #3): below the
    min_flagged threshold it is a no-op; once the drift flags reach it,
    it runs the full retrain (version bump + re-encoded table + reset
    baseline) and an immediate second call no-ops at the new version —
    the detect->retrain loop is closed under the existing retrain pins."""
    batches, _ = _batches(spark)
    for b, df in enumerate(batches):
        store.process_batch(df, batch_id=b)
    assert store.maintain() is None          # nothing flagged
    assert store.model_version() == 1

    basis = []
    for i in range(20):
        v = [0.0] * DIM
        v[i % DIM] = 1.0
        basis.append((2000 + i, v))
    store.process_batch(_to_df(spark, basis), batch_id=3)
    assert store.drifted_batches() == [3]
    assert store.maintain(min_flagged=2) is None   # under threshold
    assert store.model_version() == 1

    new_ver = store.maintain(min_flagged=1)
    assert new_ver == 2 and store.model_version() == 2
    # baseline reset => fixpoint: the very next maintain() no-ops
    assert store.drifted_batches() == []
    assert store.maintain() is None
    assert store.model_version() == 2
