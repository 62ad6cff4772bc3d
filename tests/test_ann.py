"""Library-level ANN API (hoard_spark/ann.py).

Same machinery as the conformance twins (q38 exact, q39 IVF), exposed
over any embeddings DataFrame — so the library results must agree with
the query twins on the same corpus, and IVF recall must clear the same
floor the q39 contract pins.
"""

import os

import pytest
from pyspark.sql import functions as F

from hoard_spark.ann import (
    assign_cells,
    encode_pq,
    normalized,
    queries_from,
    search_exact,
    search_ivf,
    search_ivf_pq,
    train_centroids,
    train_pq_codebooks,
)
from hoard_spark.queries import all_queries, release_caches

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
REG = all_queries()


@pytest.fixture(autouse=True)
def _release():
    yield
    release_caches()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_exact_search_matches_query_twin(spark, emb):
    n = normalized(emb)
    lib = {
        (r["q_id"], r["n_id"], r["rn"])
        for r in search_exact(n, queries_from(n, range(10)), k=3).collect()
    }
    twin = {
        (r["q_id"], r["n_id"], r["rn"])
        for r in REG["q38_knn_exact"].spark_fn(spark, SF_DIR).collect()
    }
    assert lib == twin and lib


def test_ivf_recall_vs_exact(spark, emb):
    n = normalized(emb)
    cents = train_centroids(n)
    assigned = assign_cells(n, cents)
    qs = queries_from(n, range(10))
    exact = {
        (r["q_id"], r["n_id"]) for r in search_exact(n, qs, k=3).collect()
    }
    ann = {
        (r["q_id"], r["n_id"])
        for r in search_ivf(assigned, cents, qs, k=3, nprobe=6).collect()
    }
    assert exact
    assert len(exact & ann) / len(exact) >= 0.95


def test_every_vector_gets_exactly_one_cell(spark, emb):
    n = normalized(emb)
    cents = train_centroids(n, k=8)
    assigned = assign_cells(n, cents)
    assert assigned.count() == n.count()
    cells = {
        r["cell"] for r in assigned.select("cell").distinct().collect()
    }
    assert cells <= set(range(8)) and cells


def test_external_queries_not_in_corpus(spark, emb):
    """Search with query vectors that are NOT corpus members — the
    library contract pipeline twins can't cover (q38/q39 query the
    corpus itself)."""
    n = normalized(emb)
    cents = train_centroids(n)
    assigned = assign_cells(n, cents)
    ext = (
        n.where(F.col("vec_id") < 5)
        .select(
            (F.col("vec_id") + 1_000_000).alias("q_id"),
            F.col("v").alias("q_v"),
            F.col("nrm").alias("q_nrm"),
        )
    )
    got = search_ivf(assigned, cents, ext, k=3).collect()
    assert {r["q_id"] for r in got} == {1_000_000 + i for i in range(5)}
    # the query vector IS a corpus member under another id, so its own
    # copy must come back as the top hit with cos = 1.0
    top = {r["q_id"]: (r["n_id"], r["cos"]) for r in got if r["rn"] == 1}
    for q_id, (n_id, cos) in top.items():
        assert n_id == q_id - 1_000_000 and cos == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# IVF-PQ (product-quantized codes + ADC + exact rerank)
# ---------------------------------------------------------------------------


def test_pq_codebooks_deterministic_shape(spark, emb):
    n = normalized(emb)
    b1 = train_pq_codebooks(n, m=8, ks=16)
    b2 = train_pq_codebooks(n, m=8, ks=16)
    assert b1 == b2  # bounded ordered sample + numpy float64 => bit-stable
    assert len(b1) == 8 and all(len(bj) == 16 for bj in b1)
    dim = len(n.select("v").first()["v"])
    assert all(len(cw) == dim // 8 for bj in b1 for cw in bj)


def test_pq_codes_pack_into_one_word(spark, emb):
    """The storage contract the whole feature exists for: every vector's
    code is ONE long in [0, 2^32) — 4 bits x 8 subspaces — vs 8 bytes x
    dim for the raw doubles."""
    n = normalized(emb)
    books = train_pq_codebooks(n)
    enc = encode_pq(n, books)
    assert dict(enc.dtypes)["pq"] == "bigint"
    bounds = enc.agg(
        F.min("pq").alias("lo"), F.max("pq").alias("hi")
    ).first()
    assert 0 <= bounds["lo"] <= bounds["hi"] < 2**32
    # codes must discriminate: a corpus of random vectors can't collapse
    # to a handful of distinct codes
    assert enc.select("pq").distinct().count() > enc.count() // 2


def test_assign_encode_batch_bit_identical(spark, emb):
    """The Arrow-batch index-build pass (r13 optimization — replaces the
    interpreted-HOF expression battery in ``materialized_index``) must
    reproduce ``encode_pq(assign_cells(...))`` EXACTLY: same cell, same
    packed pq word, per vector — the numpy folds accumulate in the same
    left-to-right order, so equality is bitwise, not approximate. The
    stored ``lsh16`` signature (r13) must likewise equal the in-plan
    ``lsh_signature`` word exactly, so bands derived from either side
    agree on every vector."""
    from hoard_spark.ann import (
        assign_encode_batch,
        hyperplanes,
        lsh_signature,
    )

    n = normalized(emb, keep=["label"])
    cents = train_centroids(n)
    books = train_pq_codebooks(n)
    dim = len(n.select("v").first()["v"])
    planes = hyperplanes(dim, h=16, seed=7)
    expr_rows = {
        r["vec_id"]: (r["cell"], r["pq"], r["label"], r["sig"])
        for r in encode_pq(assign_cells(n, cents), books)
        .withColumn("sig", lsh_signature(planes, "v"))
        .select("vec_id", "cell", "pq", "label", "sig")
        .collect()
    }
    batch_rows = {
        r["vec_id"]: (r["cell"], r["pq"], r["label"], r["lsh16"])
        for r in assign_encode_batch(n, cents, books)
        .select("vec_id", "cell", "pq", "label", "lsh16")
        .collect()
    }
    assert expr_rows == batch_rows and len(expr_rows) == emb.count()


def test_pq_planted_clone_is_exact_top1(spark, emb):
    """The q91 conformance contract at library level: an exact clone's
    source must come back as top-1 with cos == 1.0 from the 4-bit-code
    scan (clone_u == source_u, so the source is the clone's global ADC
    argmax; the exact rerank pins the cosine)."""
    clones = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    ).where(F.col("vec_id") % 100 == 0)
    n = normalized(emb.select("vec_id", "embedding").unionByName(clones))
    cents = train_centroids(n)
    books = train_pq_codebooks(n)
    enc = encode_pq(assign_cells(n, cents), books)
    probes = n.where(F.col("vec_id") >= 1_000_000).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("q_v"),
        F.col("nrm").alias("q_nrm"),
    )
    got = search_ivf_pq(
        enc, n, cents, books, probes, k=1, nprobe=6, rerank=32
    ).collect()
    assert got and len(got) == probes.count()
    for r in got:
        assert r["n_id"] == r["q_id"] - 1_000_000
        assert r["cos"] == pytest.approx(1.0)


def test_filtered_search_is_prefilter_exact(spark, emb):
    """Filtered ANN (`where=`) must behave as PRE-filter: the top-k is
    taken over the corpus rows passing the predicate — equal to brute
    force over the filtered corpus (post-filtering a top-k under-fills
    k when good neighbors fail the predicate). Both the IVF and the
    IVF-PQ paths; rerank deep enough that the ADC cut is exhaustive."""
    n = normalized(emb)
    cents = train_centroids(n)
    books = train_pq_codebooks(n)
    assigned = assign_cells(n, cents)
    qs = queries_from(n, range(10))
    pred = (F.col("vec_id") % 2 == 0) & (F.col("vec_id") >= 10)
    want = {
        (r["q_id"], r["rn"], r["n_id"])
        for r in search_exact(n.where(pred), qs, k=3).collect()
    }
    ivf = {
        (r["q_id"], r["rn"], r["n_id"])
        for r in search_ivf(
            assigned, cents, qs, k=3, nprobe=8, where=pred
        ).collect()
    }
    pq = {
        (r["q_id"], r["rn"], r["n_id"])
        for r in search_ivf_pq(
            encode_pq(assigned, books), n, cents, books, qs,
            k=3, nprobe=8, rerank=10**6, where=pred,
        ).collect()
    }
    assert want and ivf == want and pq == want


def test_lsh_clone_is_exact_top1_and_recall_floor(spark, emb):
    """LSH-bucketed search (search_lsh): a verbatim clone shares every
    signature band with its source, so the source MUST come back as
    top-1 with cos = 1.0 (the q93 conformance contract); and for
    genuine neighbors the band recall vs the exact baseline must clear
    a floor at the default h=16/bands=2 setting."""
    from hoard_spark.ann import search_lsh

    clones = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    ).where(F.col("vec_id") % 100 == 0)
    n = normalized(emb.select("vec_id", "embedding").unionByName(clones))
    probes = n.where(F.col("vec_id") >= 1_000_000).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("q_v"),
        F.col("nrm").alias("q_nrm"),
    )
    got = search_lsh(n, probes, k=1).collect()
    assert len(got) == probes.count() and got
    for r in got:
        assert r["n_id"] == r["q_id"] - 1_000_000
        assert r["cos"] == pytest.approx(1.0)
    # high-similarity recall floor: NOISY clones (multiplicative ±10%
    # perturbation => cos ~0.99 to the source) must still find their
    # source as top-1 most of the time at the default h=16/bands=2.
    # (LSH banding is a HIGH-similarity retriever — at cos ~0.4, the
    # typical nearest neighbor of this random corpus, band collision
    # probability is ~5%, which is why weak-similarity kNN belongs to
    # the IVF paths; see search_lsh's docstring.)
    noisy = emb.where(F.col("vec_id") % 100 == 0).select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> x * (1.0D + 0.1D * "
            "sin(CAST(vec_id AS DOUBLE) * 0.7D + CAST(i AS DOUBLE))))"
        ).alias("embedding"),
    )
    base = normalized(emb.select("vec_id", "embedding").unionByName(noisy))
    nprobes = base.where(F.col("vec_id") >= 2_000_000).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("q_v"),
        F.col("nrm").alias("q_nrm"),
    )
    hits = search_lsh(base, nprobes, k=1).collect()
    n_probes = nprobes.count()
    found = sum(1 for r in hits if r["n_id"] == r["q_id"] - 2_000_000)
    assert found / n_probes >= 0.6, (found, n_probes)


def test_materialized_index_builds_once_and_reuses(
    spark, emb, tmp_path, monkeypatch
):
    """The corpus-keyed index artifact (materialized_index): first call
    trains + encodes and persists; a second call must NOT re-run the
    corpus builder (poisoned builder proves it) and must return the
    identical model and search results — the q39/q91 sharing contract."""
    from hoard_spark.ann import materialized_index

    monkeypatch.setenv("HOARD_SPARK_ARTIFACTS", str(tmp_path))
    calls = {"n": 0}

    def builder():
        calls["n"] += 1
        return emb.select("vec_id", "embedding")

    t1, c1, b1 = materialized_index(spark, SF_DIR, builder, name="t")
    assert calls["n"] >= 1
    # the artifact table must agree with the directly-built index
    n = normalized(emb)
    direct = assign_cells(n, c1)
    qs = queries_from(n, range(5))
    want = {
        (r["q_id"], r["rn"], r["n_id"])
        for r in search_ivf(direct, c1, qs, k=3).collect()
    }
    got1 = {
        (r["q_id"], r["rn"], r["n_id"])
        for r in search_ivf(t1, c1, qs, k=3).collect()
    }
    assert want and got1 == want

    def poisoned():
        raise AssertionError("corpus builder re-ran on a warm store")

    t2, c2, b2 = materialized_index(spark, SF_DIR, poisoned, name="t")
    assert c2 == c1 and b2 == b1
    got2 = {
        (r["q_id"], r["rn"], r["n_id"])
        for r in search_ivf(t2, c2, qs, k=3).collect()
    }
    assert got2 == want
    # and the ADC path over the same artifact agrees at full rerank depth
    pq = {
        (r["q_id"], r["rn"], r["n_id"])
        for r in search_ivf_pq(
            t2, t2, c2, b2, qs, k=3, rerank=10**6
        ).collect()
    }
    assert pq == want


def test_pq_rerank_reproduces_uncompressed_ivf(spark, emb):
    """With enough rerank depth the ADC cut keeps the probed cells' true
    top-k, so IVF-PQ == IVF exactly (same probing, same ranking). Depth
    128 reproduces search_ivf at this corpus; q91 runs depth 32 because
    its planted probes need only the guaranteed ADC argmax."""
    n = normalized(emb)
    cents = train_centroids(n)
    books = train_pq_codebooks(n)
    assigned = assign_cells(n, cents)
    qs = queries_from(n, range(10))
    ivf = {
        (r["q_id"], r["rn"], r["n_id"])
        for r in search_ivf(assigned, cents, qs, k=3, nprobe=6).collect()
    }
    pq = {
        (r["q_id"], r["rn"], r["n_id"])
        for r in search_ivf_pq(
            encode_pq(assigned, books), n, cents, books, qs,
            k=3, nprobe=6, rerank=128,
        ).collect()
    }
    assert ivf and pq == ivf


def test_lsh_plan_build_is_job_free_with_dim(spark, emb):
    """VERDICT r8 item 5: with ``dim`` given, ``search_lsh`` must build
    its plan WITHOUT firing a Spark job (the old ``first()`` dim probe
    was a driver action at plan-construction time). Jobs are counted in
    a dedicated job group, the same exact-count pattern as
    tests/test_propagate_scale.py."""
    from hoard_spark.ann import search_lsh

    n = normalized(emb.select("vec_id", "embedding"))
    probes = n.limit(2).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("q_v"),
        F.col("nrm").alias("q_nrm"),
    )
    sc = spark.sparkContext
    group = "lsh-planbuild-jobcount"
    sc.setJobGroup(group, "search_lsh plan construction must be job-free")
    try:
        plan = search_lsh(n, probes, k=1, dim=64)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.description", None)
    jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    assert jobs == 0, f"plan construction fired {jobs} job(s)"
    assert plan.columns == ["q_id", "n_id", "cos", "rn"]


def test_lsh_empty_prefiltered_corpus_needs_dim(spark, emb):
    """Without ``dim``, an empty (pre-filtered) corpus has no row for
    the fallback probe to read — the API must raise a clear error, not
    crash on None; with ``dim`` the same search plans fine and returns
    empty."""
    from hoard_spark.ann import search_lsh

    n = normalized(emb.select("vec_id", "embedding"))
    probes = n.limit(1).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("q_v"),
        F.col("nrm").alias("q_nrm"),
    )
    pred = F.col("vec_id") < 0  # empties the corpus
    with pytest.raises(ValueError, match="dim"):
        search_lsh(n, probes, k=1, where=pred)
    assert search_lsh(n, probes, k=1, where=pred, dim=64).count() == 0
