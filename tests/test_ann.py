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
    normalized,
    queries_from,
    search_exact,
    search_ivf,
    train_centroids,
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
