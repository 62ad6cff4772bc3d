"""Library-level curation pipeline (hoard_spark/pipeline.py).

The DataFrame-native API must agree with its conformance-query twins
(q35 pairs, q51 clusters, q67 canonical picks) on the same corpus —
same machinery, different entry point.
"""

import os

import pytest
from pyspark.sql import functions as F

from hoard_spark.pipeline import (
    cluster_assignments,
    dedup_corpus,
    neardup_pairs,
)
from hoard_spark.queries import release_caches
from hoard_spark.queries.llm import q35, q51, q67

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(autouse=True)
def _release():
    yield
    release_caches()


def test_pairs_match_query_twin(spark, docs):
    lib = {
        (r["a_id"], r["b_id"]) for r in neardup_pairs(docs).collect()
    }
    twin = {(r["a_id"], r["b_id"]) for r in q35(spark, SF_DIR).collect()}
    assert lib == twin and lib


def test_clusters_match_query_twin(spark, docs):
    lib = {
        (r["doc_id"], r["cluster_id"])
        for r in cluster_assignments(neardup_pairs(docs)).collect()
    }
    twin = {
        (r["doc_id"], r["cluster_id"])
        for r in q51(spark, SF_DIR).collect()
    }
    assert lib == twin and lib


def test_dedup_corpus_keeps_canonicals_only(spark, docs):
    kept, dropped = dedup_corpus(docs)
    n_docs = docs.count()
    n_kept, n_dropped = kept.count(), dropped.count()
    assert n_kept + n_dropped == n_docs
    assert n_dropped > 0  # this corpus has planted near-dups

    # dropped = cluster members minus one canonical per cluster,
    # and the canonicals are exactly q67's picks
    picks = {
        (r["cluster_id"], r["canonical_doc"])
        for r in q67(spark, SF_DIR).collect()
    }
    lib_picks = {
        (r["cluster_id"], r["canonical_doc"])
        for r in dropped.select("cluster_id", "canonical_doc")
        .distinct()
        .collect()
    }
    # every dropped cluster's canonical agrees with the query twin
    assert lib_picks <= picks
    # no canonical doc was dropped
    canon_ids = {c for _, c in picks}
    dropped_ids = {r["doc_id"] for r in dropped.collect()}
    assert not (canon_ids & dropped_ids)
    # kept retains the full schema
    assert kept.columns == docs.columns


def test_dedup_threshold_monotone(spark, docs):
    loose = neardup_pairs(docs, threshold=0.5).count()
    tight = neardup_pairs(docs, threshold=0.9).count()
    assert loose >= tight


def test_cc_pointer_doubling_converges_on_deep_chain(spark):
    """A 13-node path graph (diameter 12) must fully converge within
    max_iters=6: pointer doubling reaches distance ~2^r per round, while
    plain min-label propagation would need 12 rounds — this pins the
    O(log diameter) behavior, not just the fixpoint."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "a_id long, b_id long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in cluster_assignments(pairs, max_iters=6).collect()
    }
    assert got == {i: 0 for i in range(13)}, got


def test_cluster_artifact_reused_not_rebuilt(spark, docs):
    """Second consumer of the corpus cluster table must read the
    persisted artifact, never re-run the build (q67's contract)."""
    from hoard_spark.artifacts import get_or_build

    name = "test_reuse_probe"
    first = get_or_build(
        spark,
        SF_DIR,
        name,
        ("documents",),
        lambda: cluster_assignments(neardup_pairs(docs)),
    )
    n1 = first.count()

    def boom():
        raise AssertionError("artifact was rebuilt instead of reused")

    again = get_or_build(spark, SF_DIR, name, ("documents",), boom)
    assert again.count() == n1 > 0


def test_dedup_corpus_accepts_prebuilt_cluster_table(spark, docs):
    """Passing a materialized cluster table must give identical results
    to the inline computation (the q67 persisted-artifact composition)."""
    pre = cluster_assignments(neardup_pairs(docs))
    kept_a, dropped_a = dedup_corpus(docs)
    kept_b, dropped_b = dedup_corpus(docs, clusters=pre)
    assert kept_a.count() == kept_b.count()
    da = {(r["doc_id"], r["canonical_doc"]) for r in dropped_a.collect()}
    db = {(r["doc_id"], r["canonical_doc"]) for r in dropped_b.collect()}
    assert da == db


def test_cc_matches_union_find_on_random_graphs(spark):
    """cluster_assignments vs a pure-Python union-find on seeded random
    pair graphs — pins the fixpoint on shapes the corpus doesn't have
    (cycles, stars, disjoint chains, self-contained cliques)."""
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n_nodes, n_edges = 60, 45
        pairs = sorted(
            {
                tuple(sorted(rng.sample(range(n_nodes), 2)))
                for _ in range(n_edges)
            }
        )
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent[find(a)] = find(b)
        touched = {x for ab in pairs for x in ab}
        want = {
            x: min(y for y in touched if find(y) == find(x))
            for x in touched
        }
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in cluster_assignments(
                spark.createDataFrame(pairs, "a_id long, b_id long")
            ).collect()
        }
        assert got == want, f"seed {seed}: CC disagrees with union-find"


def test_get_or_build_through_uri_root(spark, tmp_path, monkeypatch):
    """The artifact cache must work against a Hadoop-FS URI root (here
    ``file://`` — same API surface as HDFS/S3A): build once, publish via
    FS rename, serve the parquet scan on reuse without rebuilding."""
    from hoard_spark.artifacts import get_or_build

    monkeypatch.setenv(
        "HOARD_SPARK_ARTIFACTS", f"file://{tmp_path}/artifacts"
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    ).write.parquet(str(sf / "documents.parquet"))

    calls = []

    def build():
        calls.append(1)
        return spark.range(3).withColumnRenamed("id", "doc_id")

    first = get_or_build(spark, str(sf), "probe", ("documents",), build)
    assert first.count() == 3 and calls == [1]

    def boom():
        raise AssertionError("artifact rebuilt instead of reused")

    again = get_or_build(spark, str(sf), "probe", ("documents",), boom)
    assert again.count() == 3


def test_fingerprint_uri_invalidated_on_rewrite(spark, tmp_path):
    """WarehouseFS-backed fingerprint must change when a directory-style
    parquet table is rewritten (mtime is ms-resolution through Hadoop, so
    the child summary carries the content signal too)."""
    import time as _t

    from hoard_spark.artifacts import corpus_fingerprint

    sf = tmp_path / "sf"
    sf.mkdir()
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(sf / "documents.parquet"))
    key1 = corpus_fingerprint(str(sf), ("documents",), spark)
    _t.sleep(0.05)
    df.union(df).write.mode("overwrite").parquet(
        str(sf / "documents.parquet")
    )
    key2 = corpus_fingerprint(str(sf), ("documents",), spark)
    assert key1 != key2


def test_artifact_invalidated_when_corpus_changes(spark, tmp_path):
    """Rewriting an input table must change the corpus fingerprint, so
    a stale artifact is never served for regenerated testdata."""
    from hoard_spark.artifacts import corpus_fingerprint

    sf = tmp_path / "sf"
    sf.mkdir()
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(sf / "documents.parquet"))
    key1 = corpus_fingerprint(str(sf), ("documents",))
    import time as _t

    _t.sleep(0.01)  # ensure mtime_ns advances across the rewrite
    df.write.mode("overwrite").parquet(str(sf / "documents.parquet"))
    key2 = corpus_fingerprint(str(sf), ("documents",))
    assert key1 != key2


def test_cc_driver_fast_path_equals_distributed(spark):
    """The bounded union-find fast path must produce exactly the
    distributed pointer-doubling fixpoint — chains (multi-hop label
    travel), merging components, and singleton-pair graphs."""
    rows = (
        # a 7-node chain ingested in arbitrary order
        [(6, 5), (1, 2), (3, 4), (2, 3), (5, 4), (7, 6)]
        # a separate triangle + an isolated pair
        + [(10, 11), (11, 12), (10, 12), (20, 21)]
    )
    pairs = spark.createDataFrame(rows, "a_id long, b_id long")
    fast = {
        (r["doc_id"], r["cluster_id"])
        for r in cluster_assignments(pairs).collect()
    }
    dist = {
        (r["doc_id"], r["cluster_id"])
        for r in cluster_assignments(pairs, driver_max_edges=0).collect()
    }
    assert fast == dist
    assert {c for _, c in fast} == {1, 10, 20}
