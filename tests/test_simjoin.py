"""Prefix-filtered set-similarity join: exactness + pruning pins."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from hoard_spark.simjoin import jaccard_similarity_join, prefix_length


def _corpus(seed: int, n_docs: int = 60, vocab: int = 40):
    """Random token docs over a small vocab (forces organic overlap)
    plus planted near-dup pairs at several similarity levels."""
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        n = rng.randint(5, 30)
        docs.append([f"w{rng.randrange(vocab)}" for _ in range(n)])
    # planted clones: identical, one-edit, half-rewritten
    docs.append(list(docs[0]))
    edited = list(docs[1])
    edited[len(edited) // 2] = "wEDIT"
    docs.append(edited)
    half = list(docs[2])
    for j in range(len(half) // 2):
        half[j] = f"x{j}"
    docs.append(half)
    return docs


def _shingle_sets(docs):
    out = {}
    for i, toks in enumerate(docs):
        if len(toks) >= 3:
            out[i] = {
                " ".join(toks[j : j + 3]) for j in range(len(toks) - 2)
            }
    return out


def _brute(sets, t):
    pairs = {}
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if union and inter / union >= t:
                pairs[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    return pairs


@pytest.mark.parametrize("seed", [3, 17])
@pytest.mark.parametrize("t", [0.3, 0.6, 0.9])
def test_simjoin_matches_brute_force(spark, seed, t):
    docs = _corpus(seed)
    sets = _shingle_sets(docs)
    sh = spark.createDataFrame(
        [(i, s) for i, ss in sets.items() for s in ss],
        "doc_id long, s string",
    )
    got = {
        (r["a_id"], r["b_id"]): (r["inter"], r["na"], r["nb"])
        for r in jaccard_similarity_join(sh, t).collect()
    }
    assert got == _brute(sets, t), (seed, t)


def test_simjoin_prunes_candidates(spark):
    """At a high threshold the prefix join must generate strictly fewer
    pair meetings than the full posting-list join — the point of the
    operator."""
    docs = _corpus(99, n_docs=80, vocab=30)
    sets = _shingle_sets(docs)
    sh = spark.createDataFrame(
        [(i, s) for i, ss in sets.items() for s in ss],
        "doc_id long, s string",
    )

    def meetings(rows):
        a = rows.select(F.col("doc_id").alias("a_id"), "s")
        b = rows.select(F.col("doc_id").alias("b_id"), "s")
        return (
            a.join(b, "s").where(F.col("a_id") < F.col("b_id")).count()
        )

    full = meetings(sh)

    from pyspark.sql import Window

    t = 0.8
    df_rank = sh.groupBy("s").agg(F.count("*").alias("_df"))
    ranked = sh.join(df_rank, "s").select(
        "doc_id",
        "s",
        F.row_number()
        .over(Window.partitionBy("doc_id").orderBy("_df", "s"))
        .alias("_r"),
        F.count("*").over(Window.partitionBy("doc_id")).alias("_n"),
    )
    prefix = ranked.where(
        F.col("_r") <= F.col("_n") - F.ceil(F.lit(t) * F.col("_n")) + 1
    )
    pruned = meetings(prefix.select("doc_id", "s"))
    assert pruned < full / 2, (pruned, full)

    # the positional filter (PPJoin) must prune strictly beyond the
    # prefix meeting count: replicate the candidate join's predicates
    # (length + positional) over the same prefix rows
    a = prefix.select(
        F.col("doc_id").alias("a_id"), "s",
        F.col("_n").alias("_na"), F.col("_r").alias("_ra"),
    )
    b = prefix.select(
        F.col("doc_id").alias("b_id"), "s",
        F.col("_n").alias("_nb"), F.col("_r").alias("_rb"),
    )
    required = F.lit(t / (1.0 + t)) * (F.col("_na") + F.col("_nb")) - 1e-9
    positional = (
        a.join(b, "s")
        .where(
            (F.col("a_id") < F.col("b_id"))
            & (F.col("_na") >= F.lit(t) * F.col("_nb") - 1e-9)
            & (F.col("_nb") >= F.lit(t) * F.col("_na") - 1e-9)
            & (
                F.lit(1)
                + F.least(
                    F.col("_na") - F.col("_ra"), F.col("_nb") - F.col("_rb")
                )
                >= required
            )
        )
        .count()
    )
    assert positional < pruned, (positional, pruned)


def test_prefix_length_bound():
    assert prefix_length(10, 0.8) == 3
    assert prefix_length(10, 0.5) == 6
    assert prefix_length(1, 1.0) == 1


def test_simjoin_rejects_bad_threshold(spark):
    sh = spark.createDataFrame([(1, "a b c")], "doc_id long, s string")
    for t in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            jaccard_similarity_join(sh, t)


def _brute_topk(sets, k):
    scored = []
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if union:
                scored.append((round(inter / union, 4), a, b))
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    return scored[:k]


def test_topk_ladder_matches_brute_force(spark):
    """topk_similar_pairs: the rung that yields >= k pairs contains the
    exact global top-k (prefix-filter completeness), so the result must
    equal brute force — on a corpus whose top-k IS above the floor."""
    from hoard_spark.simjoin import topk_similar_pairs

    docs = _corpus(7)  # planted clone + one-edit + half-rewrite pairs
    sets = _shingle_sets(docs)
    sh = spark.createDataFrame(
        [(i, s) for i, ss in sets.items() for s in ss],
        "doc_id long, s string",
    )
    k = 3
    got = [
        (r["jaccard"], r["a_id"], r["b_id"])
        for r in topk_similar_pairs(sh, k).collect()
    ]
    assert got == _brute_topk(sets, k), got


def test_topk_ladder_raises_below_floor(spark):
    """A corpus whose kth-best similarity is under every rung must be
    surfaced as a contract problem, not silently brute-forced."""
    from hoard_spark.simjoin import topk_similar_pairs

    # disjoint vocabularies -> all pairwise Jaccard = 0
    sh = spark.createDataFrame(
        [(i, f"tok{i}-{j}") for i in range(6) for j in range(5)],
        "doc_id long, s string",
    )
    with pytest.raises(ValueError, match="ladder floor"):
        topk_similar_pairs(sh, 2)


def _brute_containment(sets, t, min_size):
    out = {}
    for a in sets:
        if len(sets[a]) < min_size:
            continue
        for b in sets:
            if a == b:
                continue
            inter = len(sets[a] & sets[b])
            if inter / len(sets[a]) >= t:
                out[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    return out


@pytest.mark.parametrize("seed", [5, 23])
@pytest.mark.parametrize("t", [0.6, 0.9])
def test_containment_join_matches_brute_force(spark, seed, t):
    """Directed containment pairs — including planted truncations whose
    Jaccard is far below the threshold — match the quadratic brute
    force exactly (no false negatives from the A-side prefix filter)."""
    from hoard_spark.simjoin import containment_join

    docs = _corpus(seed)
    # planted truncations: first 60% of tokens of a few docs
    for i in (0, 4, 8):
        src = docs[i]
        docs.append(src[: max(3, (6 * len(src)) // 10)])
    sets = _shingle_sets(docs)
    sh = spark.createDataFrame(
        [(i, s) for i, ss in sets.items() for s in ss],
        "doc_id long, s string",
    )
    got = {
        (r["a_id"], r["b_id"]): (r["inter"], r["na"], r["nb"])
        for r in containment_join(sh, t, min_size=4).collect()
    }
    expect = _brute_containment(sets, t, 4)
    assert got == expect, (seed, t)
    # the planted truncations must be found as contained in their source
    if t <= 1.0:
        n_planted = len(docs) - 3
        for off, src in zip(range(n_planted, len(docs)), (0, 4, 8)):
            if off in sets and len(sets[off]) >= 4:
                assert (off, src) in got


def test_containment_join_is_directional(spark):
    """A strict truncation is contained in its source, never the
    reverse (containment(B->A) = |A∩B|/|B| < t for a short A)."""
    from hoard_spark.simjoin import containment_join

    full = [f"t{i}" for i in range(30)]
    trunc = full[:12]
    sets = _shingle_sets([full, trunc])
    sh = spark.createDataFrame(
        [(i, s) for i, ss in sets.items() for s in ss],
        "doc_id long, s string",
    )
    got = {
        (r["a_id"], r["b_id"]): r["containment"]
        for r in containment_join(sh, 0.9).collect()
    }
    assert got == {(1, 0): 1.0}


def test_precomputed_ranks_match_built_ranks(spark):
    """Passing a pre-ranked table (the shingle artifact path) must give
    byte-identical results to the build-the-ranks-inline path for both
    joins — including when a filtered subset carries a stale-but-
    single-valued _df and only re-ranks itself (the q98 shape), and
    when new docs with their own df enter the order (the q90 shape)."""
    from hoard_spark.simjoin import (
        containment_join,
        jaccard_similarity_join,
        rank_shingle_rows,
    )

    docs = _corpus(11)
    sets = _shingle_sets(docs)
    sh = spark.createDataFrame(
        [(i, s) for i, ss in sets.items() for s in ss],
        "doc_id long, s string",
    )
    ranked = rank_shingle_rows(sh)
    for t in (0.4, 0.8):
        plain = {
            (r["a_id"], r["b_id"]): (r["inter"], r["na"], r["nb"])
            for r in jaccard_similarity_join(sh, t).collect()
        }
        pre = {
            (r["a_id"], r["b_id"]): (r["inter"], r["na"], r["nb"])
            for r in jaccard_similarity_join(ranked, t).collect()
        }
        assert pre == plain, t
        plainc = {
            (r["a_id"], r["b_id"]): r["containment"]
            for r in containment_join(sh, t, min_size=4).collect()
        }
        prec = {
            (r["a_id"], r["b_id"]): r["containment"]
            for r in containment_join(ranked, t, min_size=4).collect()
        }
        assert prec == plainc, t

    # q98 shape: clone = filtered subset of a ranked base, re-ranked with
    # carried _df; exactness vs the all-inline build on the same union
    half = ranked.where(F.col("_r") % 2 == 1).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "s", "_df"
    )
    aug = ranked.select("doc_id", "s", "_df", "_r", "_n").unionByName(
        rank_shingle_rows(half)
    )
    aug_plain = aug.select("doc_id", "s")
    got = {
        (r["a_id"], r["b_id"]): r["containment"]
        for r in containment_join(aug, 0.6, min_size=4).collect()
    }
    want = {
        (r["a_id"], r["b_id"]): r["containment"]
        for r in containment_join(aug_plain, 0.6, min_size=4).collect()
    }
    assert got == want


def test_rank_shingle_rows_intrinsic_to_doc(spark):
    """_r/_n are intrinsic to (the doc's rows, the order key): ranking a
    doc's rows alone — with its _df carried — reproduces the ranks the
    doc got inside the full corpus ranking, which is what lets augmented
    corpora re-rank only their new docs."""
    from hoard_spark.simjoin import rank_shingle_rows

    docs = _corpus(23)
    sets = _shingle_sets(docs)
    sh = spark.createDataFrame(
        [(i, s) for i, ss in sets.items() for s in ss],
        "doc_id long, s string",
    )
    ranked = rank_shingle_rows(sh)
    one = ranked.where(F.col("doc_id") == 2).select("doc_id", "s", "_df")
    rer = rank_shingle_rows(one)
    got = {
        (r["s"]): (r["_r"], r["_n"]) for r in rer.collect()
    }
    want = {
        (r["s"]): (r["_r"], r["_n"])
        for r in ranked.where(F.col("doc_id") == 2).collect()
    }
    assert got == want
