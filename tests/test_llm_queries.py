"""Engine-only guarantees of the LLM-pipeline queries (VERDICT r1 bar):

- the ANN path (q39 IVF) must reach recall@3 >= 0.9 against the exact
  brute-force baseline (q38),
- the MinHash-LSH path (q35) must recover every exact-Jaccard>=0.7 pair
  (recall >= 0.9) without an all-pairs plan,
- near-dup plans must be bucket joins: no CartesianProduct / broadcast
  nested-loop anywhere in q35/q36,
- approx_count_distinct stays within 5% of exact (SURVEY §2C Q16 smoke).
"""

import os

import pytest
from pyspark.sql import functions as F

from hoard_spark.queries import all_queries, load

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")

REG = all_queries()


SF_T2 = os.environ.get("SPARK_GRAFT_T2_SF_DIR", "/root/testdata/sf0.01")


@pytest.mark.parametrize(
    "sf_dir,floor", [(SF_SMOKE, 0.9), (SF_T2, 0.95)]
)
def test_ann_ivf_recall_vs_exact(spark, sf_dir, floor):
    """k-means IVF (r3): recall@3 >= 0.95 at sf0.01 (VERDICT r2 stretch).

    Uses the genuine-neighbor contract (``ann_ivf_topk``): q39 itself is
    the oracle-checked planted-probe form since r8, so the approximate
    recall pin lives here, on the same machinery."""
    from hoard_spark.queries.llm import ann_ivf_topk

    exact = {
        (r["q_id"], r["n_id"])
        for r in REG["q38_knn_exact"].spark_fn(spark, sf_dir).collect()
    }
    ann = {
        (r["q_id"], r["n_id"])
        for r in ann_ivf_topk(spark, sf_dir).collect()
    }
    assert exact, "exact baseline returned nothing"
    recall = len(exact & ann) / len(exact)
    assert recall >= floor, f"IVF recall@3 {recall:.2f} < {floor}"


def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    docs = (
        load(spark, SF_SMOKE, "documents")
        .withColumn("toks", F.split(F.trim("text"), " +"))
        .where(F.size("toks") >= 3)
        .select(
            "doc_id",
            F.expr(
                "array_distinct(transform(sequence(1, size(toks) - 2), "
                "i -> concat_ws(' ', element_at(toks, CAST(i AS INT)), "
                "element_at(toks, CAST(i + 1 AS INT)), "
                "element_at(toks, CAST(i + 2 AS INT)))))"
            ).alias("sh"),
        )
        .persist()
    )
    a = docs.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("sh_a"))
    b = docs.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    # all-pairs ground truth: fine at sf0.001 (test-only, never the engine path)
    exact = {
        (r["a_id"], r["b_id"])
        for r in a.crossJoin(b)
        .where(F.col("a_id") < F.col("b_id"))
        .where(inter / union >= 0.7)
        .collect()
    }
    got = {
        (r["a_id"], r["b_id"])
        for r in REG["q35_minhash_neardup"].spark_fn(spark, SF_SMOKE).collect()
    }
    assert exact, "no exact near-dup pairs in fixture"
    recall = len(exact & got) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.2f} < 0.9"
    assert got <= exact, "LSH emitted a pair below the Jaccard threshold"


@pytest.mark.parametrize(
    "qname",
    [
        "q35_minhash_neardup",
        "q36_simhash_neardup",
        "q37_ngram_jaccard_topk",
        "q47_embedding_neardup",
        "q79_simjoin_threshold",
        "q90_topk_simjoin_ladder",
    ],
)
def test_neardup_plans_are_bucket_joins(spark, qname):
    df = REG[qname].spark_fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{qname} plans an all-pairs join"
    assert "BroadcastNestedLoopJoin" not in plan, (
        f"{qname} plans a nested-loop join"
    )


def test_q37_join_is_shingle_bucketed_not_block_quadratic(spark):
    """q37's self-join keys must include the shingle column — a join on
    (lang, source) alone is quadratic within each block (the round-2
    scale-killer VERDICT flagged)."""
    df = REG["q37_ngram_jaccard_topk"].spark_fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if any(j in line for j in ("SortMergeJoin", "ShuffledHashJoin",
                                   "BroadcastHashJoin")):
            if "lang#" in line:
                assert "s#" in line, (
                    "join blocked only on (lang, source):\n" + line
                )


def test_approx_count_distinct_smoke(spark):
    orders = load(spark, SF_SMOKE, "orders")
    row = orders.agg(
        F.countDistinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey").alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] <= 0.05


def test_embedding_neardup_on_planted_clones(spark, tmp_path):
    """The testdata embeddings contain no cos>=0.99 pairs (max pairwise
    cosine ~0.6), so q47's oracle row is a correct-but-empty match. This
    test plants real near-duplicates and pins recall AND precision of the
    LSH pipeline against an exact numpy ground truth."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(100, 64))
    clones = base[:10] + rng.normal(scale=0.01, size=(10, 64))  # cos ~0.9999
    vecs = np.vstack([base, clones]).astype(np.float32)
    rows = [
        (i, [float(x) for x in v], int(i % 10)) for i, v in enumerate(vecs)
    ]
    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(sf_dir / "embeddings.parquet"))

    norm = vecs / np.linalg.norm(vecs.astype(np.float64), axis=1, keepdims=True)
    cos = norm @ norm.T
    expect = {
        (a, b)
        for a in range(len(vecs))
        for b in range(a + 1, len(vecs))
        if cos[a, b] >= 0.99
    }
    assert len(expect) >= 10

    got = {
        (r["a_id"], r["b_id"])
        for r in REG["q47_embedding_neardup"]
        .spark_fn(spark, str(sf_dir))
        .collect()
    }
    assert got == expect


def test_rp_band_hashes_match_expression_form(spark):
    """The Arrow-built sign-word artifact (r13) must yield EXACTLY the
    band hashes the interpreted literal-matrix expression form produced:
    the numpy projection folds accumulate in the same ascending-d order
    with the same >= 0 threshold, and the band xxhash64 consumes the
    same 16 int bits — so (vec_id, band_id, band_hash) rows are equal
    as sets, which pins q47's candidate pairs unchanged."""
    from hoard_spark.ann import _lit_matrix
    from hoard_spark.queries.llm import (
        _RP_BANDS,
        _RP_PLANES,
        _emb_norm,
        _rp_bands,
        _rp_signs,
    )

    n = _emb_norm(spark, SF_SMOKE).select("vec_id", "v")
    dim = len(n.select("v").first()["v"])
    signs = _rp_signs(spark, dim)
    projs = F.transform(
        _lit_matrix(signs),
        lambda s: F.aggregate(
            F.zip_with(s, F.col("v"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    bits = _RP_PLANES // _RP_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    *[
                        (F.element_at("s", b * bits + r + 1) >= 0).cast(
                            "int"
                        )
                        for r in range(bits)
                    ]
                ).alias("band_hash"),
            )
            for b in range(_RP_BANDS)
        ]
    )
    expr_rows = {
        (r["vec_id"], r["band_id"], r["band_hash"])
        for r in n.select("vec_id", projs.alias("s"))
        .select("vec_id", F.explode(bands).alias("band"))
        .select("vec_id", "band.band_id", "band.band_hash")
        .collect()
    }
    art_rows = {
        (r["vec_id"], r["band_id"], r["band_hash"])
        for r in _rp_bands(spark, SF_SMOKE).collect()
    }
    assert art_rows == expr_rows and len(art_rows) > 0


def test_q100_probe_keys_match_expression_form(spark):
    """The materialized probe-key frame (r14) must yield EXACTLY the
    (q_id, q_v, q_nrm, lut, tag, key) rows the in-plan expression form
    produced: the numpy build mirrors every fold order (ascending-j
    dots, (-sim, c_id) cell ordering, packed sign word, ascending-t LUT
    dots over q_v/q_nrm), so q100's candidate sets and ADC ranking are
    unchanged bit for bit. The artifact is purged first so the test
    always exercises the CURRENT build path, never a previously
    materialized parquet (ADVICE r13)."""
    from hoard_spark.ann import (
        _bands,
        centroid_sims,
        hyperplanes,
        lsh_signature,
        pq_lut,
    )
    from hoard_spark.artifacts import (
        _join,
        artifacts_root,
        corpus_fingerprint,
    )
    from hoard_spark.fsutil import WarehouseFS
    from hoard_spark.queries.llm import (
        _ANN_STEP,
        _EMB_DIM,
        _RECALL_EPS,
        _RECALL_QOFF,
        _RECALL_RES,
        _ANN_OFFSET,
        _DOT,
        _planted_index,
        _q100_probe_keys,
    )

    sf_dir = SF_SMOKE
    nprobe = 6
    fs = WarehouseFS(spark)
    path = _join(
        artifacts_root(),
        corpus_fingerprint(sf_dir, ("embeddings",), spark),
        f"q100_probe_keys_np{nprobe}",
    )
    if fs.exists(path):
        fs.rmtree(path)

    table, cents, books = _planted_index(spark, sf_dir)
    probe_src = (F.col("vec_id") < _ANN_OFFSET) & (
        F.col("vec_id") % _ANN_STEP == _RECALL_RES
    )
    art = _q100_probe_keys(
        spark, sf_dir, table, cents, books, nprobe, probe_src
    )

    # the pre-r14 expression form, verbatim
    q_v = F.concat(
        F.array(F.get("v", 0) + F.lit(_RECALL_EPS) * F.col("nrm")),
        F.expr("slice(v, 2, size(v) - 1)"),
    )
    probes = (
        table.where(probe_src)
        .select(
            (F.col("vec_id") + F.lit(_RECALL_QOFF)).alias("q_id"),
            q_v.alias("q_v"),
        )
        .withColumn("q_nrm", F.sqrt(F.expr(_DOT.format(a="q_v", b="q_v"))))
    )
    H, BANDS = 16, 4
    band_bits = H // BANDS
    planes = hyperplanes(_EMB_DIM, h=H, seed=7)

    def band_keys(sig):
        return F.transform(
            _bands(sig, BANDS, band_bits),
            lambda b: b["band_i"].cast("long") * (1 << band_bits)
            + b["band_v"],
        )

    def tagged(tag, key):
        return F.struct(
            F.lit(tag).alias("tag"), key.cast("long").alias("key")
        )

    pc = F.slice(
        F.array_sort(
            F.transform(
                centroid_sims(cents, vec="q_v", nrm="q_nrm"),
                lambda s, i: F.struct((-s).alias("ns"), i.alias("c_id")),
            )
        ),
        1,
        nprobe,
    )
    expr_pk = probes.select(
        "q_id",
        "q_v",
        "q_nrm",
        pq_lut(books).alias("lut"),
        F.inline(
            F.concat(
                F.transform(pc, lambda c: tagged("pq", c["c_id"])),
                F.transform(pc, lambda c: tagged("flt", c["c_id"])),
                F.transform(
                    band_keys(lsh_signature(planes, "q_v")),
                    lambda k: tagged("lsh", k),
                ),
            )
        ),
    )

    def rows_of(df):
        return sorted(
            (
                r["q_id"],
                tuple(r["q_v"]),
                r["q_nrm"],
                tuple(tuple(b) for b in r["lut"]),
                r["tag"],
                r["key"],
            )
            for r in df.collect()
        )

    got, want = rows_of(art), rows_of(expr_pk)
    assert len(got) > 0 and got == want


def test_q50_asof_plan_has_no_join(spark):
    """The as-of join must plan as a window over a union — one shuffle +
    one sort, never a join operator (the quadratic range-join shape)."""
    df = REG["q50_asof_join"].spark_fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, "as-of should be the union-marker window:\n" + plan
    assert "Window" in plan


def test_q51_clusters_are_transitive(spark, tmp_path):
    """A near-dup chain A~B~C (A and C NOT direct near-dups) must land in
    one cluster — pins transitivity beyond what the natural corpus has."""
    # 40 distinct tokens -> 38 3-gram shingles. Replacing 4 consecutive
    # tokens perturbs exactly 6 shingles, so each link has J = 32/44 =
    # 0.727 >= 0.7 while the chain ends differ in both regions:
    # J(a, c) = 26/50 = 0.52 < 0.7 — NOT a direct pair.
    base = [f"tok{i:02d}" for i in range(40)]
    bt = list(base); bt[4:8] = ["B1", "B2", "B3", "B4"]
    ct = list(bt); ct[32:36] = ["D1", "D2", "D3", "D4"]
    a, b, c = " ".join(base), " ".join(bt), " ".join(ct)
    far = "totally different words nothing shared here at all ok then"
    rows = [(0, a), (1, b), (2, c), (3, far)]
    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(sf_dir / "documents.parquet"))

    got = {
        r["doc_id"]: r["cluster_id"]
        for r in REG["q51_dedup_clusters"].spark_fn(spark, str(sf_dir)).collect()
    }
    # chain members cluster to min doc_id 0; the unrelated doc is absent
    assert got.get(0) == 0 and got.get(1) == 0 and got.get(2) == 0, got
    assert 3 not in got


def test_q52_sample_is_deterministic(spark):
    r1 = REG["q52_hash_sample"].spark_fn(spark, SF_SMOKE).collect()
    r2 = REG["q52_hash_sample"].spark_fn(spark, SF_SMOKE).collect()
    assert r1 == r2 and sum(r["n_sampled"] for r in r1) > 0


def test_approx_percentile_smoke(spark):
    """q56's documented 100 TB path: approx_percentile (t-digest-style
    sketch, map-side mergeable, no per-group sort) must land within 1%
    of the exact interpolated percentile."""
    li = load(spark, SF_SMOKE, "lineitem")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.expr(
            "approx_percentile(l_extendedprice, 0.5, 10000)"
        ).alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] <= 0.01


def test_simhash_pairs_near_miss_and_planted_clone(spark):
    """q36's registered form only surfaces planted exact clones (the
    oracle-checkable projection); this pins the general library form on
    the behaviors SQL can't express: a lightly-perturbed doc pairs with
    its original at 1 <= hamming <= 8, an unrelated doc does not pair,
    and an exact clone lands at hamming 0."""
    from hoard_spark.queries.llm import simhash_pairs

    words = [f"tok{i}" for i in range(120)]
    base = " ".join(words)
    # one word swapped out of 120: 3 of 118 shingles differ (~2.5%), a
    # textbook near-miss — the signature should land within hamming 8
    perturbed = " ".join(
        "zzz" if i == 60 else w for i, w in enumerate(words)
    )
    unrelated = " ".join(f"other{i}" for i in range(120))
    docs = spark.createDataFrame(
        [
            (1, base, "en", "t"),
            (2, perturbed, "en", "t"),
            (3, unrelated, "en", "t"),
            (4, base, "en", "t"),  # exact clone of 1
        ],
        "doc_id long, text string, lang string, source string",
    )
    got = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in simhash_pairs(docs).collect()
    }
    assert got.get((1, 4)) == 0, got
    assert (1, 2) in got and 1 <= got[(1, 2)] <= 8, got
    assert got.get((2, 4)) == got[(1, 2)], got  # clone mirrors its source
    assert not any(3 in p for p in got), got


def test_q94_label_outliers_match_pure_python(spark):
    """q94's bottom-3-by-centroid-cosine per label equals a pure-Python
    recomputation at smoke scale (the oracle does the same at sf0.01;
    this pins the semantics without DuckDB in the loop)."""
    import math

    rows = (
        load(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    by_label: dict = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(
            (r["vec_id"], [float(x) for x in r["embedding"]])
        )
    expect = []
    for label in sorted(by_label):
        vecs = by_label[label]
        dim = len(vecs[0][1])
        c = [
            sum(v[i] for _, v in vecs) / len(vecs) for i in range(dim)
        ]
        cn = math.sqrt(sum(x * x for x in c))
        scored = sorted(
            (
                round(
                    sum(a * b for a, b in zip(v, c))
                    / (math.sqrt(sum(x * x for x in v)) * cn),
                    3,
                ),
                vid,
            )
            for vid, v in vecs
        )
        for rn, (cos, vid) in enumerate(scored[:3], start=1):
            expect.append((label, vid, cos, rn))

    got = [
        (r["label"], r["vec_id"], round(r["cos_c"], 3), r["rn"])
        for r in REG["q94_label_outliers"].spark_fn(spark, SF_SMOKE).collect()
    ]
    assert got == expect


def test_q95_novelty_first_doc_is_one_and_ratios_hold(spark):
    """The lowest doc_id's grams are all first occurrences (novelty 1.0),
    every ratio is n_new/n_grams, and a doc that is an exact duplicate
    of an earlier doc would score 0 — pinned via the planted-clone
    harness: clone doc 0's text at a high doc_id and require novelty 0."""
    docs = load(spark, SF_SMOKE, "documents")
    out = {
        r["doc_id"]: r
        for r in REG["q95_ngram_novelty"].spark_fn(spark, SF_SMOKE).collect()
    }
    first_doc = min(out)
    assert out[first_doc]["novelty"] == 1.0
    for r in out.values():
        assert 0 <= r["n_new"] <= r["n_grams"]
        assert abs(r["novelty"] - r["n_new"] / r["n_grams"]) < 5e-5

    # planted clone: identical text later in the corpus -> novelty 0
    from hoard_spark.queries.llm import shingle_rows_of
    from pyspark.sql import Window

    base = docs.select("doc_id", "text", "lang", "source")
    clone = base.where(F.col("doc_id") == first_doc).select(
        F.lit(10_000_000).alias("doc_id"), "text", "lang", "source"
    )
    rows = shingle_rows_of(base.unionByName(clone)).select("doc_id", "s")
    first = F.min("doc_id").over(Window.partitionBy("s"))
    nov = (
        rows.select(
            "doc_id", (first == F.col("doc_id")).cast("long").alias("is_new")
        )
        .groupBy("doc_id")
        .agg((F.sum("is_new") / F.count("*")).alias("novelty"))
        .where(F.col("doc_id") == 10_000_000)
        .collect()
    )
    assert nov[0]["novelty"] == 0.0


def test_q96_pmi_matches_pure_python(spark):
    """q96's top-20 PMI pairs equal a pure-Python recomputation at
    smoke scale (counts, PMI values at 4dp, and ordering)."""
    import math
    from collections import Counter

    texts = [
        r["text"]
        for r in load(spark, SF_SMOKE, "documents").select("text").collect()
    ]
    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in texts:
        toks = t.strip().split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    n_t, n_bi = sum(uni.values()), sum(bi.values())
    scored = sorted(
        (
            -round(
                math.log(
                    (c / n_bi) / ((uni[a] / n_t) * (uni[b] / n_t))
                ),
                4,
            ),
            a,
            b,
            c,
        )
        for (a, b), c in bi.items()
        if c >= 5
    )[:20]
    expect = [(a, b, c, -negp) for negp, a, b, c in scored]

    got = [
        (r["a"], r["b"], r["c_ab"], r["pmi"])
        for r in REG["q96_pmi_bigrams"].spark_fn(spark, SF_SMOKE).collect()
    ]
    assert got == expect


def test_q97_weights_sum_to_one_and_track_alpha(spark):
    """q97: weights renormalize to ~1, the target counts track the
    budget, and temperature flattening holds — a rarer source's weight
    exceeds its raw share, a dominant source's is capped below it."""
    rows = REG["q97_mixture_weights"].spark_fn(spark, SF_SMOKE).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["target_n"] for r in rows) - 10_000) <= len(rows)
    lo = min(rows, key=lambda r: r["n_docs"])
    hi = max(rows, key=lambda r: r["n_docs"])
    if lo["share"] < hi["share"]:  # non-degenerate source mix
        assert lo["weight"] >= lo["share"]
        assert hi["weight"] <= hi["share"]


def test_artifact_filter_derivations_match_reshingling(spark):
    """The augmented-corpus queries derive their planted sides from the
    pos-carrying shingle table by pure filters/projections (VERDICT r8
    item 2). Pin the three derivations against ground truth — literally
    re-shingling the constructed clone text — on a corpus that hits the
    edges: blank doc, 1/2-token docs, duplicate trigram at the tail.
    """
    from hoard_spark.queries.llm import shingle_rows_of

    docs = spark.createDataFrame(
        [
            (0, "a b c d e f g", "en", "web"),
            (10, "x y", "en", "web"),
            (20, "", "en", "web"),
            (30, "p q r p q r", "en", "web"),  # duplicate tail trigram
            (40, "solo", "en", "web"),
            (50, "k l m n", "en", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    art = shingle_rows_of(docs, with_pos=True)

    # --- exact clone (q36 shape): id-shifted filter of the artifact
    got = {
        (r["doc_id"], r["s"])
        for r in art.select(
            (F.col("doc_id") + 1000).alias("doc_id"), "s"
        ).collect()
    }
    want = {
        (r["doc_id"], r["s"])
        for r in shingle_rows_of(
            docs.withColumn("doc_id", F.col("doc_id") + 1000)
        ).collect()
    }
    assert got == want

    # --- suffix clone (q90 shape): body filter + boundary literals
    sfx = ["qq7z", "xx8z", "vv9z"]
    toks = F.split(F.trim("text"), " +")
    m = F.size(toks)
    nonblank = F.length(F.trim("text")) > 0
    boundary = docs.select(
        (F.col("doc_id") + 2000).alias("doc_id"),
        F.explode(
            F.array_compact(
                F.array(
                    F.when(
                        nonblank & (m >= 2),
                        F.concat_ws(
                            " ",
                            F.get(toks, m - 2),
                            F.get(toks, m - 1),
                            F.lit(sfx[0]),
                        ),
                    ),
                    F.when(
                        nonblank,
                        F.concat_ws(
                            " ", F.get(toks, m - 1), F.lit(sfx[0]), F.lit(sfx[1])
                        ),
                    ),
                    F.lit(" ".join(sfx)),
                )
            )
        ).alias("s"),
    )
    body = art.select((F.col("doc_id") + 2000).alias("doc_id"), "s")
    got = {
        (r["doc_id"], r["s"])
        for r in body.unionByName(boundary).collect()
    }
    want = {
        (r["doc_id"], r["s"])
        for r in shingle_rows_of(
            docs.select(
                (F.col("doc_id") + 2000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" " + " ".join(sfx))).alias(
                    "text"
                ),
                "lang",
                "source",
            )
        ).collect()
    }
    assert got == want

    # --- truncation (q98 shape): pos filter with per-doc k
    k = F.greatest(F.lit(3), F.ceil(F.lit(0.6) * m).cast("int"))
    ks = docs.select("doc_id", k.alias("_k"))
    got = {
        (r["doc_id"], r["s"])
        for r in art.join(ks, "doc_id")
        .where(F.col("pos") + F.lit(2) < F.col("_k"))
        .select((F.col("doc_id") + 3000).alias("doc_id"), "s")
        .collect()
    }
    want = {
        (r["doc_id"], r["s"])
        for r in shingle_rows_of(
            docs.select(
                (F.col("doc_id") + 3000).alias("doc_id"),
                F.concat_ws(" ", F.slice(toks, F.lit(1), k)).alias("text"),
                "lang",
                "source",
            )
        ).collect()
    }
    assert got == want


def test_q99_recall_probes_are_genuinely_near_not_identical(spark):
    """The q99 contract (VERDICT r8 item 3): every perturbed probe's
    top-1 is its SOURCE vector (recall 1.0 on provable near-neighbors)
    and every returned cosine is strictly below 1.0 — the index is
    finding near-duplicates, not byte-identical shortcuts. Also pins
    the geometry the construction depends on: the perturbed cosine
    stays far above the corpus's max genuine pairwise cosine."""
    from hoard_spark.queries.llm import _RECALL_QOFF

    rows = REG["q99_ann_recall"].spark_fn(spark, SF_SMOKE).collect()
    assert rows, "no probes at this SF"
    assert all(r["n_id"] == r["q_id"] - _RECALL_QOFF for r in rows)
    assert all(0.97 < r["cos"] < 1.0 for r in rows), [
        r["cos"] for r in rows
    ]


def test_scale_oracles_equal_brute_force_oracles():
    """The candidate-join scale twins (used by bench.py and the sf0.1
    value check, VERDICT r8 item 10) must return exactly the brute-force
    twins' rows — DuckDB-only, no Spark session needed."""
    import duckdb

    from hoard_spark.queries import REGISTRY, TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'/root/testdata/sf0.001/{t}.parquet'"
        )
    scaled = {
        n: q for n, q in REGISTRY.items() if q.oracle_scale is not None
    }
    assert len(scaled) >= 5, "expected the heavy dedup family"
    for n, q in scaled.items():
        brute = sorted(map(str, con.execute(q.oracle).fetchall()))
        scale = sorted(map(str, con.execute(q.oracle_scale).fetchall()))
        assert brute == scale, n
        assert brute, f"{n}: empty answer proves nothing"


def test_q100_all_paths_find_perturbed_near_neighbor(spark):
    """q100 contract: the IVF-PQ, LSH, and label-filtered IVF paths each
    return every perturbed probe's provable top-1 (one row per
    (probe, path)), all cosines strictly below 1.0. On the filtered
    path the answer is the source only when its own label passes the
    predicate, else the planted label-999 alt-clone — and the corpus
    must make the filter bite (some sources filtered away), or the
    pre-filter semantics goes untested."""
    from hoard_spark.queries.llm import _RECALL_ALT_OFF, _RECALL_QOFF

    rows = REG["q100_ann_recall_paths"].spark_fn(spark, SF_SMOKE).collect()
    assert rows
    by_path = {}
    for r in rows:
        by_path.setdefault(r["path"], []).append(r)
        assert r["n_id"] % _RECALL_ALT_OFF == r["q_id"] - _RECALL_QOFF
        assert 0.97 < r["cos"] < 1.0
    assert set(by_path) == {"ivfpq", "lsh", "ivf_filtered"}
    assert len({len(v) for v in by_path.values()}) == 1
    for r in by_path["ivfpq"] + by_path["lsh"]:
        assert r["n_id"] == r["q_id"] - _RECALL_QOFF  # source itself
    filtered_to_alt = [
        r for r in by_path["ivf_filtered"] if r["n_id"] >= _RECALL_ALT_OFF
    ]
    assert filtered_to_alt, "filter never bit — pre-filter untested"


@pytest.mark.parametrize(
    "sf_dir",
    [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ],
)
def test_q90_suffix_tokens_absent_from_corpus(spark, sf_dir):
    """Guard for q90's artifact-derived clone construction (ADVICE r9):
    its boundary grams are disjoint from the corpus gram domain ONLY
    because the _TOPK_SUFFIX tokens never appear in corpus text — a
    collision would make the rarest-first order non-total and could
    silently drop a qualifying pair through the prefix/positional
    filters. This pins the invariant loudly on every local corpus (the
    sf1 corpus is drawn from the same generator vocabulary,
    tools/gen_sf1.py), so a future testdata change fails here instead
    of corrupting q90."""
    from hoard_spark.queries.llm import _TOPK_SUFFIX

    toks = _TOPK_SUFFIX.split()
    assert toks, "_TOPK_SUFFIX must carry boundary tokens"
    pat = "(^| )(" + "|".join(toks) + ")( |$)"
    hits = (
        load(spark, sf_dir, "documents")
        .where(F.col("text").rlike(pat))
        .count()
    )
    assert hits == 0, (
        f"_TOPK_SUFFIX tokens occur in {sf_dir}/documents text: the q90 "
        "boundary-gram disjointness invariant is broken"
    )


def test_q90_boundary_grams_disjoint_from_artifact(spark):
    """The structural half of the q90 guard: the constructed boundary
    grams must anti-join the shingle artifact's gram domain completely
    (every boundary gram contains a suffix token by construction, so
    this follows from the vocab check — but pin it directly against the
    artifact the query actually reads)."""
    from hoard_spark.queries.llm import _TOPK_SUFFIX, _shingle_rows

    art = _shingle_rows(spark, SF_SMOKE).select("s").distinct()
    toks = _TOPK_SUFFIX.split()
    suffixed = art.where(
        F.col("s").rlike("(^| )(" + "|".join(toks) + ")( |$)")
    ).count()
    assert suffixed == 0


def test_neardup_pair_build_matches_fanout_verify(spark):
    """The array-intersect exact verify (r13) must yield EXACTLY the
    pair rows of the fan-out form it replaced (explode each candidate
    pair over doc a's shingle rows, inner-join doc b's on (b_id, s),
    count): same candidates (the band stage is untouched), |A ∩ B| from
    array_intersect size equals the matched-row count, and the jaccard
    arithmetic is the same double expression — so the materialized
    ``neardup_pairs`` artifact (q35's rows, q51's input) is unchanged.
    The artifact is purged first so the test always exercises the
    CURRENT build path, never a previously materialized parquet
    (ADVICE r13 #2)."""
    from hoard_spark.artifacts import (
        _join,
        artifacts_root,
        corpus_fingerprint,
    )
    from hoard_spark.cache import track_cache
    from hoard_spark.fsutil import WarehouseFS
    from hoard_spark.queries.llm import (
        _minhash_bands,
        _neardup_pairs_table,
        _shingle_rows,
    )

    sf_dir = SF_T2
    fs = WarehouseFS(spark)
    stale = _join(
        artifacts_root(),
        corpus_fingerprint(sf_dir, ("documents",), spark),
        "neardup_pairs",
    )
    if fs.exists(stale):
        fs.rmtree(stale)
    new = _neardup_pairs_table(spark, sf_dir)

    rows = track_cache(_shingle_rows(spark, sf_dir).select("doc_id", "s"))
    bands = _minhash_bands(rows)
    a = bands.select(F.col("doc_id").alias("a_id"), "band_id", "band_hash")
    b = bands.select(F.col("doc_id").alias("b_id"), "band_id", "band_hash")
    cands = (
        a.join(b, ["band_id", "band_hash"], "inner")
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    ra = rows.select(F.col("doc_id").alias("a_id"), "s")
    rb = rows.select(F.col("doc_id").alias("b_id"), "s")
    inter = (
        cands.join(ra, "a_id")
        .join(rb, ["b_id", "s"], "inner")
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("inter"))
    )
    sizes = rows.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    na = sizes.select(
        F.col("doc_id").alias("a_id"), F.col("n_sh").alias("na")
    )
    nb = sizes.select(
        F.col("doc_id").alias("b_id"), F.col("n_sh").alias("nb")
    )
    jac = F.col("inter").cast("double") / (
        (F.col("na") + F.col("nb")).cast("double") - F.col("inter")
    )
    fanout = (
        inter.join(na, "a_id")
        .join(nb, "b_id")
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= 0.7)
        .select("a_id", "b_id", F.round("jaccard", 4).alias("jaccard"))
    )
    assert new.exceptAll(fanout).count() == 0
    assert fanout.exceptAll(new).count() == 0
    assert new.count() > 0
