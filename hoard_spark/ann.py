"""Similarity search — the library-level ANN API over ANY embeddings
DataFrame (twin of conformance queries q38/q39; same machinery, different
entry point — the relationship ``hoard_spark.pipeline`` has to q35/q51/q67).

Scale shape (the one the conformance queries pin):

- **Index build**: spherical k-means centroids train driver-side (numpy)
  on a bounded deterministic sample — at 100 TB you never Lloyd over the
  full corpus; centroid quality converges with sample size. Only the
  k x dim matrix leaves the driver.
- **Cell assignment** is a pure codegen projection — the unit centroids
  are inlined as literal arrays and the per-row argmax rides the scan
  map-side. NO shuffle of the corpus for the index.
- **Search** probes the ``nprobe`` nearest cells per query and shuffles
  only the candidate set for the final top-k ranking.
- The index (centroids + PQ codebooks + the assigned/encoded corpus) is
  materialized per corpus version via ``materialized_index`` (backed by
  ``hoard_spark.artifacts.get_or_build``) and reused by every search —
  q39 pays the one-time build, q91 searches the same parquet artifact.

No reference analog (the reference is a time-series store,
src/hoard.coffee); this is the training-data similarity surface the
engine adds (SURVEY.md §2C Q38/Q39).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, p) -> acc + p)"

# (corpus fingerprint, name, k, m, ks) -> (cents, books): avoids one
# model-collect Spark job per consumer query — see materialized_index.
_MODEL_MEMO: "dict[tuple, tuple]" = {}


def normalized(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: "list[str] | None" = None,
    persist: bool = True,
) -> DataFrame:
    """(id, vector) → (vec_id, v: array<double>, nrm), persisted.

    ``keep`` carries extra corpus columns (metadata used by filtered
    search predicates, e.g. a label/partition column) through unchanged.

    The persist is the InMemoryRelation barrier that stops Catalyst from
    inlining the norm expression into both sides of downstream
    self-joins; ``spread_by_stats`` parallelizes the per-vector math
    when the input is a narrow single-file scan — the stats-based
    variant, not ``spread``, because normalized() receives FRESH plan
    objects (the unified-corpus union per index build, a streaming
    store's table per batch) whose ``df.rdd`` partition probe costs
    ~1.1 s of driver wall each time; the optimizer-stats estimate is
    ~20 ms and identical in effect on parquet-backed inputs (measured,
    r13). Pass ``persist=False`` when the corpus is consumed by a
    single search pass with a pre-filter predicate: an InMemoryRelation
    would also BLOCK parquet predicate pushdown, so an unpersisted
    corpus is what lets a filtered search read only the
    predicate-selected row groups (plan-pinned in
    tests/test_plan_audit.py::test_ann_filtered_predicate_reaches_scan).
    """
    from hoard_spark.queries import spread_by_stats, track_cache

    v = F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))")
    extra = [F.col(c) for c in (keep or [])]
    out = (
        spread_by_stats(emb)
        .select(F.col(id_col).alias("vec_id"), v.alias("v"), *extra)
        .withColumn(
            "nrm",
            F.sqrt(F.expr("aggregate(v, 0.0D, (acc, x) -> acc + x * x)")),
        )
    )
    return track_cache(out) if persist else out


def sample_units(n: DataFrame, sample: int = 4096):
    """Deterministic training sample (lowest ``sample`` vec_ids' unit
    vectors) as a numpy matrix — collect ONCE and pass to both
    ``train_centroids`` and ``train_pq_codebooks``."""
    from hoard_spark.queries.llm import _sample_units

    return _sample_units(n, sample)


def train_centroids(
    n: DataFrame, k: int = 8, iters: int = 4, sample: int = 4096, X=None
) -> "list[tuple[int, list[float]]]":
    """Deterministic spherical k-means over a bounded sample (the lowest
    ``sample`` vec_ids' unit vectors; seeds = the first k). Returns the
    k unit centroids as plain Python — small enough to inline as
    literals. See queries/llm.py::_kmeans_centroids (shared impl).
    Pass ``X`` (from ``sample_units``) to skip the sample collect."""
    from hoard_spark.queries.llm import _kmeans_centroids

    return _kmeans_centroids(n, k=k, iters=iters, sample=sample, X=X)


def _lit_vec(xs: "list[float]") -> Column:
    """Literal array<double> via ONE parsed SQL string instead of a
    builder-API tree of per-element ``F.lit`` Py4J calls. ``repr`` of a
    Python float is the shortest decimal that round-trips in IEEE-754
    and Spark's parser reads it back with ``Double.parseDouble`` — the
    same double, bit for bit (verified incl. denormals/extremes; the
    guard below keeps non-finite values, which have no SQL literal
    form, out of the parser). Measured: an 8x64 centroid set builds in
    9 ms vs 280 ms through the builder API — and every ANN *search*
    (not just the index build) constructs these trees per query."""
    if not all(math.isfinite(x) for x in xs):
        return F.array(*[F.lit(float(x)) for x in xs])
    return F.expr("array(" + ",".join(f"{float(x)!r}D" for x in xs) + ")")


def _vec_sql(xs: "list[float]") -> str:
    return "array(" + ",".join(f"{float(x)!r}D" for x in xs) + ")"


def _matrix_sql(rows: "list[list[float]]") -> str:
    return "array(" + ",".join(_vec_sql(r) for r in rows) + ")"


def _lit_matrix(rows: "list[list[float]]") -> Column:
    """Literal array<array<double>> — one parsed SQL string (see
    ``_lit_vec``); builder-API fallback for non-finite values."""
    if not all(math.isfinite(x) for r in rows for x in r):
        return F.array(*[F.array(*[F.lit(float(x)) for x in r]) for r in rows])
    return F.expr(_matrix_sql(rows))


def centroid_sims(
    cents: "list[tuple[int, list[float]]]",
    vec: str = "v",
    nrm: str = "nrm",
) -> Column:
    """array<double> of cos(vec, centroid_i) per row — ONE transform
    over the nested literal centroid matrix (one lambda in the plan
    instead of k copies of the dot expression — generated-code size is
    a real driver cost when every ANN query builds these per
    invocation); whole-stage codegen; centroids must be unit vectors.
    zip_with multiplies (centroid_j * vec_j) in the same ascending-j
    order as the previous per-centroid form — bit-identical doubles.

    The whole expression (matrix literal + lambdas) is ONE parsed SQL
    string: DSL-composed higher-order lambdas cost dozens of Py4J round
    trips each, and every ANN *search* builds this tree per invocation
    (measured r13: the ANN family paid ~9 s/suite of driver-side
    construction, q100 alone ~3 s). The parsed operator tree is the
    same transform/aggregate/zip_with chain in the same fold order —
    bit-identical values (tests pin signature/cell equality). Builder
    fallback for non-finite values, which have no SQL literal form."""
    m = [c_v for _, c_v in cents]
    if all(math.isfinite(x) for r in m for x in r):
        return F.expr(
            f"transform({_matrix_sql(m)}, c -> "
            f"aggregate(zip_with(c, {vec}, (a, b) -> a * b), 0.0D, "
            f"(acc, x) -> acc + x) / {nrm})"
        )
    return F.transform(
        _lit_matrix(m),
        lambda c: F.aggregate(
            F.zip_with(c, F.col(vec), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / F.col(nrm),
    )


def assign_cells(
    n: DataFrame, cents: "list[tuple[int, list[float]]]"
) -> DataFrame:
    """(vec_id, v, nrm) → + cell (nearest centroid, lowest id on ties).
    Map-side only — argmax over the literal-centroid sims array."""
    return (
        n.withColumn("sims", centroid_sims(cents))
        .withColumn(
            "cell",
            (F.expr("array_position(sims, array_max(sims))") - 1).cast("int"),
        )
        .drop("sims")
    )


def search_ivf(
    assigned: DataFrame,
    cents: "list[tuple[int, list[float]]]",
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 6,
    where: "Column | str | None" = None,
) -> DataFrame:
    """IVF top-k: per query probe the ``nprobe`` nearest cells, rank only
    those candidates. ``assigned`` = ``assign_cells`` output; ``queries``
    = (q_id, q_v, q_nrm). Output: (q_id, n_id, cos, rn), ties broken by
    n_id. Self-matches (q_id == n_id) are excluded.

    ``where`` (filtered / pre-filter ANN): an optional predicate over the
    corpus columns, applied to the ASSIGNED table before the candidate
    meeting — i.e. it reaches the corpus scan, where Parquet pushdown and
    pruning act on it, and the top-k is exact over the filtered corpus
    (never "search first, filter after", which under-fills k whenever a
    popular neighborhood fails the predicate)."""
    from pyspark.sql import Window

    from hoard_spark.queries import spread_by_stats

    if where is not None:
        assigned = assigned.where(where)
    # fan a narrow artifact scan across cores BEFORE the broadcast
    # candidate join: the join multiplies rows ~(nprobe/k) x probes, and
    # the WindowGroupLimit partial sort that follows runs inside the
    # SCAN's tasks — a single-split corpus file serializes a
    # hundreds-of-millions-row sort on one core (measured: the q91 sf10
    # straggler). No-op when the scan is already wide.
    assigned = spread_by_stats(assigned)
    probes = (
        queries.withColumn(
            "sims",
            centroid_sims(cents, vec="q_v", nrm="q_nrm"),
        )
        .withColumn(
            "pc",
            F.expr(
                "slice(array_sort(transform(sims, "
                f"(s, i) -> struct(-s AS ns, i AS c_id))), 1, {int(nprobe)})"
            ),
        )
        .select("q_id", "q_v", "q_nrm", F.explode("pc.c_id").alias("cell"))
    )
    dot = F.expr(_DOT.format(a="q_v", b="v"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "n_id")
    return (
        assigned.join(F.broadcast(probes), "cell", "inner")
        .where(F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            F.round(dot / (F.col("q_nrm") * F.col("nrm")), 3).alias("cos"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= k)
    )


def search_exact(
    n: DataFrame, queries: DataFrame, k: int = 3
) -> DataFrame:
    """Brute-force cosine top-k baseline (broadcast the query side, scan
    the corpus once). Same output contract as ``search_ivf``."""
    from pyspark.sql import Window

    dot = F.expr(_DOT.format(a="q_v", b="v"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "n_id")
    return (
        n.crossJoin(F.broadcast(queries))
        .where(F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            F.round(dot / (F.col("q_nrm") * F.col("nrm")), 3).alias("cos"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= k)
    )


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantized codes + asymmetric-distance search + exact rerank
# ---------------------------------------------------------------------------
#
# The memory story ADC exists for: a 64-dim float32 vector is 256 bytes;
# its PQ code (8 subspaces x 16 codewords = 4 bits each) is ONE 32-bit
# word — 64x smaller. At 100 TB of embeddings the codes table fits where
# the raw vectors cannot, so the candidate scan reads (vec_id, cell,
# pq_code) only; raw vectors are touched just for the bounded rerank set
# (queries x rerank rows, broadcast back against the corpus). Jegou et
# al., "Product Quantization for Nearest Neighbor Search" (TPAMI 2011) —
# public literature, same recipe as every IVF-PQ deployment.


def train_pq_codebooks(
    n: DataFrame,
    m: int = 8,
    ks: int = 16,
    iters: int = 8,
    sample: int = 4096,
    X=None,
) -> "list[list[list[float]]]":
    """Per-subspace Euclidean k-means over the SAME bounded deterministic
    sample as ``train_centroids`` (lowest ``sample`` vec_ids' unit
    vectors; seeds = the first ``ks`` sub-vectors). Returns
    ``codebooks[m][ks][dim/m]`` as plain Python floats — 8*16*8 = 1024
    doubles, literal-inlinable. Driver-side numpy for the same reason as
    the IVF centroids: Lloyd never runs over the full corpus; only the
    codebook matrix leaves the driver."""
    import numpy as np

    if X is None:
        X = sample_units(n, sample)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    d = dim // m
    books: list[list[list[float]]] = []
    for j in range(m):
        S = X[:, j * d : (j + 1) * d]
        C = S[:ks].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            cell = np.argmin(d2, axis=1)
            for c in range(ks):
                members = S[cell == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books.append([[float(x) for x in cw] for cw in C])
    return books


def encode_pq(
    n: DataFrame, books: "list[list[list[float]]]"
) -> DataFrame:
    """(vec_id, v, nrm, ...) → + ``pq`` (one LONG packing all m 4-bit
    codes). Pure map-side projection over literal codebooks — the same
    no-corpus-shuffle shape as ``assign_cells``; the index build rides
    the parquet scan. Codes quantize the UNIT vector, so ADC inner
    products approximate cosine directly.

    ONE nested transform over the 3-level literal codebook cube + one
    fold (two lambdas in the plan instead of m per-book trees — the
    same collapse as ``pq_lut``; plan construction and generated-code
    size are real per-build driver costs). Bit-identical to the
    per-book form: per subspace j ascending, argmin of the same
    left-to-right squared-distance fold with the same first-match
    (lowest-code) tiebreak, packed with the same shiftleft-sum."""
    m, d = len(books), len(books[0][0])
    unit = F.transform(F.col("v"), lambda x: x / F.col("nrm"))
    shifted = F.transform(
        _lit_cube(books),
        lambda bj, j: F.call_function(
            "shiftleft",
            (
                F.array_position(
                    F.transform(
                        bj,
                        lambda cw: F.aggregate(
                            F.zip_with(
                                cw,
                                F.slice(unit, j * d + 1, d),
                                lambda a, b: (a - b) * (a - b),
                            ),
                            F.lit(0.0),
                            lambda acc, p: acc + p,
                        ),
                    ),
                    F.array_min(
                        F.transform(
                            bj,
                            lambda cw: F.aggregate(
                                F.zip_with(
                                    cw,
                                    F.slice(unit, j * d + 1, d),
                                    lambda a, b: (a - b) * (a - b),
                                ),
                                F.lit(0.0),
                                lambda acc, p: acc + p,
                            ),
                        )
                    ),
                )
                - 1
            ).cast("long"),
            j * 4,
        ),
    )
    packed = F.aggregate(
        shifted, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return n.withColumn("pq", packed)


def assign_encode_batch(
    n: DataFrame,
    cents: "list[tuple[int, list[float]]]",
    books: "list[list[list[float]]]",
    lsh_h: int = 16,
    lsh_seed: int = 7,
) -> DataFrame:
    """``encode_pq(assign_cells(n, cents), books)`` as ONE Arrow batch
    pass — the index-BUILD twin of the expression path, bit-identical
    by construction (pinned by tests/test_ann.py).

    Why: the expression form evaluates k + m*ks higher-order-function
    folds per row, and Catalyst runs ``transform``/``aggregate``/
    ``zip_with`` lambdas INTERPRETED (no whole-stage codegen) over
    literal trees of ~1.5k doubles — measured 2.1 s for a 2,080-row
    corpus at sf0.1, i.e. almost pure per-row interpreter overhead, plus
    ~1 s of codegen/plan cost per cold build. Handing whole Arrow
    batches to numpy does the same arithmetic vectorized (guide §4.2);
    the model matrices load once per task, not once per row.

    Bit-identical arithmetic, not just equivalent: numpy would normally
    pairwise-sum, so every fold below loops over the SMALL axis (dim /
    subspace width) accumulating left-to-right across the row axis —
    exactly the ``aggregate(zip_with(...))`` evaluation order — in
    float64 end to end:

    - sims[c] = ((0 + c0*v0) + c1*v1) + ... then / nrm  → ascending-j
      ``acc = acc + C[c, j] * V[:, j]``;
    - cell = first index of the max (``array_position(.., array_max)``
      ↔ ``np.argmax`` first-occurrence);
    - unit = elementwise v / nrm;
    - per-subspace distances fold ``acc + (cw_t - unit_t)*(cw_t -
      unit_t)`` ascending t; code = first argmin; pq = Σ code_j << 4j
      in int64;
    - lsh16 = the packed ``lsh_signature`` word (r13): per plane i the
      same ascending-j ``acc = acc + P[i, j] * V[:, j]`` fold, bit =
      ``dot >= 0``, summed as exact ``bit << i`` integers — so stored
      signatures equal the in-plan expression bit for bit and every
      band derived from them matches. Storing the signature moves the
      O(corpus x h x dim) projection from EVERY search invocation into
      the one-time build (guide §6 — the same reason cell/pq live
      here), and drops the 1k-double plane literal tree from consumer
      corpus-side plans.

    Only the materialized-index BUILD uses this (the artifact is parquet
    either way, so consumer query plans stay pure-JVM and the
    no-Python-UDF plan audit is untouched); the expression path remains
    the in-plan form for searches and the equivalence pin.
    """
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    C_rows = [list(map(float, v)) for _, v in cents]
    B_rows = [[[float(x) for x in cw] for cw in bj] for bj in books]
    out_schema = StructType(
        list(n.schema.fields)
        + [
            StructField("cell", IntegerType(), True),
            StructField("pq", LongType(), True),
            StructField("lsh16", LongType(), True),
        ]
    )
    cols = [f.name for f in n.schema.fields]

    def _assign_encode(pdf_iter):
        import numpy as np

        C = np.array(C_rows, dtype=np.float64)  # (k, dim)
        B = np.array(B_rows, dtype=np.float64)  # (m, ks, d)
        k, dim = C.shape
        m, ks, d = B.shape
        # deterministic md5 planes — identical to the literal matrix
        # every in-plan lsh_signature builds from
        P = np.array(hyperplanes(dim, h=lsh_h, seed=lsh_seed))
        for pdf in pdf_iter:
            rows = len(pdf)
            if rows == 0:
                pdf["cell"] = np.array([], dtype=np.int32)
                pdf["pq"] = np.array([], dtype=np.int64)
                pdf["lsh16"] = np.array([], dtype=np.int64)
                yield pdf[cols + ["cell", "pq", "lsh16"]]
                continue
            V = np.array(pdf["v"].tolist(), dtype=np.float64)  # (rows, dim)
            nrm = pdf["nrm"].to_numpy(dtype=np.float64)
            sims = np.empty((rows, k), dtype=np.float64)
            for c in range(k):
                acc = np.zeros(rows, dtype=np.float64)
                for j in range(dim):
                    acc = acc + C[c, j] * V[:, j]
                sims[:, c] = acc / nrm
            cell = np.argmax(sims, axis=1).astype(np.int32)
            unit = V / nrm[:, None]
            pq = np.zeros(rows, dtype=np.int64)
            for j in range(m):
                dists = np.empty((rows, ks), dtype=np.float64)
                for c in range(ks):
                    acc = np.zeros(rows, dtype=np.float64)
                    for t in range(d):
                        diff = B[j, c, t] - unit[:, j * d + t]
                        acc = acc + diff * diff
                    dists[:, c] = acc
                code = np.argmin(dists, axis=1).astype(np.int64)
                pq = pq + (code << (4 * j))
            sig = np.zeros(rows, dtype=np.int64)
            for i in range(lsh_h):
                acc = np.zeros(rows, dtype=np.float64)
                for j in range(dim):
                    acc = acc + P[i, j] * V[:, j]
                sig = sig + ((acc >= 0).astype(np.int64) << i)
            pdf["cell"] = cell
            pdf["pq"] = pq
            pdf["lsh16"] = sig
            yield pdf[cols + ["cell", "pq", "lsh16"]]

    return n.mapInPandas(_assign_encode, out_schema)


def _cube_sql(rows: "list[list[list[float]]]") -> str:
    return "array(" + ",".join(_matrix_sql(m) for m in rows) + ")"


def _lit_cube(rows: "list[list[list[float]]]") -> Column:
    """Literal array<array<array<double>>> — one parsed SQL string (see
    ``_lit_vec``); builder-API fallback for non-finite values."""
    if not all(math.isfinite(x) for m in rows for r in m for x in r):
        return F.array(
            *[
                F.array(*[F.array(*[F.lit(float(x)) for x in r]) for r in m])
                for m in rows
            ]
        )
    return F.expr(_cube_sql(rows))


def pq_lut(
    books: "list[list[list[float]]]", vec: str = "q_v", nrm: str = "q_nrm"
) -> Column:
    """array<array<double>> — per subspace, dot(query_unit_j, codeword_c)
    for every codeword. All-literal codebooks; evaluated once per PROBE
    row (the small side), never per candidate. ONE nested transform over
    the 3-level literal codebook cube (two lambdas in the plan instead
    of m per-book transforms — the same collapse ``centroid_sims`` /
    ``lsh_signature`` got in r10; generated-code size and per-query
    lambda-construction round trips are real driver costs). Arithmetic
    is bit-identical to the per-book form: same ascending-c zip_with
    dot over the same subspace slice. One parsed SQL string for the
    same Py4J-round-trip reason as ``centroid_sims`` (the cube is
    m*ks*dsub doubles and the nested lambdas cost more driver wall
    than the execution at conformance scale); builder fallback for
    non-finite values."""
    m, d = len(books), len(books[0][0])
    if all(math.isfinite(x) for bj in books for r in bj for x in r):
        return F.expr(
            f"transform({_cube_sql(books)}, (bj, j) -> transform(bj, "
            f"cw -> aggregate(zip_with(cw, slice(transform({vec}, "
            f"x -> x / {nrm}), j * {d} + 1, {d}), (a, b) -> a * b), "
            f"0.0D, (acc, p) -> acc + p)))"
        )
    unit = F.transform(F.col(vec), lambda x: x / F.col(nrm))
    return F.transform(
        _lit_cube(books),
        lambda bj, j: F.transform(
            bj,
            lambda cw: F.aggregate(
                F.zip_with(
                    cw,
                    F.slice(unit, j * d + 1, d),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, p: acc + p,
            ),
        ),
    )


def search_ivf_pq(
    assigned_pq: DataFrame,
    n: DataFrame,
    cents: "list[tuple[int, list[float]]]",
    books: "list[list[list[float]]]",
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 6,
    rerank: int = 32,
    where: "Column | str | None" = None,
) -> DataFrame:
    """IVF-ADC top-k with exact rerank.

    1. Probe the ``nprobe`` nearest cells per query (as ``search_ivf``).
    2. Rank candidates by the ASYMMETRIC distance — the code-table lookup
       ``sum_j lut[j][code_j]`` — reading ONLY (vec_id, cell, pq) from
       the corpus-sized side; keep the ``rerank`` best per query.
    3. Re-score that bounded set exactly against the raw vectors
       (broadcast the candidate ids into one corpus join) and return the
       true-cosine top-k.

    Exactness contract: equal to ``search_ivf`` whenever the true top-k
    of the probed cells survives the ADC cut — guaranteed-checkable, and
    pinned on planted duplicates (a clone's source is the global ADC
    argmax for it: codes quantize unit vectors and clone_u == source_u).

    ``where``: optional corpus predicate, applied BEFORE the ADC meeting
    (pre-filter ANN — same semantics as ``search_ivf``); the rerank set
    is then drawn from the filtered candidates only.
    """
    from pyspark.sql import Window

    from hoard_spark.queries import spread_by_stats

    if where is not None:
        assigned_pq = assigned_pq.where(where)
    m = len(books)
    probes = (
        queries.withColumn(
            "sims", centroid_sims(cents, vec="q_v", nrm="q_nrm")
        )
        .withColumn(
            "pc",
            F.expr(
                "slice(array_sort(transform(sims, "
                f"(s, i) -> struct(-s AS ns, i AS c_id))), 1, {int(nprobe)})"
            ),
        )
        .withColumn("lut", pq_lut(books))
        .select(
            "q_id", "q_v", "q_nrm", "lut",
            F.explode("pc.c_id").alias("cell"),
        )
    )
    adc = F.expr(
        f"aggregate(sequence(0, {m - 1}), 0.0D, (acc, j) -> acc + "
        "lut[j][CAST(shiftright(pq, 4 * j) & 15 AS INT)])"
    )
    w_adc = Window.partitionBy("q_id").orderBy(
        F.col("adc").desc(), "n_id"
    )
    # The ADC ranking shuffle carries ONLY (q_id, n_id, adc) — 24 bytes
    # per candidate. Carrying q_v/q_nrm through this exchange (the
    # pre-r11 shape) multiplied the candidate shuffle ~20x (512 B/row)
    # and turned the window into a straggler at sf10 cardinalities
    # (~600M candidate rows); the query vectors re-attach to the
    # BOUNDED rerank set (queries x rerank rows) by broadcast below.
    cand = (
        spread_by_stats(assigned_pq.select("vec_id", "cell", "pq"))
        .join(F.broadcast(probes), "cell", "inner")
        .where(F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id", F.col("vec_id").alias("n_id"), adc.alias("adc")
        )
        .withColumn("_r", F.row_number().over(w_adc))
        .where(F.col("_r") <= rerank)
        .drop("adc", "_r")
    )
    dot = F.expr(_DOT.format(a="q_v", b="v"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "n_id")
    return (
        n.select(F.col("vec_id").alias("n_id"), "v", "nrm")
        .join(F.broadcast(cand), "n_id", "inner")
        .join(
            F.broadcast(queries.select("q_id", "q_v", "q_nrm")), "q_id"
        )
        .select(
            "q_id",
            "n_id",
            F.round(dot / (F.col("q_nrm") * F.col("nrm")), 3).alias("cos"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= k)
    )


# ---------------------------------------------------------------------------
# LSH-bucketed search: random-hyperplane (SimHash) signatures + band join
# ---------------------------------------------------------------------------
#
# The third scale path next to IVF and IVF-PQ (Charikar, STOC 2002 —
# random hyperplane rounding for cosine). Where IVF needs trained
# centroids, LSH needs none: h fixed hyperplanes turn every vector into
# an h-bit signature map-side; vectors meet through an equi-join on
# signature BANDS (two cosine-similar vectors agree on most bits, so
# they collide on at least one band with high probability). No training
# collects, no index artifact — the right choice for corpora that churn
# faster than an index can be rebuilt.


def hyperplanes(
    dim: int, h: int = 16, seed: int = 7
) -> "list[list[float]]":
    """h deterministic pseudo-random hyperplanes. Derived from md5 of
    (seed, i, j) — platform- and library-version-independent, so
    signatures are stable across environments (a numpy RNG would pin
    the result to the RNG implementation)."""
    import hashlib

    planes = []
    for i in range(h):
        row = []
        for j in range(dim):
            d = hashlib.md5(f"{seed}:{i}:{j}".encode()).digest()
            u = int.from_bytes(d[:8], "big") / float(1 << 64)
            row.append(2.0 * u - 1.0)
        planes.append(row)
    return planes


def lsh_signature(
    planes: "list[list[float]]", vec: str = "v"
) -> Column:
    """h-bit SimHash signature packed into one LONG — bit i is
    sign(dot(vec, plane_i)). Pure codegen projection over the ONE
    nested literal plane matrix (a transform with an index lambda,
    instead of h separate dot expressions summed — generated-code size
    is a real per-query driver cost); the signature build rides the
    scan map-side, the same no-corpus-shuffle shape as IVF cell
    assignment. Arithmetic is bit-identical to the per-plane form:
    same ascending-j zip_with dot, same >= 0 threshold, same bit i.
    One parsed SQL string for the same Py4J-round-trip reason as
    ``centroid_sims``; builder fallback for non-finite planes."""
    if all(math.isfinite(x) for r in planes for x in r):
        return F.expr(
            f"aggregate(transform({_matrix_sql(planes)}, (p, i) -> "
            f"shiftleft(CAST(CASE WHEN aggregate(zip_with(p, {vec}, "
            f"(a, b) -> a * b), 0.0D, (acc, x) -> acc + x) >= 0 "
            f"THEN 1 ELSE 0 END AS BIGINT), i)), CAST(0 AS BIGINT), "
            f"(acc, x) -> acc + x)"
        )

    def bit(p: Column, i: Column) -> Column:
        dot = F.aggregate(
            F.zip_with(p, F.col(vec), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        # call_function: the DSL's F.shiftleft only takes a Python int
        # for numBits; the SQL function accepts the index expression
        return F.call_function(
            "shiftleft",
            F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long"),
            i,
        )

    return F.aggregate(
        F.transform(_lit_matrix(planes), bit),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _bands(sig: Column, bands: int, band_bits: int) -> Column:
    mask = (1 << band_bits) - 1
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("band_i"),
                F.shiftright(sig, i * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("band_v"),
            )
            for i in range(bands)
        ]
    )


def search_lsh(
    n: DataFrame,
    queries: DataFrame,
    k: int = 3,
    h: int = 16,
    bands: int = 2,
    seed: int = 7,
    where: "Column | str | None" = None,
    dim: "int | None" = None,
    sig_col: "str | None" = None,
    q_sig_col: "str | None" = None,
) -> DataFrame:
    """LSH-bucketed cosine top-k: rank only corpus rows that share at
    least one signature band with the query. Same output contract as
    ``search_ivf`` (q_id, n_id, cos, rn; ties by n_id; self-matches
    excluded); ``where`` is the same pre-filter semantics. Pass ``dim``
    (the embedding width — callers know it) so plan construction fires
    no Spark job; omitting it falls back to a one-row driver probe,
    which also cannot work when the pre-filter empties the corpus.

    Positioning: LSH banding is a HIGH-similarity retriever — band
    collision probability is (1 - theta/pi)^band_bits per band, so at
    cos ~0.99 a pair collides with ~95% probability (recall floor
    pinned on noisy clones in tests/test_ann.py) while at cos ~0.4
    (a random corpus's typical nearest neighbor) it is ~5%. Use it for
    duplicate/near-duplicate retrieval over churning corpora; use the
    IVF paths for weak-similarity kNN. EXACT for identical vectors: a
    verbatim clone has a bit-identical signature, so it shares every
    band with its source and the source is always ranked — the
    planted-clone conformance trick (q93).

    Plan: signature + band explode are map-side projections on both
    sides; the probe side broadcasts; one candidate-sized dedup +
    window shuffle. Never all-pairs. At scale, size ``h``/``bands`` so
    ``2^(h/bands)`` stays well above the expected per-band bucket load
    (candidates per probe ~ bands * N / 2^(h/bands)); the defaults fit
    conformance-sized corpora, a 10^9-row corpus wants band_bits ~24+.

    ``sig_col`` / ``q_sig_col`` (r13): name of a column already holding
    the packed h-bit signature (e.g. the materialized index's
    ``lsh16``, built bit-identically in the Arrow index pass). When
    given, that side skips the in-plan ``lsh_signature`` projection —
    the per-invocation O(rows x h x dim) fold AND the h x dim plane
    literal tree disappear from the plan (guide §6: precompute in the
    artifact). The caller guarantees the stored signature used the same
    (h, seed).
    """
    from pyspark.sql import Window

    from hoard_spark.queries import spread_by_stats

    if where is not None:
        n = n.where(where)
    if dim is None and sig_col is not None and q_sig_col is not None:
        dim = 0  # planes unused: both signatures come precomputed
    if dim is None:
        # Last-resort probe only: this is a driver action (one Spark job)
        # fired at PLAN-BUILD time, and on a corpus the pre-filter empties
        # it has no row to read. Callers know their embedding width — pass
        # ``dim`` so plan construction stays job-free (plan-audit-pinned
        # in tests/test_ann.py).
        row = n.select("v").first()
        if row is None:
            raise ValueError(
                "search_lsh: corpus is empty after the pre-filter and no "
                "dim was given — pass dim explicitly"
            )
        dim = len(row["v"])
    planes = (
        hyperplanes(dim, h=h, seed=seed)
        if sig_col is None or q_sig_col is None
        else None
    )
    band_bits = h // bands
    # see search_ivf: parallelize the signature + band explode + join
    # beyond the corpus file's split count
    n = spread_by_stats(n)
    n_sig = (
        F.col(sig_col) if sig_col else lsh_signature(planes, "v")
    )
    q_sig = (
        F.col(q_sig_col) if q_sig_col else lsh_signature(planes, "q_v")
    )
    corpus = n.select(
        "vec_id", "v", "nrm",
        F.explode(_bands(n_sig, bands, band_bits)).alias("b"),
    ).select("vec_id", "v", "nrm", "b.band_i", "b.band_v")
    probes = queries.select(
        "q_id", "q_v", "q_nrm",
        F.explode(_bands(q_sig, bands, band_bits)).alias("b"),
    ).select("q_id", "q_v", "q_nrm", "b.band_i", "b.band_v")
    dot = F.expr(_DOT.format(a="q_v", b="v"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "n_id")
    return (
        corpus.join(F.broadcast(probes), ["band_i", "band_v"], "inner")
        .where(F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            F.round(dot / (F.col("q_nrm") * F.col("nrm")), 3).alias("cos"),
        )
        .dropDuplicates(["q_id", "n_id"])
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= k)
    )


def materialized_index(
    spark,
    sf_dir: str,
    corpus_builder: "Callable[[], DataFrame]",
    name: str,
    tables: "tuple[str, ...]" = ("embeddings",),
    k: int = 8,
    m: int = 8,
    ks: int = 16,
    keep: "list[str] | None" = None,
) -> "tuple[DataFrame, list[tuple[int, list[float]]], list[list[list[float]]]]":
    """Corpus-keyed materialized IVF-PQ index: ``(table, cents, books)``.

    Two artifacts per (corpus fingerprint, name):

    - ``<name>_model.json``: the k unit centroids and the m×ks PQ
      codebooks (a few KB; trained on the bounded deterministic sample
      only on first build). Stored as a JSON sidecar via
      ``artifacts.get_or_build_json`` — zero Spark jobs to read or
      write (as a parquet table it cost a write job plus a collect job
      on every cold consumer), plus an in-process memo so the five
      consumer queries pay even the driver round-trip once.
    - ``<name>_table``: the corpus with ``cell`` and ``pq`` attached
      (``artifacts.get_or_build`` parquet) — one map-side
      assignment+encode pass, written once. Every subsequent search is
      a plain parquet scan: no training collects, no giant encode
      expression in the consumer's plan, and the ADC path reads just
      (vec_id, cell, pq) columns.

    This is the 100 TB shape the module docstring promises: materialize
    the assignment per corpus version, search against it everywhere.
    ``corpus_builder`` must be deterministic given the corpus tables
    (it only runs on a cold store). Bake index params into ``name``
    when varying them — the fingerprint keys on corpus files, not on
    builder code.
    """
    from hoard_spark.artifacts import (
        corpus_fingerprint,
        get_or_build,
        get_or_build_json,
    )

    # Cold-build state shared between the two builders: ONE normalized
    # corpus plan and ONE training-sample collect. Built lazily so a warm
    # artifact store pays neither the corpus scan nor the collect.
    # Unpersisted: the sample collect is a pushed-down range scan and the
    # assign+encode pass streams straight to parquet — two cheap narrow
    # passes beat one cache fill + cached pass (measured 1.9s vs 4.5s at
    # sf0.1), and nothing downstream re-reads the plan (consumers read
    # the artifact).
    shared: dict = {}

    def corpus_n() -> DataFrame:
        if "n" not in shared:
            shared["n"] = normalized(
                corpus_builder(), keep=keep, persist=False
            )
        return shared["n"]

    def build_model() -> dict:
        n = corpus_n()
        X = sample_units(n)
        cents = train_centroids(n, k=k, X=X)
        books = train_pq_codebooks(n, m=m, ks=ks, X=X)
        return {"cents": [[i, v] for i, v in cents], "books": books}

    # Driver-side memo keyed on the corpus fingerprint: five conformance
    # queries share one index; the fingerprint key keeps the memo exactly
    # as fresh as the artifact.
    memo_key = (corpus_fingerprint(sf_dir, tables, spark), name, k, m, ks)
    cached = _MODEL_MEMO.get(memo_key)
    if cached is not None:
        cents, books = cached
    else:
        model = get_or_build_json(
            spark, sf_dir, f"{name}_model", tables, build_model
        )
        cents = sorted(
            (int(i), [float(x) for x in v]) for i, v in model["cents"]
        )
        books = [
            [[float(x) for x in cw] for cw in bj] for bj in model["books"]
        ]
        _MODEL_MEMO[memo_key] = (cents, books)

    def build_table() -> DataFrame:
        # Arrow-batch assign+encode: bit-identical to
        # encode_pq(assign_cells(...)) (pinned by tests/test_ann.py) but
        # without the per-row interpreted-HOF evaluation and the ~2 s of
        # literal-tree plan/codegen cost per cold build (r13 A/B).
        return assign_encode_batch(corpus_n(), cents, books)

    table = get_or_build(
        spark, sf_dir, f"{name}_table", tables, build_table
    )
    return table, cents, books


def queries_from(n: DataFrame, ids: "list[int]") -> DataFrame:
    """Select query vectors out of a normalized corpus by id."""
    return n.where(F.col("vec_id").isin([int(i) for i in ids])).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("q_v"),
        F.col("nrm").alias("q_nrm"),
    )
