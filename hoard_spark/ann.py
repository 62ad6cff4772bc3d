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
- The assignment table can be materialized per corpus version via
  ``hoard_spark.artifacts.get_or_build`` and reused by every search.

No reference analog (the reference is a time-series store,
src/hoard.coffee); this is the training-data similarity surface the
engine adds (SURVEY.md §2C Q38/Q39).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, p) -> acc + p)"


def normalized(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, vector) → (vec_id, v: array<double>, nrm), persisted.

    The persist is the InMemoryRelation barrier that stops Catalyst from
    inlining the norm expression into both sides of downstream
    self-joins; ``spread`` parallelizes the per-vector math when the
    input is a narrow single-file scan.
    """
    from hoard_spark.queries import spread, track_cache

    v = F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))")
    return track_cache(
        spread(emb)
        .select(F.col(id_col).alias("vec_id"), v.alias("v"))
        .withColumn(
            "nrm",
            F.sqrt(F.expr("aggregate(v, 0.0D, (acc, x) -> acc + x * x)")),
        )
    )


def train_centroids(
    n: DataFrame, k: int = 8, iters: int = 4, sample: int = 4096
) -> "list[tuple[int, list[float]]]":
    """Deterministic spherical k-means over a bounded sample (the lowest
    ``sample`` vec_ids' unit vectors; seeds = the first k). Returns the
    k unit centroids as plain Python — small enough to inline as
    literals. See queries/llm.py::_kmeans_centroids (shared impl)."""
    from hoard_spark.queries.llm import _kmeans_centroids

    return _kmeans_centroids(n, k=k, iters=iters, sample=sample)


def centroid_sims(
    cents: "list[tuple[int, list[float]]]",
    vec: str = "v",
    nrm: str = "nrm",
) -> Column:
    """array<double> of cos(vec, centroid_i) per row — all literals,
    whole-stage codegen; centroids must be unit vectors."""
    dots = [
        F.aggregate(
            F.zip_with(
                F.col(vec),
                F.array(*[F.lit(x) for x in c_v]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / F.col(nrm)
        for _, c_v in cents
    ]
    return F.array(*dots)


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
) -> DataFrame:
    """IVF top-k: per query probe the ``nprobe`` nearest cells, rank only
    those candidates. ``assigned`` = ``assign_cells`` output; ``queries``
    = (q_id, q_v, q_nrm). Output: (q_id, n_id, cos, rn), ties broken by
    n_id. Self-matches (q_id == n_id) are excluded."""
    from pyspark.sql import Window

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


def queries_from(n: DataFrame, ids: "list[int]") -> DataFrame:
    """Select query vectors out of a normalized corpus by id."""
    return n.where(F.col("vec_id").isin([int(i) for i in ids])).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("q_v"),
        F.col("nrm").alias("q_nrm"),
    )
