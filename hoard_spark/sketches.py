"""Mergeable distinct-count sketch rollups (HyperLogLog / Datasketches).

The 100 TB pattern: computing ``COUNT(DISTINCT user)`` over a year of
events re-shuffles the raw corpus every time someone asks. The classic
OLAP fix is a *pre-aggregated sketch table* — one HLL sketch per
(dimension, day) partition, built once at ingest cadence — because HLL
sketches merge losslessly (same lgConfigK): any time-range or dimension
slice is then a tiny ``hll_union_agg`` over pre-built binaries instead
of a full-corpus shuffle. The reference has no distinct surface at all
(SURVEY.md §2B "Distinct: none"); the engine's exact surface is
Q16/Q31, and this module is the declared approximate scale path.

Everything is built-in JVM expressions (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate`` — Apache Datasketches via
Spark 3.5+): no UDFs, map-side partial aggregation on both the build
and the merge, and the sketch table is orders of magnitude smaller than
the input (one ≤(2^lg_k)-register binary per group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 14  # 2^14 registers ≈ 0.8% relative standard error


def distinct_sketch_table(
    df: DataFrame,
    keys: list[str | Column],
    col: str,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Build the pre-aggregated sketch table: one HLL per key group.

    Output: ``keys..., sketch (binary), rows (long)``. Persist this at
    the finest rollup grain you will ever query (e.g. (metric, day));
    coarser grains come from ``merge_distinct`` without touching the
    raw data again.
    """
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(col, F.lit(lg_k)).alias("sketch"),
        F.count("*").alias("rows"),
    )


def merge_distinct(
    sketch_table: DataFrame, keys: list[str | Column]
) -> DataFrame:
    """Re-aggregate a sketch table to a coarser grain.

    Unions the group's sketches (lossless for equal lg_k) and returns
    ``keys..., approx_distinct (long), rows (long)``. This is the query
    path: it reads only sketch binaries, never raw events.
    """
    return sketch_table.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
            "approx_distinct"
        ),
        F.sum("rows").alias("rows"),
    )


def estimate(sketch_table: DataFrame) -> DataFrame:
    """Per-row estimates of an existing sketch table (no regrouping)."""
    return sketch_table.withColumn(
        "approx_distinct", F.hll_sketch_estimate("sketch")
    )


# ---------------------------------------------------------------------------
# Mergeable quantile sketches (equi-depth histogram)
#
# Spark exposes no mergeable percentile binary the way it exposes HLL
# (``percentile_approx`` accumulates internal t-digest-ish state but cannot
# persist/merge it), so q56's declared scale path re-read raw events for
# every slice. The portable warehouse answer is a *fixed-grid equi-depth
# histogram*: one global boundary grid (computed once per corpus with a
# single ``percentile_approx`` job, inlined as literals — the ann.py
# centroid-hoisting pattern), then per (key, grain) an array of bin counts.
# Count arrays merge losslessly by element-wise sum, so any coarser slice
# is a tiny sum over pre-built arrays — never a raw-data shuffle — and a
# quantile estimate is CDF inversion with linear interpolation inside the
# hit bin. Rank error ≤ 1 bin = 1/bins of the mass (boundary-exact mass
# lands whole bins, so in practice far lower on continuous data).
#
# Everything below is built-in JVM expressions (filter/aggregate/zip_with
# higher-order functions over literal arrays): no UDFs, map-side partial
# aggregation on build and merge.
# ---------------------------------------------------------------------------

DEFAULT_BINS = 128  # rank error <= 1/128 ≈ 0.8% of the mass


def quantile_boundaries(
    df: DataFrame, col: str, bins: int = DEFAULT_BINS
) -> list[float]:
    """Interior bin boundaries (bins-1 global equi-depth edges) — ONE
    small aggregate job; reuse the result for every sketch table built
    over the same corpus so their grids (and hence merges) line up."""
    qs = [i / bins for i in range(1, bins)]
    row = df.select(
        F.percentile_approx(F.col(col).cast("double"), qs).alias("b")
    ).first()
    return sorted(set(row["b"] or []))


def quantile_sketch_table(
    df: DataFrame,
    keys: list[str | Column],
    col: str,
    bins: int = DEFAULT_BINS,
    boundaries: list[float] | None = None,
) -> DataFrame:
    """Build the pre-aggregated histogram table: one count array per key
    group. Output: ``keys..., counts (array<long>), rows, vmin, vmax,
    boundaries (array<double>, the shared grid — constant, dictionary-
    encodes to nothing on parquet)``.

    Persist at the finest grain you will query (e.g. (metric, day));
    coarser grains come from ``merge_quantile`` without touching raw
    data. Pass ``boundaries`` explicitly when appending new partitions
    to an existing sketch table — grids must match for merges.
    """
    if boundaries is None:
        boundaries = quantile_boundaries(df, col, bins)
    b_arr = F.array(*[F.lit(float(b)) for b in boundaries])
    v = F.col(col).cast("double")
    # bin index = #(interior boundaries < v): 0..len(boundaries); values
    # outside the grid clamp into the first/last bin by construction
    bin_idx = F.size(F.filter(b_arr, lambda b: b < v))
    n_bins = len(boundaries) + 1
    # two-level aggregation so map-side partial combine works at both
    # steps: (keys, bin) counts are tiny partials; the second groupBy
    # assembles ≤ n_bins entries per key into the dense array
    binned = (
        df.where(v.isNotNull())
        .groupBy(*keys, bin_idx.alias("_bin"))
        .agg(
            F.count("*").alias("_cnt"),
            F.min(v).alias("_vmin"),
            F.max(v).alias("_vmax"),
        )
    )
    return (
        binned.groupBy(*keys)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("_bin"), F.col("_cnt")))
            ).alias("_m"),
            F.sum("_cnt").alias("rows"),
            F.min("_vmin").alias("vmin"),
            F.max("_vmax").alias("vmax"),
        )
        .withColumn(
            "counts",
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bins - 1)),
                lambda i: F.coalesce(
                    F.try_element_at("_m", i), F.lit(0).cast("long")
                ),
            ),
        )
        .withColumn(
            "boundaries", F.array(*[F.lit(float(b)) for b in boundaries])
        )
        .drop("_m")
    )


def merge_quantile(
    sketch_table: DataFrame, keys: list[str | Column]
) -> DataFrame:
    """Re-aggregate a histogram table to a coarser grain: element-wise
    sum of count arrays (lossless for a shared grid), min/max of the
    range ends. Reads only the sketch table, never raw events. The
    collect_list per group is bounded by the grain ratio (e.g. ≤366
    daily arrays per year) — sketch-sized, not data-sized."""
    return sketch_table.groupBy(*keys).agg(
        F.aggregate(
            F.collect_list("counts"),
            # zero of the fold: a zeroed array of the grid's width
            F.transform(F.first("counts"), lambda _: F.lit(0).cast("long")),
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
        ).alias("counts"),
        F.sum("rows").alias("rows"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
        F.first("boundaries").alias("boundaries"),
    )


def quantile_estimate(
    sketch_table: DataFrame, qs: list[float]
) -> DataFrame:
    """Append ``approx_quantiles`` (array<double>, one per q in ``qs``)
    to a histogram table: invert the cumulative counts and interpolate
    linearly inside the hit bin, with the group's own vmin/vmax as the
    outer edges."""
    # cumulative counts: O(bins²) array building, JVM-side, bins≈128
    cum = F.aggregate(
        F.col("counts"),
        F.array().cast("array<long>"),
        lambda acc, x: F.concat(
            acc,
            F.array(F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0).cast("long")) + x),
        ),
    )
    out = sketch_table.withColumn("_cum", cum)

    def one_q(q: float) -> Column:
        target = F.lit(float(q)) * F.col("rows").cast("double")
        # first bin whose cumulative count reaches the target (monotone)
        idx = F.size(
            F.filter(F.col("_cum"), lambda c: c.cast("double") < target)
        ) + F.lit(1)
        # idx==1 must be branch-guarded, not coalesced: Spark rejects
        # array index 0 with INVALID_INDEX_OF_ZERO even in
        # try_element_at, so try_element_at(_cum, 0) errors rather than
        # returning null (any q <= 1/bins lands here).
        lo_cum = (
            F.when(idx == 1, F.lit(0).cast("long"))
            .otherwise(F.try_element_at(F.col("_cum"), idx - 1))
            .cast("double")
        )
        cnt = F.try_element_at(F.col("counts"), idx).cast("double")
        # bin edges: [vmin, b_1 .. b_{n-1}, vmax]
        lo = F.when(idx == 1, F.col("vmin")).otherwise(
            F.try_element_at("boundaries", idx - 1)
        )
        hi = F.when(
            idx == F.size("counts"), F.col("vmax")
        ).otherwise(F.try_element_at("boundaries", idx))
        frac = F.when(cnt > 0, (target - lo_cum) / cnt).otherwise(F.lit(0.0))
        return F.least(
            F.greatest(lo + (hi - lo) * frac, F.col("vmin")), F.col("vmax")
        )

    return out.withColumn(
        "approx_quantiles", F.array(*[one_q(q) for q in qs])
    ).drop("_cum")
