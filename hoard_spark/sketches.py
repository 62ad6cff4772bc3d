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
