"""Interval-overlap join: big×big time-range joins without a theta join.

q57's banding join broadcasts one small side; when BOTH sides are
data-sized interval sets (sessions × incidents, shipping windows ×
shipping windows), a theta join on ``a.start <= b.end AND b.start <=
a.end`` degenerates to a per-key nested loop. The scalable plan is the
classic **grid bucketing** used by genomics (BEDTools-style binning)
and spatial joins: explode every interval to the coarse grid cells it
touches, equi-join on (keys, cell) — work ∝ true overlaps + cell spans,
not |A|×|B| per key — and verify the exact overlap predicate on the
candidates.

Duplicate elimination is arithmetic, not a shuffle: a pair overlapping
several shared cells is kept only where the join cell equals the FIRST
cell both intervals occupy, ``max(floor(a_start/w), floor(b_start/w))``
— so no ``distinct`` pass and every qualifying pair appears exactly
once.

``bucket_width`` trades explode fan-out (≈ interval_len/width cells per
row) against candidate precision; set it near the typical interval
length. Degenerate long intervals fan out proportionally — cap them
upstream or split the grid per partition if a side has open-ended rows.

No reference analog (src/hoard.coffee has no join surface); part of
the relational/analytics north star (SURVEY.md §2C; q85 is the
conformance twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    a_range: tuple[str, str],
    b_range: tuple[str, str],
    bucket_width: int,
    how_overlap: str = "closed",
) -> DataFrame:
    """All (a, b) row pairs sharing ``keys`` whose numeric intervals
    overlap. ``a_range``/``b_range`` name (start, end) columns — integer
    or long, start <= end. ``closed`` counts touching endpoints
    (``a.start <= b.end AND b.start <= a.end``); ``open`` requires
    strict interior overlap. Output: all columns of ``a`` then the
    non-key columns of ``b`` (caller aliases to avoid collisions).
    """
    if how_overlap not in ("closed", "open"):
        raise ValueError(f"how_overlap must be closed|open: {how_overlap}")
    a_start, a_end = a_range
    b_start, b_end = b_range
    overlap_keys = set(a.columns) & (set(b.columns) - set(keys))
    if overlap_keys:
        raise ValueError(
            f"non-key columns collide across sides: {overlap_keys}"
        )
    w = int(bucket_width)

    def cells(df: DataFrame, start: str, end: str) -> DataFrame:
        lo = F.floor(F.col(start) / w)
        hi = F.floor(F.col(end) / w)
        return df.withColumn("_cell", F.explode(F.sequence(lo, hi)))

    ca = cells(a, a_start, a_end)
    cb = cells(b, b_start, b_end)
    first_shared = F.greatest(
        F.floor(F.col(a_start) / w), F.floor(F.col(b_start) / w)
    )
    if how_overlap == "closed":
        pred = (F.col(a_start) <= F.col(b_end)) & (
            F.col(b_start) <= F.col(a_end)
        )
    else:
        pred = (F.col(a_start) < F.col(b_end)) & (
            F.col(b_start) < F.col(a_end)
        )
    joined = (
        ca.join(cb, [*keys, "_cell"])
        .where(pred)
        .where(F.col("_cell") == first_shared)  # exactly-once, no distinct
    )
    return joined.drop("_cell")
