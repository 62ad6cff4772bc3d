"""Range fetch — tier routing + bucket filter + spine gap-fill (reference O7).

Reference semantics reproduced (src/hoard.coffee:426-513):

- Clamp ``from`` to ``now - maxRetention`` (:429-430); error unless
  ``from < to`` (:431); clamp ``to`` to ``now`` (:432).
- Route to the *first* (highest-precision) archive with
  ``retention >= now - from`` (:437-438) — one tier answers the whole query;
  resolutions are never mixed.
- Result covers buckets ``[align(from) + spp, align(to) + spp)`` — strictly
  after ``from``'s bucket, inclusive of ``to``'s bucket (:440-441).
- One slot per bucket; ``null`` where no point exists (:450-456, 504-509).
- Returns ``(timeInfo = (fromInterval, toInterval, step), values)`` (:511).

Spark design: the routing decision is driver-side planning (the
materialized-view-routing choice, SURVEY.md §4); the data path is a single
partition-pruned Parquet scan filtered on ``bucket_ts`` range, left-joined
against a generated bucket spine for gap-fill. For small result vectors the
driver collects; ``fetch_df`` returns the undriven DataFrame for distributed
consumers.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hoard_spark.catalog import ArchiveInfo, HoardError, MetricInfo
from hoard_spark.functions import align_ts, spine


@dataclass(frozen=True)
class TimeInfo:
    from_interval: int
    to_interval: int
    step: int

    def __iter__(self):
        return iter((self.from_interval, self.to_interval, self.step))


def plan_fetch(
    info: MetricInfo, from_ts: int, to_ts: int, now: int
) -> tuple[ArchiveInfo, TimeInfo]:
    """Clamp the range and pick the answering tier (driver-side planning)."""
    oldest = now - info.max_retention
    if from_ts < oldest:
        from_ts = oldest  # clamp (src/hoard.coffee:429-430)
    if from_ts >= to_ts:
        raise HoardError("invalid time interval: from must be before to")
    if to_ts > now:
        to_ts = now  # clamp (src/hoard.coffee:432)

    diff = now - from_ts
    archive = info.archive_for_age(diff)
    if archive is None:  # unreachable after the clamp, kept for parity
        raise HoardError("no archive covers the requested range")

    spp = archive.seconds_per_point
    from_interval = align_ts(from_ts, spp) + spp
    to_interval = align_ts(to_ts, spp) + spp
    return archive, TimeInfo(from_interval, to_interval, spp)


def fetch_df(tier_view: DataFrame, ti: TimeInfo) -> DataFrame:
    """Gap-filled result: one row per bucket in [from_interval, to_interval).

    ``tier_view`` must have columns ``metric, bucket_ts, value`` with one row
    per bucket (LWW-normalized). The bucket_ts range predicate is pushed into
    the Parquet scan (partition pruning on date + row-group min/max); the
    spine join is a broadcast of the generated sequence.
    """
    spark = tier_view.sparkSession
    sp = spine(spark, ti.from_interval, ti.to_interval, ti.step)
    data = tier_view.where(
        (F.col("bucket_ts") >= ti.from_interval) & (F.col("bucket_ts") < ti.to_interval)
    ).select("bucket_ts", "value")
    # Both sides are bounded by the output bucket count after the range
    # filter; broadcast the data side so the gap-fill join never shuffles
    # (Spark can't build the left side of a LEFT join, so the hint goes on
    # the probe data, not the spine).
    return (
        sp.join(F.broadcast(data), "bucket_ts", "left")
        .orderBy("bucket_ts")
        .select("bucket_ts", "value")
    )


def collect_values(result: DataFrame, ti: TimeInfo) -> list[float | None]:
    """Driver-side values vector in bucket order (the reference API shape)."""
    n = max(0, (ti.to_interval - ti.from_interval) // ti.step)
    values: list[float | None] = [None] * n
    for row in result.collect():
        idx = (row["bucket_ts"] - ti.from_interval) // ti.step
        if 0 <= idx < n:
            values[idx] = row["value"]
    return values
