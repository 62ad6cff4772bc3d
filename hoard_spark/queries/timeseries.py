"""Q1-Q5 — the reference's core time-series semantics phrased over the
``events`` table (SURVEY.md §2C): ``metric := event_type``, ``seq :=
event_id``, hourly tier-0 buckets, daily tier-1 rollups.

These pin the hoard/Whisper contract (§2A) in oracle-checkable SQL; the
engine-API equivalents are exercised by tests/test_ingest_fetch.py and
tests/test_rollup.py against the binary fixture goldens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hoard_spark.queries import davg, dsum10, load, query

# Window/clock constants for Q4/Q5 (events span 2024-01-01 .. 2024-01-30).
Q4_FROM = "2024-01-10 06:30:00"
Q4_TO = "2024-01-12 18:45:00"
Q5_NOW = "2024-01-20 00:00:00"


def _t0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tier-0 view: hourly bucket LWW by ingest sequence (ref O3/O4/O5)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.max_by("value", "event_id").alias("v"))
    )


@query(
    "q01_bucket_lww",
    "tier-0 upsert semantics: last write (by seq) wins per hourly bucket",
    """
    SELECT event_type, date_trunc('hour', ts) AS bucket,
           ROUND(max_by(value, event_id), 4) AS v
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "SURVEY.md §2C Q1 (O3/O4/O5; src/hoard.coffee:223)",
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t0(spark, sf_dir)
        .select("event_type", "bucket", F.round("v", 4).alias("v"))
        .orderBy("event_type", "bucket")
    )


@query(
    "q02_rollup_xff",
    "tier-1 daily rollup: mean of hourly values, xff=0.5 gate (>=12 of 24)",
    """
    WITH t0 AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               max_by(value, event_id) AS v
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, CAST(date_trunc('day', bucket) AS DATE) AS day,
           CAST(ROUND(CAST(CAST(SUM(CAST(v AS DECIMAL(25,10))) AS DOUBLE)
                           / COUNT(*) AS DECIMAL(25,10)), 4) AS DOUBLE) AS cf,
           COUNT(*) AS known
    FROM t0 GROUP BY 1, 2 HAVING COUNT(*) >= 12 ORDER BY 1, 2
    """,
    "SURVEY.md §2C Q2 (O6; src/hoard.coffee:153-156)",
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    # day as DATE on both sides: DuckDB's date_trunc('day', ts) yields DATE
    # while Spark's yields TIMESTAMP — cast both to DATE (VERDICT.md r1 #3).
    return (
        _t0(spark, sf_dir)
        .groupBy("event_type", F.to_date(F.date_trunc("day", "bucket")).alias("day"))
        .agg(davg("v").alias("cf"), F.count("*").alias("known"))
        .where(F.col("known") >= 12)
        .orderBy("event_type", "day")
    )


@query(
    "q03_cascaded_rollup",
    "cascaded rollup: averages of daily averages, NOT avg of raw",
    """
    WITH t0 AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               max_by(value, event_id) AS v
        FROM events GROUP BY 1, 2
    ), t1 AS (
        SELECT event_type, date_trunc('day', bucket) AS day,
               CAST(SUM(CAST(v AS DECIMAL(25,10))) AS DOUBLE) / COUNT(*) AS v
        FROM t0 GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(ROUND(CAST(CAST(SUM(CAST(v AS DECIMAL(25,10))) AS DOUBLE)
                           / COUNT(*) AS DECIMAL(25,10)), 4) AS DOUBLE) AS cf
    FROM t1 GROUP BY 1 ORDER BY 1
    """,
    "SURVEY.md §2C Q3 (O6 cascade; src/hoard.coffee:364-379)",
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    t1 = (
        _t0(spark, sf_dir)
        .groupBy("event_type", F.date_trunc("day", "bucket").alias("day"))
        .agg((dsum10("v") / F.count("v")).alias("v"))
    )
    return (
        t1.groupBy("event_type")
        .agg(davg("v").alias("cf"))
        .orderBy("event_type")
    )


@query(
    "q04_range_fetch",
    "fetch window semantics: buckets strictly after from's bucket, "
    "inclusive of to's bucket",
    f"""
    WITH t0 AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               ROUND(max_by(value, event_id), 4) AS v
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, bucket, v FROM t0
    WHERE bucket > date_trunc('hour', TIMESTAMP '{Q4_FROM}')
      AND bucket <= date_trunc('hour', TIMESTAMP '{Q4_TO}')
    ORDER BY event_type, bucket
    """,
    "SURVEY.md §2C Q4 (O7; src/hoard.coffee:440-441)",
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    t0 = _t0(spark, sf_dir).select(
        "event_type", "bucket", F.round("v", 4).alias("v")
    )
    lo = F.date_trunc("hour", F.lit(Q4_FROM).cast("timestamp"))
    hi = F.date_trunc("hour", F.lit(Q4_TO).cast("timestamp"))
    return t0.where((F.col("bucket") > lo) & (F.col("bucket") <= hi)).orderBy(
        "event_type", "bucket"
    )


@query(
    "q05_retention_filter",
    "retention window: only points with 0 <= now-ts < 30 days survive",
    f"""
    SELECT COUNT(*) AS n FROM events
    WHERE ts > TIMESTAMP '{Q5_NOW}' - INTERVAL 30 DAY
      AND ts <= TIMESTAMP '{Q5_NOW}'
    """,
    "SURVEY.md §2C Q5 (src/hoard.coffee:186-189, 274-275)",
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    now = F.lit(Q5_NOW).cast("timestamp")
    return (
        load(spark, sf_dir, "events")
        .where(
            (F.col("ts") > now - F.expr("INTERVAL 30 DAY")) & (F.col("ts") <= now)
        )
        .agg(F.count("*").alias("n"))
    )


@query(
    "q83_gapfill",
    "fetch null-fill spine: dense hourly buckets per metric between its "
    "first and last point, NULL (is_gap) where no data landed",
    """
    WITH t0 AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               max_by(value, event_id) AS v
        FROM events GROUP BY 1, 2
    ),
    spine AS (
        SELECT event_type,
               unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
        FROM (SELECT event_type, MIN(bucket) AS mn, MAX(bucket) AS mx
              FROM t0 GROUP BY 1)
    )
    SELECT s.event_type, s.bucket, ROUND(t0.v, 4) AS v,
           CAST(t0.bucket IS NULL AS BOOLEAN) AS is_gap
    FROM spine s LEFT JOIN t0 USING (event_type, bucket)
    ORDER BY 1, 2
    """,
    "SURVEY.md §2C Q83 (O7 fetch gap-fill, src/hoard.coffee:493-512 — "
    "the null-fill spine, previously engine-API-tested only (golden "
    "G3); Spark `sequence`+`explode` vs DuckDB `generate_series` is a "
    "declared dialect divergence, hash-match on results)",
)
def q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's fetch materializes one slot per bucket in the
    window, known or not (src/hoard.coffee:493-512: values[i] stays
    null where no slot matched). Spine generation is per-metric
    `sequence(min, max, 1h)` + explode — spine size is buckets-per-
    metric (bounded by retention), never data-sized, and the left join
    back to tier-0 shares the (event_type, bucket) shuffle with the
    aggregation above it. The engine API twin (fetch's timeInfo-aligned
    null vector) is pinned by golden G3; this pins the same semantics
    driver-side."""
    t0 = _t0(spark, sf_dir)
    spine = (
        t0.groupBy("event_type")
        .agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
        .select(
            "event_type",
            F.explode(
                F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket"),
        )
    )
    return (
        spine.join(
            t0.withColumn("_present", F.lit(True)),
            ["event_type", "bucket"],
            "left",
        )
        .select(
            "event_type",
            "bucket",
            F.round("v", 4).alias("v"),
            # join-miss, NOT v-null: a bucket whose LWW value is NULL is
            # a known slot, not a gap (matches the oracle's t0.bucket IS
            # NULL test)
            F.col("_present").isNull().alias("is_gap"),
        )
        .orderBy("event_type", "bucket")
    )
