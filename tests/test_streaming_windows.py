"""Streaming window surface (SURVEY §2C tail): tumbling, sliding and
session windows over a file stream with watermarking, each converging to
the identical batch computation. New surface relative to the reference —
its only windows are the storage buckets (SURVEY §2B) — but the natural
query layer for a streaming metrics engine.
"""

import pytest
from pyspark.sql import functions as F

NOW = 1_400_000_000


@pytest.fixture(scope="module")
def events(spark, tmp_path_factory):
    """Small deterministic event set: 3 metrics x irregular timestamps,
    including an out-of-order (late but within watermark) batch."""
    rows = []
    for m in range(3):
        for i in range(120):
            # bursts with gaps > 30 min so session windows split
            burst_start = NOW + m * 7 + (i // 20) * 7200
            rows.append((f"m{m}", burst_start + (i % 20) * 60, float(i)))
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    path = str(tmp_path_factory.mktemp("stream") / "events")
    df.where(F.col("value") < 60).coalesce(1).write.parquet(path)
    df.where(F.col("value") >= 60).coalesce(1).write.mode("append").parquet(path)
    # append-mode window aggs only emit once the watermark passes the
    # window end; a far-future flush sentinel closes every real window
    # (excluded from both sides of the comparison)
    flush = spark.createDataFrame(
        [("zz_flush", NOW + 86_400 * 30, 0.0)],
        "metric string, ts long, value double",
    )
    flush.coalesce(1).write.mode("append").parquet(path)
    return df, path


def _run_stream(spark, path, agg_builder, tmp, name):
    stream = (
        spark.readStream.schema("metric string, ts long, value double")
        .parquet(path)
        .withColumn("tstamp", F.timestamp_seconds("ts"))
        .withWatermark("tstamp", "1 hour")
    )
    q = (
        agg_builder(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", f"{tmp}/ckpt_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_sliding_window_converges_to_batch(spark, events, tmp_path):
    df, path = events

    def agg(s):
        return s.groupBy(
            "metric", F.window("tstamp", "1 hour", "15 minutes")
        ).agg(F.avg("value").alias("avg_v"), F.count("*").alias("n"))

    got = {
        (r["metric"], r["window"]["start"], r["window"]["end"]):
        (round(r["avg_v"], 9), r["n"])
        for r in _run_stream(spark, path, agg, tmp_path, "sliding")
        .where(F.col("metric") != "zz_flush").collect()
    }
    expect = {
        (r["metric"], r["window"]["start"], r["window"]["end"]):
        (round(r["avg_v"], 9), r["n"])
        for r in df.withColumn("tstamp", F.timestamp_seconds("ts"))
        .groupBy("metric", F.window("tstamp", "1 hour", "15 minutes"))
        .agg(F.avg("value").alias("avg_v"), F.count("*").alias("n"))
        .collect()
    }
    assert got == expect
    assert len(got) > 0


def test_session_window_converges_to_batch(spark, events, tmp_path):
    df, path = events

    def agg(s):
        return s.groupBy(
            "metric", F.session_window("tstamp", "30 minutes")
        ).agg(F.count("*").alias("n"), F.sum("value").alias("s"))

    got = {
        (r["metric"], r["session_window"]["start"], r["session_window"]["end"]):
        (r["n"], round(r["s"], 9))
        for r in _run_stream(spark, path, agg, tmp_path, "session")
        .where(F.col("metric") != "zz_flush").collect()
    }
    expect = {
        (r["metric"], r["session_window"]["start"], r["session_window"]["end"]):
        (r["n"], round(r["s"], 9))
        for r in df.withColumn("tstamp", F.timestamp_seconds("ts"))
        .groupBy("metric", F.session_window("tstamp", "30 minutes"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == expect
    # the burst gaps are 2 h - 19 min of data > 30 min timeout: every
    # 20-event burst is its own session
    assert all(n == 20 for n, _ in got.values())
