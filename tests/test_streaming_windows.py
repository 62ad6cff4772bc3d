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


def test_streaming_sessionization_converges_to_q48(spark, tmp_path):
    """Drive the REAL q48 event stream (sf0.001 events table) through a
    checkpointed session_window aggregation and roll it up to q48's
    per-user output — the last declared streaming behavior now pinned to
    its batch twin. Durations come from min/max event time inside each
    session (session_window's end includes the +gap padding, which the
    batch sessionization does not count)."""
    from hoard_spark.queries import all_queries, dround, dsum10, load

    sf_dir = "/root/testdata/sf0.001"
    src = load(spark, sf_dir, "events").select(
        "user_id", F.col("ts").alias("tstamp")
    )
    path = str(tmp_path / "q48_stream")
    # two time-ordered chunks (lateness stays inside the watermark) +
    # a far-future flush sentinel so append mode closes every window
    mid = src.agg(
        F.expr("percentile_approx(unix_seconds(tstamp), 0.5)")
    ).first()[0]
    src.where(F.unix_seconds("tstamp") <= mid).coalesce(1).write.parquet(path)
    src.where(F.unix_seconds("tstamp") > mid).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    hi = src.agg(F.max("tstamp")).first()[0]
    spark.createDataFrame(
        [(-1, hi)], "user_id long, tstamp timestamp"
    ).withColumn(
        "tstamp", F.col("tstamp") + F.expr("INTERVAL 30 DAYS")
    ).coalesce(1).write.mode("append").parquet(path)

    stream = (
        spark.readStream.schema("user_id long, tstamp timestamp")
        .parquet(path)
        .withWatermark("tstamp", "25 hours")
    )
    q = (
        stream.groupBy("user_id", F.session_window("tstamp", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.unix_micros(F.min("tstamp")).alias("lo_us"),
            F.unix_micros(F.max("tstamp")).alias("hi_us"),
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("q48_sessions")
        .option("checkpointLocation", f"{tmp_path}/ckpt_q48")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    sess = spark.table("q48_sessions").where(F.col("user_id") != -1)
    dur = (F.col("hi_us") - F.col("lo_us")) / 1_000_000.0
    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"], r["avg_dur_s"])
        for r in sess.withColumn("dur_s", dur)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
            dround(dsum10(F.col("dur_s")) / F.count("*")).alias("avg_dur_s"),
        )
        .collect()
    }
    batch = {
        r["user_id"]: (r["n_sessions"], r["n_events"], r["avg_dur_s"])
        for r in all_queries()["q48_sessionize"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert got == batch and len(got) > 0
