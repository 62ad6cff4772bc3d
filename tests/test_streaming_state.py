"""Stateful streaming operator (applyInPandasWithState): the LWW
changelog must emit exactly the state TRANSITIONS — newest seq wins,
stale/duplicate arrivals across micro-batches are absorbed silently."""

from pyspark.sql import functions as F

from hoard_spark.streaming.state import lww_changelog

NOW = 1_400_000_000


def test_lww_changelog_emits_only_transitions(spark, tmp_path):
    path = str(tmp_path / "in")
    # micro-batch 1: two writes to bucket b1 (seq 1 then 2) + bucket b2
    spark.createDataFrame(
        [
            ("m", NOW, 1.0, 1),
            ("m", NOW, 2.0, 2),
            ("m", NOW + 60, 5.0, 3),
        ],
        "metric string, bucket_ts long, value double, seq long",
    ).coalesce(1).write.parquet(path)
    # micro-batch 2: a STALE replay of b1 (seq 1 — no emit), a fresh
    # winner for b2 (seq 4 — emit), and a new bucket b3 (emit)
    spark.createDataFrame(
        [
            ("m", NOW, 9.0, 1),
            ("m", NOW + 60, 6.0, 4),
            ("m", NOW + 120, 7.0, 5),
        ],
        "metric string, bucket_ts long, value double, seq long",
    ).coalesce(1).write.mode("append").parquet(path)

    stream = spark.readStream.schema(
        "metric string, bucket_ts long, value double, seq long"
    ).option("maxFilesPerTrigger", 1).parquet(path)
    q = (
        lww_changelog(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("lww_changelog_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["metric"], r["bucket_ts"], r["value"], r["seq"])
        for r in spark.table("lww_changelog_t").collect()
    }
    expect = {
        ("m", NOW, 2.0, 2),          # batch 1: b1's winner
        ("m", NOW + 60, 5.0, 3),     # batch 1: b2 first value
        ("m", NOW + 60, 6.0, 4),     # batch 2: b2's new winner
        ("m", NOW + 120, 7.0, 5),    # batch 2: new bucket
        # NO ("m", NOW, 9.0, 1): stale replay absorbed
    }
    assert got == expect


def test_lww_changelog_converges_to_batch_lww(spark, tmp_path):
    """Latest changelog row per bucket == the batch LWW over all inputs."""
    import random

    rng = random.Random(11)
    rows = []
    seq = 0
    for _ in range(200):
        rows.append(
            (
                f"m{rng.randrange(3)}",
                NOW + 60 * rng.randrange(10),
                float(rng.randrange(1000)),
                seq,
            )
        )
        seq += 1
    df = spark.createDataFrame(
        rows, "metric string, bucket_ts long, value double, seq long"
    )
    path = str(tmp_path / "in2")
    df.where(F.col("seq") < 100).coalesce(1).write.parquet(path)
    df.where(F.col("seq") >= 100).coalesce(1).write.mode("append").parquet(path)

    stream = spark.readStream.schema(
        "metric string, bucket_ts long, value double, seq long"
    ).option("maxFilesPerTrigger", 1).parquet(path)
    q = (
        lww_changelog(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("lww_changelog_c")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    log = spark.table("lww_changelog_c")
    latest = {
        (r["metric"], r["bucket_ts"]): r["value"]
        for r in log.groupBy("metric", "bucket_ts")
        .agg(F.max_by("value", "seq").alias("value"))
        .collect()
    }
    batch = {
        (r["metric"], r["bucket_ts"]): r["value"]
        for r in df.groupBy("metric", "bucket_ts")
        .agg(F.max_by("value", "seq").alias("value"))
        .collect()
    }
    assert latest == batch
