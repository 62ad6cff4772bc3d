"""G6 — streaming ingest convergence (FIXTURES.md; SURVEY.md §5.4).

Replay a fixture-shaped point set through Structured Streaming in several
micro-batches with out-of-order delivery, points older than retention, and
future-dated points. After the stream drains the state must equal the batch
path: tier-0 LWW identical, rollups identical, invalid points absent.
"""

import os
import random

import pytest

from hoard_spark.engine import HoardEngine
from hoard_spark.streaming import start_ingest
from tests.whisper_fixture import TSDATA_JSON, read_tsdata

LARGE = [(3600, 8760), (86400, 1095)]


@pytest.mark.skipif(not os.path.exists(TSDATA_JSON), reason="fixture missing")
def test_g6_streaming_converges_to_batch(spark, tmp_path):
    # last ~90 days of the fixture keeps the test fast while exercising
    # multiple rollup days per batch
    points = read_tsdata()
    now = max(ts for ts, _ in points)
    points = [(ts, v) for ts, v in points if ts >= now - 90 * 86400]

    # ------------------------------------------------ batch reference state
    batch_engine = HoardEngine(spark, str(tmp_path / "wh_batch"))
    batch_engine.create("m", LARGE, x_files_factor=0.5)
    batch_engine.update_many("m", points, now=now)

    # -------------------------------------------------- streaming replay
    # seq = original chronological index (the source's event id); 10 % of
    # points are shuffled far from their neighbors => out-of-order across
    # micro-batches, late-but-within-retention.
    rng = random.Random(42)
    rows = [("m", ts, v, i) for i, (ts, v) in enumerate(points)]
    shuffled = rows[:]
    n_moved = len(shuffled) // 10
    for _ in range(n_moved):
        i, j = rng.randrange(len(shuffled)), rng.randrange(len(shuffled))
        shuffled[i], shuffled[j] = shuffled[j], shuffled[i]
    # invalid extras: older than maxRetention, and future-dated
    shuffled.append(("m", now - 94608000 - 3600, 666.0, 10_000_000))
    shuffled.append(("m", now + 7200, 777.0, 10_000_001))

    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    chunk = (len(shuffled) + 5) // 6
    for k in range(6):
        part = shuffled[k * chunk : (k + 1) * chunk]
        if part:
            spark.createDataFrame(
                part, "metric string, ts long, value double, seq long"
            ).coalesce(1).write.mode("overwrite").parquet(str(src_dir / f"b{k}"))

    stream_engine = HoardEngine(spark, str(tmp_path / "wh_stream"))
    stream_engine.create("m", LARGE, x_files_factor=0.5)
    stream_df = (
        spark.readStream.schema("metric string, ts long, value double, seq long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir / "b*"))
    )
    q = start_ingest(
        stream_engine,
        stream_df,
        checkpoint_dir=str(tmp_path / "ckpt"),
        now_fn=lambda: now,
    )
    q.awaitTermination(600)

    # ------------------------------------------------------- convergence
    def tier_state(engine, tier):
        return {
            r["bucket_ts"]: r["value"]
            for r in engine.tier_view("m", tier).collect()
        }

    assert tier_state(stream_engine, 0) == tier_state(batch_engine, 0)
    assert tier_state(stream_engine, 1) == tier_state(batch_engine, 1)

    # invalid points never landed
    all_vals = set(tier_state(stream_engine, 0).values()) | set(
        tier_state(stream_engine, 1).values()
    )
    assert 666.0 not in all_vals and 777.0 not in all_vals

    # spot-check the fetch surface too
    ti_b, v_b = batch_engine.fetch("m", 1311277105, 1311295105, now=now)
    ti_s, v_s = stream_engine.fetch("m", 1311277105, 1311295105, now=now)
    assert tuple(ti_b) == tuple(ti_s) and v_b == v_s == [1043, 3946, 1692, 899, 2912]


def test_unknown_metric_does_not_kill_stream(spark, tmp_path):
    engine = HoardEngine(spark, str(tmp_path / "wh"))
    engine.create("known", [(60, 100), (3600, 100)])
    now = 1_700_003_600
    rows = [("known", now - 120, 1.0, 0), ("ghost", now - 120, 2.0, 1)]
    src = tmp_path / "src"
    spark.createDataFrame(
        rows, "metric string, ts long, value double, seq long"
    ).write.parquet(str(src))
    stream_df = spark.readStream.schema(
        "metric string, ts long, value double, seq long"
    ).parquet(str(src))
    q = start_ingest(
        engine, stream_df, checkpoint_dir=str(tmp_path / "ckpt"), now_fn=lambda: now
    )
    q.awaitTermination(300)
    _, values = engine.fetch("known", now - 180, now - 60, now=now)
    assert 1.0 in values
