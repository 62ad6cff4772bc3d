"""Incremental sketch maintenance: N-batch state == one-shot table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hoard_spark.sketches import (
    distinct_sketch_table,
    estimate,
    merge_distinct,
    merge_quantile,
    quantile_boundaries,
    quantile_estimate,
    quantile_sketch_table,
)
from hoard_spark.streaming.sketches import (
    distinct_maintenance_sink,
    update_distinct_state,
    update_quantile_state,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    from hoard_spark.queries import load

    return load(spark, SF, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        "user_id",
        "value",
    )


def _batches(events, n=3):
    # split by a value hash, NOT by user: the same user (and the same
    # (event_type, day) group) lands in several batches, so the state
    # merge must dedup across batches — the property that matters
    return [
        events.where(F.pmod(F.abs(F.hash("value")), F.lit(n)) == i)
        for i in range(n)
    ]


def test_incremental_distinct_equals_oneshot(spark, events, tmp_path):
    state = f"file://{tmp_path}/hll_state"
    for b in _batches(events):
        got = update_distinct_state(
            spark, state, b, ["event_type", "day"], "user_id"
        )
    inc = {
        r["event_type"]: r["approx_distinct"]
        for r in merge_distinct(got, ["event_type"]).collect()
    }
    one = {
        r["event_type"]: r["approx_distinct"]
        for r in merge_distinct(
            distinct_sketch_table(events, ["event_type", "day"], "user_id"),
            ["event_type"],
        ).collect()
    }
    assert inc == one and inc


def test_incremental_quantile_equals_oneshot(spark, events, tmp_path):
    state = f"file://{tmp_path}/q_state"
    bounds = quantile_boundaries(events, "value", 32)
    for b in _batches(events):
        got = update_quantile_state(
            spark, state, b, ["event_type", "day"], "value", bounds
        )
    inc = {
        (r["event_type"], str(r["day"])): (r["counts"], r["rows"])
        for r in got.collect()
    }
    one = {
        (r["event_type"], str(r["day"])): (r["counts"], r["rows"])
        for r in quantile_sketch_table(
            events, ["event_type", "day"], "value", boundaries=bounds
        ).collect()
    }
    assert inc == one and inc
    # and a merged estimate off the incremental state matches the
    # one-shot estimate exactly (same state -> same inversion)
    e_inc = quantile_estimate(merge_quantile(got, ["event_type"]), [0.5])
    e_one = quantile_estimate(
        merge_quantile(
            quantile_sketch_table(
                events, ["event_type", "day"], "value", boundaries=bounds
            ),
            ["event_type"],
        ),
        [0.5],
    )
    assert {
        r["event_type"]: r["approx_quantiles"] for r in e_inc.collect()
    } == {r["event_type"]: r["approx_quantiles"] for r in e_one.collect()}


def test_foreachbatch_sink_drives_state(spark, events, tmp_path):
    """End-to-end: a checkpointed file stream through the foreachBatch
    maintenance sink leaves the same state as the one-shot build."""
    src_path = str(tmp_path / "src")
    for i, b in enumerate(_batches(events)):
        b.coalesce(1).write.mode("append").parquet(src_path)
    state = f"file://{tmp_path}/stream_state"
    stream = spark.readStream.schema(
        "event_type string, day date, user_id long, value double"
    ).option("maxFilesPerTrigger", 1).parquet(src_path)
    q = (
        stream.writeStream.foreachBatch(
            distinct_maintenance_sink(state, ["event_type"], "user_id")
        )
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    inc = {
        r["event_type"]: r["approx_distinct"]
        for r in estimate(spark.read.parquet(state)).select(
            "event_type", "approx_distinct"
        ).collect()
    }
    one = {
        r["event_type"]: r["approx_distinct"]
        for r in estimate(
            distinct_sketch_table(events, ["event_type"], "user_id")
        ).collect()
    }
    assert inc == one and inc
