"""Sketch-rollup surface: merge-losslessness and accuracy pins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hoard_spark.sketches import (
    distinct_sketch_table,
    estimate,
    merge_distinct,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    from hoard_spark.queries import load

    return load(spark, SF, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )


def test_merge_equals_direct_sketch(spark, events):
    """Union-of-daily-sketches == one-shot sketch, exactly: HLL merge is
    lossless at equal lg_k, so the pre-aggregated table answers coarse
    queries with zero additional error — the property the scale path
    depends on."""
    daily = distinct_sketch_table(events, ["event_type", "day"], "user_id")
    merged = {
        r["event_type"]: r["approx_distinct"]
        for r in merge_distinct(daily, ["event_type"]).collect()
    }
    direct = {
        r["event_type"]: r["approx_distinct"]
        for r in estimate(
            distinct_sketch_table(events, ["event_type"], "user_id")
        ).collect()
    }
    assert merged == direct


def test_estimate_within_1pct_of_exact(spark, events):
    """lg_k=14 ⇒ ~0.8% RSE; pin 3 sigma ≈ 2.5% against exact distinct."""
    daily = distinct_sketch_table(events, ["event_type", "day"], "user_id")
    approx = {
        r["event_type"]: r["approx_distinct"]
        for r in merge_distinct(daily, ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert approx[k] == pytest.approx(n, rel=0.025)


def test_rows_accounting(spark, events):
    """The carried exact row counts survive the regroup."""
    daily = distinct_sketch_table(events, ["event_type", "day"], "user_id")
    total = merge_distinct(daily, ["event_type"]).agg(
        F.sum("rows").alias("n")
    ).collect()[0]["n"]
    assert total == events.count()
