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


# ---------------------------------------------------------------------------
# Quantile sketches (mergeable equi-depth histograms)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def value_events(spark):
    from hoard_spark.queries import load

    return load(spark, SF, "events").select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )


def test_quantile_merge_equals_direct(spark, value_events):
    """Summing daily count arrays == one-shot histogram on the same
    grid, exactly — the losslessness the pre-aggregated table needs."""
    from hoard_spark.sketches import (
        merge_quantile,
        quantile_boundaries,
        quantile_sketch_table,
    )

    bounds = quantile_boundaries(value_events, "value", 64)
    daily = quantile_sketch_table(
        value_events, ["event_type", "day"], "value", boundaries=bounds
    )
    merged = {
        r["event_type"]: (r["counts"], r["rows"], r["vmin"], r["vmax"])
        for r in merge_quantile(daily, ["event_type"]).collect()
    }
    direct = {
        r["event_type"]: (r["counts"], r["rows"], r["vmin"], r["vmax"])
        for r in quantile_sketch_table(
            value_events, ["event_type"], "value", boundaries=bounds
        ).collect()
    }
    assert merged == direct and merged


def test_quantile_rank_error_within_bound(spark, value_events):
    """The estimate's RANK must be within 1/bins (+approx slack) of the
    requested quantile — the histogram's guaranteed error metric (value
    error in a long tail is bin-width-bound by design)."""
    from hoard_spark.sketches import (
        merge_quantile,
        quantile_estimate,
        quantile_sketch_table,
    )

    bins = 64
    daily = quantile_sketch_table(
        value_events, ["event_type", "day"], "value", bins=bins
    )
    qs = [0.1, 0.5, 0.9, 0.99]
    est = quantile_estimate(
        merge_quantile(daily, ["event_type"]), qs
    ).select("event_type", "approx_quantiles")
    joined = value_events.join(
        F.broadcast(est), "event_type"
    ).groupBy("event_type").agg(
        F.count("*").alias("n"),
        *[
            F.sum(
                (F.col("value") <= F.element_at("approx_quantiles", i + 1))
                .cast("long")
            ).alias(f"le_{i}")
            for i in range(len(qs))
        ],
    )
    slack = 1.0 / bins + 0.02  # grid resolution + percentile_approx error
    for r in joined.collect():
        for i, q in enumerate(qs):
            rank = r[f"le_{i}"] / r["n"]
            assert abs(rank - q) <= slack, (r["event_type"], q, rank)


def test_quantile_rows_accounting(spark, value_events):
    from hoard_spark.sketches import merge_quantile, quantile_sketch_table

    daily = quantile_sketch_table(
        value_events, ["event_type", "day"], "value", bins=32
    )
    merged = merge_quantile(daily, ["event_type"])
    total = merged.agg(F.sum("rows").alias("n")).collect()[0]["n"]
    n_nonnull = value_events.where(F.col("value").isNotNull()).count()
    assert total == n_nonnull
    # count arrays themselves must also sum to the row count
    bad = merged.where(
        F.aggregate(
            "counts", F.lit(0).cast("long"), lambda a, x: a + x
        ) != F.col("rows")
    ).count()
    assert bad == 0


def test_quantile_first_bin_low_q(spark, value_events):
    """Regression (ADVICE r6): any q <= 1/bins lands in histogram bin 1,
    where lo_cum must NOT evaluate try_element_at(_cum, 0) — Spark
    rejects array index 0 (INVALID_INDEX_OF_ZERO) even in
    try_element_at. Pin both that the call succeeds and that the
    estimate's rank is within the grid bound."""
    from hoard_spark.sketches import (
        merge_quantile,
        quantile_estimate,
        quantile_sketch_table,
    )

    bins = 64
    daily = quantile_sketch_table(
        value_events, ["event_type", "day"], "value", bins=bins
    )
    qs = [0.01, 1.0 / bins]  # both strictly inside bin 1 on uniform data
    est = quantile_estimate(
        merge_quantile(daily, ["event_type"]), qs
    ).select("event_type", "approx_quantiles")
    rows = est.collect()  # pre-fix this raised INVALID_INDEX_OF_ZERO
    assert rows
    joined = value_events.join(
        F.broadcast(est), "event_type"
    ).groupBy("event_type").agg(
        F.count("*").alias("n"),
        *[
            F.sum(
                (F.col("value") <= F.element_at("approx_quantiles", i + 1))
                .cast("long")
            ).alias(f"le_{i}")
            for i in range(len(qs))
        ],
    )
    slack = 1.0 / bins + 0.02
    for r in joined.collect():
        for i, q in enumerate(qs):
            rank = r[f"le_{i}"] / r["n"]
            assert abs(rank - q) <= slack, (r["event_type"], q, rank)
