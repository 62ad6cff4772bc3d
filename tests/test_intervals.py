"""Grid-bucketed interval-overlap join vs brute force, and plan shape."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from hoard_spark.intervals import interval_overlap_join


def _intervals(seed, n=80, keys=3, span=200, max_len=30):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        s = rng.randrange(span)
        rows.append((i, rng.randrange(keys), s, s + rng.randrange(max_len)))
    return rows


def _brute(a_rows, b_rows, closed=True):
    out = set()
    for ai, ak, as_, ae in a_rows:
        for bi, bk, bs, be in b_rows:
            if ak != bk:
                continue
            hit = (as_ <= be and bs <= ae) if closed else (as_ < be and bs < ae)
            if hit:
                out.add((ai, bi))
    return out


@pytest.mark.parametrize("seed", [5, 42])
@pytest.mark.parametrize("width", [1, 7, 64, 1000])
@pytest.mark.parametrize("how", ["closed", "open"])
def test_interval_join_matches_brute_force(spark, seed, width, how):
    """Every (a, b) overlap appears EXACTLY once, for any grid width —
    including width 1 (max fan-out) and width >> span (single cell)."""
    a_rows = _intervals(seed, n=60)
    b_rows = _intervals(seed + 1, n=60)
    a = spark.createDataFrame(
        a_rows, "a_id long, k long, a_s long, a_e long"
    )
    b = spark.createDataFrame(
        b_rows, "b_id long, k long, b_s long, b_e long"
    )
    got = [
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(
            a, b, ["k"], ("a_s", "a_e"), ("b_s", "b_e"), width, how
        ).collect()
    ]
    assert len(got) == len(set(got)), "pair emitted more than once"
    assert set(got) == _brute(a_rows, b_rows, closed=(how == "closed"))


def test_interval_join_no_distinct_in_plan(spark):
    """Dedup is the first-shared-cell filter, not a shuffle: the plan
    must contain no aggregate beyond the joins."""
    a = spark.createDataFrame([(1, 1, 0, 10)], "a_id long, k long, a_s long, a_e long")
    b = spark.createDataFrame([(1, 1, 5, 15)], "b_id long, k long, b_s long, b_e long")
    j = interval_overlap_join(a, b, ["k"], ("a_s", "a_e"), ("b_s", "b_e"), 4)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Aggregate" not in plan and "Deduplicate" not in plan, plan[:1500]


def test_interval_join_rejects_column_collisions(spark):
    a = spark.createDataFrame([(1, 1, 0, 10)], "x long, k long, a_s long, a_e long")
    b = spark.createDataFrame([(1, 1, 5, 15)], "x long, k long, b_s long, b_e long")
    with pytest.raises(ValueError):
        interval_overlap_join(a, b, ["k"], ("a_s", "a_e"), ("b_s", "b_e"), 4)
    with pytest.raises(ValueError):
        interval_overlap_join(
            a.withColumnRenamed("x", "y"),
            b,
            ["k"],
            ("a_s", "a_e"),
            ("b_s", "b_e"),
            4,
            how_overlap="bogus",
        )
