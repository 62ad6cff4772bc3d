"""table_diff: presence/value reconciliation semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hoard_spark.diff import table_diff


def test_diff_classifies_all_change_kinds(spark):
    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c"), (4, 40.0, "d")],
        "k long, v double, s string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 99.0, "b"), (4, 40.0, "X"), (5, 50.0, "e")],
        "k long, v double, s string",
    )
    got = {
        r["k"]: r["change"] for r in table_diff(old, new, ["k"]).collect()
    }
    assert got == {2: "changed", 3: "removed", 4: "changed", 5: "added"}
    # unchanged key 1 is absent: output is delta-sized


def test_diff_null_to_null_is_not_a_change(spark):
    old = spark.createDataFrame([(1, None), (2, None)], "k long, v double")
    new = spark.createDataFrame([(1, None), (2, 5.0)], "k long, v double")
    got = {
        r["k"]: r["change"] for r in table_diff(old, new, ["k"]).collect()
    }
    assert got == {2: "changed"}  # NULL -> NULL must NOT appear


def test_diff_carries_both_sides_values(spark):
    old = spark.createDataFrame([(1, 10.0)], "k long, v double")
    new = spark.createDataFrame([(1, 11.0)], "k long, v double")
    row = table_diff(old, new, ["k"]).first()
    assert row["old_vals"]["v"] == 10.0 and row["new_vals"]["v"] == 11.0


def test_diff_compare_subset_ignores_other_columns(spark):
    old = spark.createDataFrame([(1, 10.0, "x")], "k long, v double, noise string")
    new = spark.createDataFrame([(1, 10.0, "y")], "k long, v double, noise string")
    assert table_diff(old, new, ["k"], compare=["v"]).count() == 0


def test_diff_validation(spark):
    old = spark.createDataFrame([(1, 10.0)], "k long, v double")
    new = spark.createDataFrame([(1, 10.0)], "k long, v double")
    with pytest.raises(ValueError):
        table_diff(old, new, ["k"], compare=["nope"])
    bad = old.withColumnRenamed("v", "change")
    with pytest.raises(ValueError):
        table_diff(bad, bad, ["k"])


def test_diff_plan_is_one_join_no_cartesian(spark):
    old = spark.createDataFrame([(1, 10.0)], "k long, v double")
    new = spark.createDataFrame([(1, 11.0)], "k long, v double")
    plan = (
        table_diff(old, new, ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Join") == 1
    assert "CartesianProduct" not in plan
