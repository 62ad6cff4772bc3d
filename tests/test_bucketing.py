"""Bucketed tables: the co-located join must have NO shuffle Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hoard_spark.bucketing import cobucketed_join, write_bucketed

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    from hoard_spark.queries import load

    root = tmp_path_factory.mktemp("bucketed")
    orders = load(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(
        orders, "t_orders_b", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"], path=str(root / "orders"),
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"], path=str(root / "lineitem"),
    )
    yield "t_orders_b", "t_lineitem_b", orders, lineitem
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_cobucketed_join_has_no_shuffle(spark, bucketed_tables):
    ta, tb, _, _ = bucketed_tables
    j = cobucketed_join(spark, ta, tb, ["o_orderkey"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan[:1500]
    assert "Exchange hashpartitioning" not in plan, plan[:1500]


def test_unbucketed_twin_does_shuffle(spark, bucketed_tables):
    """Control: the identical join over plain parquet scans needs the
    shuffle the bucketed layout pre-paid."""
    _, _, orders, lineitem = bucketed_tables
    j = orders.hint("merge").join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        ["o_orderkey"],
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan, plan[:1500]


def test_cobucketed_join_results_match(spark, bucketed_tables):
    ta, tb, orders, lineitem = bucketed_tables
    got = (
        cobucketed_join(spark, ta, tb, ["o_orderkey"])
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity")).cast("long").alias("sq"),
        )
        .first()
    )
    want = (
        orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            ["o_orderkey"],
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity")).cast("long").alias("sq"),
        )
        .first()
    )
    assert (got["n"], got["sq"]) == (want["n"], want["sq"]) and got["n"] > 0


def test_bucketed_agg_has_no_shuffle(spark, bucketed_tables):
    """groupBy on the bucket key also rides the bucketing — aggregation
    without an Exchange."""
    ta, _, _, _ = bucketed_tables
    agg = spark.table(ta).groupBy("o_orderkey").agg(
        F.sum("o_totalprice").alias("s")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan[:1500]
