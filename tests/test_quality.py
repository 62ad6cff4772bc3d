"""Data-quality operators (hoard_spark/quality.py).

Contract: profile_columns computes every column's profile in ONE scan
(one Expand-rewritten aggregate — pinned by plan in test_plan_audit's
q101 entry and by node count here); exact distinct is the conformance
semantics with approx (HLL) the declared scale path pinned within 5%;
validate's checks follow SQL CHECK semantics (NULL condition counts as
a violation for ``satisfies``, NULL keys are skipped by ``unique`` /
``references`` / ``in_range``).
"""

import re

from pyspark.sql import functions as F

from hoard_spark.quality import (
    Check,
    in_range,
    not_null,
    profile_columns,
    references,
    satisfies,
    unique,
    validate,
)


def _frame(spark):
    rows = [
        (1, "a", 10.0),
        (2, "b", None),
        (2, None, -3.5),
        (4, "b", 99.25),
        (None, "c", 10.0),
    ]
    return spark.createDataFrame(rows, "k long, s string, x double")


def test_profile_counts_nulls_distinct_and_numeric_stats(spark):
    got = {
        r["col"]: tuple(r)[1:]
        for r in profile_columns(_frame(spark)).collect()
    }
    # n_nulls, n_distinct, min, max, mean(round4)
    assert got["k"] == (1, 3, 1.0, 4.0, 2.25)
    assert got["s"] == (1, 3, None, None, None)
    assert got["x"] == (1, 3, -3.5, 99.25, round((10 - 3.5 + 99.25 + 10) / 4, 4))


def test_profile_is_one_scan_one_expand(spark):
    df = profile_columns(_frame(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"\bExpand\b", plan)) == 1
    assert len(re.findall(r"ExistingRDD|Scan", plan)) <= 2


def test_profile_approx_within_5pct(spark):
    n = 20_000
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 997).alias("m")
    )
    got = {
        r["col"]: r["n_distinct"]
        for r in profile_columns(df, ["k", "m"], approx=True).collect()
    }
    assert abs(got["k"] - n) / n < 0.05
    assert abs(got["m"] - 997) / 997 < 0.05


def test_validate_check_semantics(spark):
    df = _frame(spark)
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    checks = [
        unique(df, "k"),  # k=2 twice -> 1 extra copy; NULL key skipped
        not_null(df, "s"),  # one NULL
        in_range(df, "x", 0, 50),  # -3.5 and 99.25 out; NULL skipped
        references(df, "k", parent, "pk"),  # k=4 dangles; NULL skipped
        satisfies(df, "x_pos", F.col("x") > 0),  # -3.5 false, NULL x false
    ]
    got = {r["constraint"]: r["violations"] for r in validate(checks).collect()}
    assert got == {
        "unique(k)": 1,
        "not_null(s)": 1,
        "in_range(x,0,50)": 2,
        "references(k->pk)": 1,
        "x_pos": 2,
    }


def test_validate_empty_raises(spark):
    import pytest

    with pytest.raises(ValueError, match="empty check list"):
        validate([])


def test_check_names_are_stable(spark):
    df = _frame(spark)
    assert unique(df, "k").name == "unique(k)"
    assert in_range(df, "x", 0, 50).name == "in_range(x,0,50)"
    assert isinstance(
        references(df, "k", df, "k", name="custom"), Check
    )
