"""Library as-of join: property pin vs a pure-Python model + plan shape."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hoard_spark.asof import ASOF_ORDER, asof_backward

_refs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.integers(min_value=0, max_value=50),  # order
        st.one_of(  # null carry VALUES must ride through faithfully
            st.none(), st.integers(min_value=-100, max_value=100)
        ),
    ),
    min_size=0,
    max_size=40,
    unique_by=lambda t: (t[0], t[1]),  # the operator's uniqueness contract
)
_probes = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.integers(min_value=0, max_value=50),  # order
    ),
    min_size=0,
    max_size=40,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    refs=_refs,
    probes=_probes,
    skew_buckets=st.sampled_from([0, 4]),
)
def test_asof_backward_matches_model(spark, refs, probes, skew_buckets):
    """Each probe row gets the latest reference row with order <= its
    own (per key), including the simultaneous case; a matching row with
    a NULL carry value yields (null value, that row's order); null/null
    only when none precedes — checked exactly against brute force, for
    both the single-window and the skew-split plan."""
    ref_df = spark.createDataFrame(
        [(k, o, None if v is None else float(v)) for k, o, v in refs],
        "k long, o long, val double",
    )
    probe_df = spark.createDataFrame(
        [(i, k, o) for i, (k, o) in enumerate(probes)],
        "pid long, k long, o long",
    )
    got = {
        r["pid"]: (r["val"], r[ASOF_ORDER])
        for r in asof_backward(
            probe_df,
            ref_df,
            keys=["k"],
            order="o",
            carry=["val"],
            skew_buckets=skew_buckets,
        ).collect()
    }
    expected = {}
    for i, (k, o) in enumerate(probes):
        cands = [(ro, rv) for rk, ro, rv in refs if rk == k and ro <= o]
        if cands:
            mo, mv = max(cands)  # unique per (k, o): max on order alone
            expected[i] = (None if mv is None else float(mv), mo)
        else:
            expected[i] = (None, None)
    assert got == expected


def test_asof_backward_plan_has_no_join(spark):
    ref_df = spark.createDataFrame([(1, 1, 1.0)], "k long, o long, val double")
    probe_df = spark.createDataFrame([(1, 1, 2)], "pid long, k long, o long")
    out = asof_backward(probe_df, ref_df, keys=["k"], order="o", carry=["val"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Window") == 1, plan


def test_asof_carry_collision_raises(spark):
    import pytest

    ref_df = spark.createDataFrame([(1, 1, 1.0)], "k long, o long, val double")
    probe_df = spark.createDataFrame(
        [(1, 1, 2.0)], "k long, o long, val double"
    )
    with pytest.raises(ValueError):
        asof_backward(probe_df, ref_df, keys=["k"], order="o", carry=["val"])


def test_asof_reserved_names_raise(spark):
    """Input columns named after the operator's internals (`_kind`,
    `asof_order`, ...) must be rejected, not silently shadowed."""
    import pytest

    ref_df = spark.createDataFrame([(1, 1, 1.0)], "k long, o long, val double")
    # stage-2 skew-split intermediates included (ADVICE r6): a collision
    # with those would otherwise break only when skew_buckets engages —
    # possibly by surprise via skew_buckets="auto"
    for bad in (
        "_kind", "asof_order", "_asof_carry", "_asof_bucket",
        "_in_bucket", "_carry_in", "_last_ref",
    ):
        probe_bad = spark.createDataFrame(
            [(1, 1, 7)], f"k long, o long, `{bad}` long"
        )
        with pytest.raises(ValueError):
            asof_backward(
                probe_bad, ref_df, keys=["k"], order="o", carry=["val"]
            )
        ref_bad = spark.createDataFrame(
            [(1, 1, 1.0, 7)], f"k long, o long, val double, `{bad}` long"
        )
        with pytest.raises(ValueError):
            asof_backward(
                spark.createDataFrame([(1, 1)], "k long, o long"),
                ref_bad,
                keys=["k"],
                order="o",
                carry=["val"],
            )


def test_asof_null_carry_value_matches_latest_row(spark):
    """The ADVICE r5 pin: a matching reference row whose carry VALUE is
    NULL must win (null value + its order), not be skipped in favour of
    an older non-null row."""
    ref_df = spark.createDataFrame(
        [(1, 10, 5.0), (1, 20, None)], "k long, o long, val double"
    )
    probe_df = spark.createDataFrame([(0, 1, 25)], "pid long, k long, o long")
    for buckets in (0, 4):
        row = asof_backward(
            probe_df,
            ref_df,
            keys=["k"],
            order="o",
            carry=["val"],
            skew_buckets=buckets,
        ).first()
        assert row["val"] is None and row[ASOF_ORDER] == 20, (buckets, row)


def test_asof_skew_split_hot_key(spark):
    """One hot key with 100k+ rows: the skew-split plan must agree with
    the single window exactly, and its stage-1 window must partition by
    (key, bucket) — i.e. the hot key genuinely spreads over >1 task."""
    n_ref, n_probe = 60_000, 60_000
    ref_df = (
        spark.range(n_ref)
        .select(
            F.lit(1).alias("k"),
            (F.col("id") * 2).alias("o"),
            F.when(F.col("id") % 97 == 0, None)
            .otherwise(F.col("id").cast("double"))
            .alias("val"),
        )
    )
    probe_df = spark.range(n_probe).select(
        F.col("id").alias("pid"),
        F.lit(1).alias("k"),
        (F.col("id") * 2 + 1).alias("o"),
    )
    split = asof_backward(
        probe_df, ref_df, keys=["k"], order="o", carry=["val"],
        skew_buckets=16,
    )
    plan = split._jdf.queryExecution().executedPlan().toString()
    assert "_asof_bucket" in plan.split("Window")[1], plan[:2000]

    base = asof_backward(
        probe_df, ref_df, keys=["k"], order="o", carry=["val"]
    )
    diff = (
        split.select("pid", "val", ASOF_ORDER)
        .exceptAll(base.select("pid", "val", ASOF_ORDER))
        .count()
    )
    assert diff == 0
    assert split.count() == n_probe

    # the hot key must span >1 bucket in the split plan's stage 1
    from hoard_spark.asof import _tagged_union

    u, _ = _tagged_union(probe_df, ref_df, ["k"], "o", ["val"])
    assert u.count() == n_ref + n_probe


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    refs=_refs,
    probes=_probes,
    skew_buckets=st.sampled_from([0, 4]),
)
def test_asof_forward_matches_model(spark, refs, probes, skew_buckets):
    """Mirror contract: earliest reference with order >= probe order,
    including ties and null carry values, for both plans."""
    from hoard_spark.asof import asof_forward

    ref_df = spark.createDataFrame(
        [(k, o, None if v is None else float(v)) for k, o, v in refs],
        "k long, o long, val double",
    )
    probe_df = spark.createDataFrame(
        [(i, k, o) for i, (k, o) in enumerate(probes)],
        "pid long, k long, o long",
    )
    got = {
        r["pid"]: (r["val"], r[ASOF_ORDER])
        for r in asof_forward(
            probe_df,
            ref_df,
            keys=["k"],
            order="o",
            carry=["val"],
            skew_buckets=skew_buckets,
        ).collect()
    }
    expected = {}
    for i, (k, o) in enumerate(probes):
        cands = [(ro, rv) for rk, ro, rv in refs if rk == k and ro >= o]
        if cands:
            mo, mv = min(cands, key=lambda t: t[0])
            expected[i] = (None if mv is None else float(mv), mo)
        else:
            expected[i] = (None, None)
    assert got == expected


def test_resolve_skew_buckets(spark):
    """'auto' costs one count job and engages only past the threshold;
    numeric values pass through untouched."""
    from hoard_spark.asof import resolve_skew_buckets

    df = spark.createDataFrame(
        [(1, i) for i in range(100)] + [(2, 0)], "k long, o long"
    )
    assert resolve_skew_buckets(df, ["k"], 0) == 0
    assert resolve_skew_buckets(df, ["k"], 16) == 16
    assert resolve_skew_buckets(df, ["k"], "auto") == 0  # hottest=100
    assert resolve_skew_buckets(df, ["k"], "auto", threshold=50) == 32


def test_asof_auto_matches_explicit(spark):
    """'auto' below threshold == single-window result."""
    from hoard_spark.asof import asof_backward

    ref = spark.createDataFrame(
        [(1, 10, 5.0), (1, 20, 6.0)], "k long, o long, val double"
    )
    probe = spark.createDataFrame(
        [(0, 1, 15), (1, 1, 25)], "pid long, k long, o long"
    )
    base = sorted(
        map(tuple, asof_backward(probe, ref, ["k"], "o", ["val"]).collect())
    )
    auto = sorted(
        map(
            tuple,
            asof_backward(
                probe, ref, ["k"], "o", ["val"], skew_buckets="auto"
            ).collect(),
        )
    )
    assert base == auto


def test_asof_skew_split_rejects_non_numeric_order(spark):
    """Regression (ADVICE r6): with a string order column the skew
    split's cast('double') yields nulls → empty bounds → everything in
    bucket 0, i.e. the single-task window the caller asked to avoid.
    That degradation must be a loud TypeError, not silent."""
    import pytest

    ref_df = spark.createDataFrame(
        [(1, "a", 1.0)], "k long, o string, val double"
    )
    probe_df = spark.createDataFrame([(1, "b")], "k long, o string")
    with pytest.raises(TypeError, match="numeric/timestamp"):
        asof_backward(
            probe_df, ref_df, keys=["k"], order="o", carry=["val"],
            skew_buckets=4,
        ).collect()
    # the single-window plan still accepts orderable non-numeric columns
    out = asof_backward(
        probe_df, ref_df, keys=["k"], order="o", carry=["val"]
    ).collect()
    assert out[0]["val"] == 1.0 and out[0][ASOF_ORDER] == "a"


def test_asof_skew_split_timestamp_order(spark):
    """Timestamps are bucketable (cast to epoch-seconds double) — the
    dtype guard must let them through and the split must agree with the
    single-window plan."""
    ref_df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0), (1, "2024-01-03 00:00:00", 3.0)],
        "k long, o string, val double",
    ).withColumn("o", F.to_timestamp("o"))
    probe_df = spark.createDataFrame(
        [(1, "2024-01-02 00:00:00"), (1, "2024-01-04 00:00:00")],
        "k long, o string",
    ).withColumn("o", F.to_timestamp("o"))
    single = asof_backward(
        probe_df, ref_df, keys=["k"], order="o", carry=["val"]
    ).orderBy("o").collect()
    split = asof_backward(
        probe_df, ref_df, keys=["k"], order="o", carry=["val"],
        skew_buckets=2,
    ).orderBy("o").collect()
    assert [r["val"] for r in single] == [1.0, 3.0]
    assert [r.asDict() for r in single] == [r.asDict() for r in split]
