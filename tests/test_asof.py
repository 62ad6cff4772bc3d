"""Library as-of join: property pin vs a pure-Python model + plan shape."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hoard_spark.asof import ASOF_ORDER, asof_backward

_refs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.integers(min_value=0, max_value=50),  # order
        st.integers(min_value=-100, max_value=100),  # value
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
@given(refs=_refs, probes=_probes)
def test_asof_backward_matches_model(spark, refs, probes):
    """Each probe row gets the latest reference row with order <= its
    own (per key), including the simultaneous case, null when none
    precedes — checked exactly against brute force."""
    ref_df = spark.createDataFrame(
        [(k, o, float(v)) for k, o, v in refs],
        "k long, o long, val double",
    )
    probe_df = spark.createDataFrame(
        [(i, k, o) for i, (k, o) in enumerate(probes)],
        "pid long, k long, o long",
    )
    got = {
        r["pid"]: (r["val"], r[ASOF_ORDER])
        for r in asof_backward(
            probe_df, ref_df, keys=["k"], order="o", carry=["val"]
        ).collect()
    }
    expected = {}
    for i, (k, o) in enumerate(probes):
        cands = [(ro, rv) for rk, ro, rv in refs if rk == k and ro <= o]
        if cands:
            mo, mv = max(cands)
            expected[i] = (float(mv), mo)
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
