"""Library sessionization: property pin vs a pure-Python model + the
skew-split plan's exact equality on a hot key."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hoard_spark.sessionize import SESSION_ID, sessionize

_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.integers(min_value=0, max_value=200),  # order
    ),
    min_size=0,
    max_size=60,
    unique_by=lambda t: t,  # one row per (key, order): ids stay total
)


def _model(events, gap):
    out = {}
    by_key = {}
    for k, o in events:
        by_key.setdefault(k, []).append(o)
    for k, os_ in by_key.items():
        sid = 0
        prev = None
        for o in sorted(os_):
            if prev is None or o - prev > gap:
                sid += 1
            out[(k, o)] = sid
            prev = o
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=_events,
    gap=st.integers(min_value=1, max_value=40),
    skew_buckets=st.sampled_from([0, 4]),
)
def test_sessionize_matches_model(spark, events, gap, skew_buckets):
    df = spark.createDataFrame(list(events) or [], "k long, o long")
    got = {
        (r["k"], r["o"]): r[SESSION_ID]
        for r in sessionize(
            df, ["k"], "o", gap, skew_buckets=skew_buckets
        ).collect()
    }
    assert got == _model(events, gap), (gap, skew_buckets)


def test_sessionize_skew_split_hot_key(spark):
    """One hot key, 100k rows with gap-spanning bursts: the split plan
    must produce the identical session ids as the single window, and
    its stage-1 window must partition by (key, bucket)."""
    n = 100_000
    # bursts of 50 events 10 apart, inter-burst jump of 10_000 (> gap)
    src = spark.range(n).select(
        F.lit(1).alias("k"),
        (
            (F.col("id") % 50) * 10 + (F.col("id") / 50).cast("long") * 10_000
        ).alias("o"),
    )
    gap = 100
    split = sessionize(src, ["k"], "o", gap, skew_buckets=16)
    plan = split._jdf.queryExecution().executedPlan().toString()
    assert "_sess_bucket" in plan.split("Window")[1], plan[:2000]

    base = sessionize(src, ["k"], "o", gap)
    diff = (
        split.select("k", "o", SESSION_ID)
        .exceptAll(base.select("k", "o", SESSION_ID))
        .count()
    )
    assert diff == 0
    n_sessions = split.agg(F.max(SESSION_ID)).first()[0]
    assert n_sessions == n // 50  # one session per burst


def test_sessionize_boundary_merge(spark):
    """A session that spans a bucket edge must keep ONE id: force a
    2-bucket split whose edge falls inside a continuing run."""
    rows = [(1, o) for o in range(0, 1000, 10)]  # one long session
    df = spark.createDataFrame(rows, "k long, o long")
    for buckets in (2, 4, 8):
        ids = {
            r[SESSION_ID]
            for r in sessionize(
                df, ["k"], "o", gap=10, skew_buckets=buckets
            ).collect()
        }
        assert ids == {1}, (buckets, ids)


def test_sessionize_reserved_collision_raises(spark):
    import pytest

    df = spark.createDataFrame([(1, 1, 9)], "k long, o long, session_id long")
    with pytest.raises(ValueError):
        sessionize(df, ["k"], "o", 10)


def test_sessionize_auto_matches_explicit(spark):
    df = spark.createDataFrame(
        [(1, o) for o in (0, 5, 100, 105)], "k long, o long"
    )
    base = {
        (r["k"], r["o"]): r[SESSION_ID]
        for r in sessionize(df, ["k"], "o", gap=10).collect()
    }
    auto = {
        (r["k"], r["o"]): r[SESSION_ID]
        for r in sessionize(
            df, ["k"], "o", gap=10, skew_buckets="auto"
        ).collect()
    }
    assert base == auto == {(1, 0): 1, (1, 5): 1, (1, 100): 2, (1, 105): 2}
