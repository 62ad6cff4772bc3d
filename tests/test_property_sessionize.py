"""Property pin: the REAL q48 sessionization over hypothesis-made parquet.

Unlike an in-test re-derivation of the window expressions, this drives
the actual conformance query (`q48_sessionize`) end-to-end: each example
writes a synthetic `events.parquet` into a temp sf_dir and compares the
query's output against a brute-force Python sessionizer. Timestamps are
multiples of 600 s so the 1800 s inactivity boundary (strict >: a gap of
EXACTLY 30 min stays in-session) is hit constantly.
"""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hoard_spark.queries import all_queries

BASE = 1_600_000_000
GAP_S = 1800

_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user_id
        st.integers(min_value=0, max_value=60),  # ts = BASE + 600 * k
    ),
    min_size=1,
    max_size=80,
)


def _model(events):
    per_user: dict[int, list[int]] = {}
    for uid, k in events:
        per_user.setdefault(uid, []).append(BASE + 600 * k)
    out = {}
    for uid, tss in per_user.items():
        tss.sort()
        durs, start, prev, n_sessions = [], tss[0], tss[0], 1
        for t in tss[1:]:
            if t - prev > GAP_S:  # strict: gap == 1800 stays in-session
                durs.append(prev - start)
                start = t
                n_sessions += 1
            prev = t
        durs.append(prev - start)
        out[uid] = (n_sessions, len(tss), sum(durs) / n_sessions)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_events)
def test_q48_sessionize_matches_model(spark, events):
    rows = [
        (
            int(uid),
            dt.datetime.fromtimestamp(BASE + 600 * k, dt.timezone.utc),
        )
        for uid, k in events
    ]
    sf_dir = tempfile.mkdtemp(prefix="hoard_prop_sess_")
    try:
        spark.createDataFrame(
            rows, "user_id long, ts timestamp"
        ).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")
        got = {
            r["user_id"]: (r["n_sessions"], r["n_events"], r["avg_dur_s"])
            for r in all_queries()["q48_sessionize"]
            .spark_fn(spark, sf_dir)
            .collect()
        }
    finally:
        shutil.rmtree(sf_dir, ignore_errors=True)

    expected = _model(events)
    assert set(got) == set(expected)
    for uid, (ns, ne, avg) in expected.items():
        gns, gne, gavg = got[uid]
        assert (gns, gne) == (ns, ne)
        # engine rounds a DECIMAL-accumulated mean to 4 places; allow
        # only that rounding, nothing more
        assert gavg == pytest.approx(avg, abs=2e-4)
