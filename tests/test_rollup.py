"""G5 — rollup/propagate correctness (reference src/hoard.coffee:71-178,
364-379), pinned against the Python-Whisper-generated binary fixture."""

import os

import pytest
from pyspark.sql import functions as F

from tests.whisper_fixture import LARGE_WHISPER, read_whisper

LARGE = [(3600, 8760), (86400, 1095)]


@pytest.mark.skipif(not os.path.exists(LARGE_WHISPER), reason="fixture missing")
def test_g5_tier1_parity_with_whisper_binary(engine):
    """Ingest the fixture's tier-0 contents, run the rollup cascade, and
    compare our tier-1 day buckets against the values Python Whisper stored
    in the binary file.

    Comparable days are those whose full 24-hour window is still present in
    the tier-0 ring (older tier-1 slots were computed from hours since
    evicted, which Spark-side recomputation cannot see).
    """
    wf = read_whisper()
    tier0 = dict(wf.archives[0].data)
    tier1 = dict(wf.archives[1].data)
    now = max(tier0)
    lo, hi = min(tier0), max(tier0)

    engine.create("m", LARGE, x_files_factor=0.5)
    engine.update_many("m", sorted(tier0.items()), now=now, propagate=False)
    engine.propagate("m")

    mine = {
        r["bucket_ts"]: r["value"]
        for r in engine.tier_view("m", 1).collect()
    }

    compared = 0
    for day, expected in tier1.items():
        if day < lo or day + 86400 > hi + 3600:
            continue  # window not fully inside current tier-0 contents
        assert day in mine, f"day bucket {day} missing from engine tier 1"
        assert mine[day] == pytest.approx(expected, rel=1e-12), f"day {day}"
        compared += 1
    assert compared > 300  # a year of days minus boundaries

    # the SURVEY.md spot check: tier-1 base point value
    assert 2790.5833333333335 in set(tier1.values())


def test_xff_gate_blocks_sparse_buckets(engine):
    """knownPercent >= xff required to emit (src/hoard.coffee:153-155)."""
    engine.create("m", [(10, 100), (100, 100)], x_files_factor=0.5)
    now = 1_700_000_000
    base = now - now % 100 - 500
    # bucket A: 5/10 slots known (= 0.5, passes; boundary is inclusive)
    pts_a = [(base + i * 10, float(i)) for i in range(5)]
    # bucket B: 4/10 slots known (< 0.5, gated out)
    pts_b = [(base + 100 + i * 10, 1.0) for i in range(4)]
    engine.update_many("m", pts_a + pts_b, now=now)
    t1 = {r["bucket_ts"]: r["value"] for r in engine.tier_view("m", 1).collect()}
    assert t1.get(base) == pytest.approx(sum(range(5)) / 5)
    assert base + 100 not in t1


def test_cascade_is_average_of_averages(engine):
    """Tier K+1 aggregates tier K values, not raw points
    (src/hoard.coffee:364-379): avg-of-avgs != avg-of-raw when bucket
    populations differ."""
    engine.create("m", [(10, 1000), (100, 1000), (1000, 1000)], x_files_factor=0.0)
    now = 1_700_000_000
    base = now - now % 1000 - 2000
    # tier-1 bucket X: hours with 1 point (value 0) and 9 points (value 10)
    pts = [(base, 0.0)] + [(base + 100 + i * 10, 10.0) for i in range(9)]
    engine.update_many("m", pts, now=now)
    t1 = {r["bucket_ts"]: r["value"] for r in engine.tier_view("m", 1).collect()}
    t2 = {r["bucket_ts"]: r["value"] for r in engine.tier_view("m", 2).collect()}
    assert t1[base] == 0.0 and t1[base + 100] == 10.0
    # avg of tier-1 values (0, 10) = 5.0; avg of raw would be 9.0
    assert t2[base] == pytest.approx(5.0)


def test_incremental_propagate_equals_full_rebuild(engine):
    """Batch-scoped recompute (touched (metric,date) partitions, the _.uniq
    analog at :373-378) must converge to the same state as a full rebuild."""
    engine.create("m", [(60, 2000), (3600, 2000)], x_files_factor=0.0)
    now = 1_700_000_000
    b1 = [(now - 90_000 + i * 60, float(i)) for i in range(50)]
    b2 = [(now - 50_000 + i * 60, float(i * 2)) for i in range(50)]
    b3 = [(now - 90_000 + i * 60, 99.0) for i in range(5)]  # overwrites b1 head
    engine.update_many("m", b1, now=now)
    engine.update_many("m", b2, now=now)
    before_b3 = {
        r["bucket_ts"]: r["value"] for r in engine.tier_view("m", 1).collect()
    }
    engine.update_many("m", b3, now=now)
    incremental = {
        (r["bucket_ts"]): (r["value"])
        for r in engine.tier_view("m", 1).collect()
    }
    # force a from-scratch recompute, bypassing the materialized table
    full = {
        (r["bucket_ts"]): (r["value"])
        for r in engine.tier_view("m", 1, use_materialized=False).collect()
    }
    assert incremental == full
    # the LWW overwrite batch moved the touched hour's average
    touched = b3[0][0] - b3[0][0] % 3600
    assert incremental[touched] != before_b3[touched]
    assert set(incremental) == set(before_b3)  # no buckets lost or invented


def test_single_update_propagates(engine):
    """Intended Whisper semantics: update() downsamples too — the
    reference's commented-out propagation (src/hoard.coffee:227-238) is a
    documented bug we do NOT reproduce (SURVEY.md §5.3)."""
    engine.create("m", [(60, 100), (3600, 100)], x_files_factor=0.0)
    now = 1_700_003_600
    engine.update("m", 7.5, now - 120, now=now)
    t1 = {r["bucket_ts"]: r["value"] for r in engine.tier_view("m", 1).collect()}
    bucket = (now - 120) - (now - 120) % 3600
    assert t1.get(bucket) == 7.5


def test_direct_lower_tier_points_merge_with_rollup(engine):
    """Points routed directly into a coarser archive (updateMany age
    routing, :254-277) coexist with propagated buckets; a propagated value
    supersedes a direct one on the same bucket."""
    engine.create("m", [(10, 100), (100, 1000)], x_files_factor=0.0)
    now = 1_700_000_000
    base = now - now % 100
    engine.update_many(
        "m",
        [
            (base - 5_000, 3.0),  # too old for tier 0 -> direct tier-1 write
            (base - 50, 4.0),  # tier 0 -> propagates avg into bucket base-100
            (base - 40, 6.0),  # distinct 10 s bucket, same 100 s bucket
        ],
        now=now,
    )
    t1 = {r["bucket_ts"]: r["value"] for r in engine.tier_view("m", 1).collect()}
    direct_bucket = (base - 5_000) - (base - 5_000) % 100
    assert t1.get(direct_bucket) == 3.0
    assert t1.get(base - 100) == pytest.approx(5.0)


def test_retention_drop_removes_expired_partitions(engine):
    """Ring-buffer eviction as a partition drop (engine maintenance)."""
    engine.create("m", [(3600, 24), (86400, 30)])  # tier0 keeps 1 day
    now = 1_700_000_000
    old_ts = now - 86400 * 10  # within tier-1 retention, past tier-0
    engine.update_many("m", [(old_ts, 1.0), (now - 100, 2.0)], now=now)
    # the old point was routed to tier 1 directly; nothing in tier 0 expires
    dropped = engine.drop_expired("m", now=now)
    t1 = {r["bucket_ts"]: r["value"] for r in engine.tier_view("m", 1).collect()}
    assert any(v == 1.0 for v in t1.values())  # still within tier-1 retention
    # now pretend a month passed: tier-1 partitions older than 30 d vanish
    dropped = engine.drop_expired("m", now=now + 86400 * 40)
    assert dropped  # the 10-day-old partition is gone
