"""Hash-bucketed metric layout (HoardEngine(metric_buckets=N)).

At 100 TB with millions of metrics, one directory per metric explodes the
namespace (VERDICT r1 flagged the raw-`metric` partition column as weak at
100x metric cardinality). The bucketed layout partitions by
``mb = crc32(metric) % N`` with ``metric`` as a data column; these tests
pin bit-identical behavior with the unbucketed layout plus the bucketed-
specific hazards (co-bucketed overwrite preservation, maintenance at
bucket granularity, layout persistence across engine reopen).
"""

import os
import zlib

from pyspark.sql import functions as F

from hoard_spark.engine import HoardEngine

ARCHIVES = [(60, 120), (300, 120), (3600, 48)]
NOW = 1_400_000_000


def _points(n=40, base=0.0):
    return [(NOW - 60 * i, base + i) for i in range(n)]


def test_crc32_driver_matches_spark(spark):
    names = ["cpu.load", "mem.free", "m0", "metric-with-dash", "日本語"]
    got = (
        spark.createDataFrame([(n,) for n in names], "metric string")
        .select("metric", F.crc32(F.col("metric").cast("binary")).alias("c"))
        .collect()
    )
    for r in got:
        assert r["c"] == zlib.crc32(r["metric"].encode("utf-8")), r["metric"]


def test_bucketed_matches_unbucketed_results(spark, tmp_path):
    plain = HoardEngine(spark, str(tmp_path / "plain"))
    bucketed = HoardEngine(spark, str(tmp_path / "bucketed"), metric_buckets=4)
    for eng in (plain, bucketed):
        for m in ("cpu.load", "mem.free", "io.wait"):
            eng.create(m, ARCHIVES)
            eng.update_many(m, _points(base=hash(m) % 97), now=NOW)
    for m in ("cpu.load", "mem.free", "io.wait"):
        for window in ((NOW - 1800, NOW), (NOW - 7000, NOW)):
            a = plain.fetch(m, *window, now=NOW)
            b = bucketed.fetch(m, *window, now=NOW)
            assert a == b, (m, window)


def test_bucketed_directory_layout(spark, tmp_path):
    eng = HoardEngine(spark, str(tmp_path / "wh"), metric_buckets=4)
    eng.create("cpu.load", ARCHIVES)
    eng.update_many("cpu.load", _points(), now=NOW)
    tier0 = os.path.join(eng.points_path, "tier=0")
    subdirs = sorted(os.listdir(tier0))
    assert all(d.startswith("mb=") for d in subdirs), subdirs
    expect_mb = zlib.crc32(b"cpu.load") % 4
    assert subdirs == [f"mb={expect_mb}"]


def test_cobucketed_rollups_survive_partial_propagate(spark, tmp_path):
    """Dynamic overwrite of an (mb, date) partition must not drop rollup
    rows of metrics that were not part of the recompute."""
    eng = HoardEngine(spark, str(tmp_path / "wh"), metric_buckets=1)
    eng.create("m_a", ARCHIVES)
    eng.create("m_b", ARCHIVES)
    eng.update_many("m_a", _points(base=0.0), now=NOW)
    before = {
        (r["metric"], r["tier"], r["bucket_ts"]): r["value"]
        for r in eng._read_rollups().collect()
    }
    assert any(k[0] == "m_a" for k in before)
    # same bucket (N=1), overlapping dates — this write must preserve m_a
    eng.update_many("m_b", _points(base=500.0), now=NOW)
    after = {
        (r["metric"], r["tier"], r["bucket_ts"]): r["value"]
        for r in eng._read_rollups().collect()
    }
    for k, v in before.items():
        assert after.get(k) == v, f"co-bucketed rollup row lost: {k}"


def test_bucketed_compact_and_drop_expired(spark, tmp_path):
    eng = HoardEngine(spark, str(tmp_path / "wh"), metric_buckets=2)
    eng.create("m_a", ARCHIVES)
    eng.create("m_b", ARCHIVES)
    eng.update_many("m_a", _points(), now=NOW)
    eng.update_many("m_a", _points(base=1000.0), now=NOW)  # duplicates
    eng.update_many("m_b", _points(base=7.0), now=NOW)
    golden_a = eng.fetch("m_a", NOW - 1800, NOW, now=NOW)
    golden_b = eng.fetch("m_b", NOW - 1800, NOW, now=NOW)

    eng.compact("m_a")
    # physically folded: one row per (metric, tier, bucket)
    pts = eng._read_points()
    dup = (
        pts.groupBy("metric", "tier", "bucket_ts")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dup == 0
    assert eng.fetch("m_a", NOW - 1800, NOW, now=NOW) == golden_a
    assert eng.fetch("m_b", NOW - 1800, NOW, now=NOW) == golden_b

    dropped = eng.drop_expired("m_a", now=NOW + ARCHIVES[-1][0] * ARCHIVES[-1][1] + 86400 * 3)
    assert dropped  # every day is past the longest retention by then


def test_layout_flag_persists_across_reopen(spark, tmp_path):
    wh = str(tmp_path / "wh")
    eng = HoardEngine(spark, wh, metric_buckets=8)
    eng.create("cpu.load", ARCHIVES)
    eng.update_many("cpu.load", _points(), now=NOW)
    golden = eng.fetch("cpu.load", NOW - 1800, NOW, now=NOW)
    # reopen WITHOUT the flag: stored layout must win
    reopened = HoardEngine(spark, wh)
    assert reopened.metric_buckets == 8
    assert reopened.fetch("cpu.load", NOW - 1800, NOW, now=NOW) == golden
