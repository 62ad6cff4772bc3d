"""HoardEngine.drop — metric lifecycle across both physical layouts."""

import pytest

from hoard_spark.catalog import HoardError
from hoard_spark.engine import HoardEngine

NOW = 1_400_000_000


def _seed(eng, metric, base_value=1.0):
    eng.create(metric, [(3600, 48), (86400, 30)])
    eng.update_many(
        metric,
        [(NOW - 3600 * i, base_value + i) for i in range(30)],
        now=NOW,
    )


def _fetch_values(eng, metric):
    _ti, vals = eng.fetch(metric, NOW - 6 * 3600, NOW, now=NOW)
    return vals


def test_drop_unbucketed(spark, tmp_path):
    eng = HoardEngine(spark, str(tmp_path / "w"))
    _seed(eng, "keep")
    _seed(eng, "gone", base_value=100.0)
    before = _fetch_values(eng, "keep")
    assert any(v is not None for v in before)

    eng.drop("gone")
    assert "gone" not in eng.catalog.metrics()
    with pytest.raises(HoardError):
        eng.fetch("gone", NOW - 3600, NOW, now=NOW)
    # survivor untouched
    assert _fetch_values(eng, "keep") == before
    # re-create after drop starts clean (seq reset => fresh LWW history)
    eng.create("gone", [(3600, 48)])
    eng.update_many("gone", [(NOW - 60, 7.0)], now=NOW)
    _ti, vals = eng.fetch("gone", NOW - 3600, NOW, now=NOW)
    assert vals == [7.0]


def test_drop_bucketed_rewrites_cobucketed_metric(spark, tmp_path):
    # metric_buckets=1: every metric shares one bucket — the worst case
    # for the ride-along rewrite
    eng = HoardEngine(spark, str(tmp_path / "w"), metric_buckets=1)
    _seed(eng, "keep")
    _seed(eng, "gone", base_value=100.0)
    eng.propagate("keep")
    eng.propagate("gone")
    before = _fetch_values(eng, "keep")

    eng.drop("gone")
    assert "gone" not in eng.catalog.metrics()
    assert _fetch_values(eng, "keep") == before
    # no rows of the dropped metric survive in the shared bucket
    leftovers = (
        eng._read_points().where("metric = 'gone'").count()
        + eng._read_rollups().where("metric = 'gone'").count()
    )
    assert leftovers == 0


def test_drop_unknown_metric_raises(spark, tmp_path):
    eng = HoardEngine(spark, str(tmp_path / "w"))
    with pytest.raises(HoardError):
        eng.drop("never_created")
