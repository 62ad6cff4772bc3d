"""Warehouse writer lock (reference FIXME parity: 'Check file lock?' at
src/hoard.coffee:67, 183, 243).

The engine assumes a single writer per warehouse; the lock makes that
assumption enforced: a second writer gets an immediate HoardError instead
of interleaving catalog/seq writes. Readers never touch the lock.
"""

from __future__ import annotations

import pytest

from hoard_spark.catalog import HoardError
from hoard_spark.engine import HoardEngine

NOW = 1_700_000_000


def test_second_writer_rejected_while_locked(spark, tmp_path):
    wh = str(tmp_path / "wh")
    a = HoardEngine(spark, wh)
    a.create("m", [(3600, 48)])
    b = HoardEngine(spark, wh)  # after create: catalog loads at open
    with a._writer_lock():
        with pytest.raises(HoardError, match="locked by another writer"):
            b.update_many("m", [(NOW - 3600, 1.0)], now=NOW)
        with pytest.raises(HoardError, match="locked by another writer"):
            b.create("m2", [(3600, 48)])
    # lock released -> the second handle can write now
    b.update_many("m", [(NOW - 3600, 2.0)], now=NOW)
    ti, v = a.fetch("m", NOW - 2 * 3600, NOW, now=NOW)
    assert 2.0 in v


def test_sequential_writers_serialize_cleanly(spark, tmp_path):
    """Per-operation locking: two handles writing one after the other is
    the supported admin pattern and must not require manual unlock."""
    wh = str(tmp_path / "wh2")
    a = HoardEngine(spark, wh)
    a.create("m", [(3600, 48), (86400, 10)])
    b = HoardEngine(spark, wh)
    a.update_many("m", [(NOW - 3600, 1.0)], now=NOW)
    b.update_many("m", [(NOW - 2 * 3600, 2.0)], now=NOW)
    a.compact("m")
    ti, v = b.fetch("m", NOW - 3 * 3600, NOW, now=NOW)
    assert 1.0 in v and 2.0 in v


def test_lock_is_reentrant_within_one_handle(spark, tmp_path):
    """ingest -> propagate nests two acquisitions on one handle; the
    inner one must not self-deadlock or error."""
    eng = HoardEngine(spark, str(tmp_path / "wh3"))
    eng.create("m", [(3600, 48), (86400, 10)])
    with eng._writer_lock():
        # nested explicit acquisition
        with eng._writer_lock():
            pass
        # full ingest (which itself locks) under an outer lock
        eng.update_many("m", [(NOW - 3600, 1.0)], now=NOW)
    assert eng._lock_depth == 0
    ti, v = eng.fetch("m", NOW - 2 * 3600, NOW, now=NOW)
    assert 1.0 in v


def test_readers_do_not_take_the_lock(spark, tmp_path):
    eng = HoardEngine(spark, str(tmp_path / "wh4"))
    eng.create("m", [(3600, 48)])
    eng.update_many("m", [(NOW - 3600, 1.0)], now=NOW)
    other = HoardEngine(spark, str(tmp_path / "wh4"))
    with eng._writer_lock():
        # fetch/info on another handle must work while the lock is held
        assert other.info("m").metric == "m"
        ti, v = other.fetch("m", NOW - 2 * 3600, NOW, now=NOW)
        assert 1.0 in v
