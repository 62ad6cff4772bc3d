"""Bucketed warehouse under the FLAGSHIP conformance family (VERDICT r6
item 7): q01–q05 re-run over an ``events`` table bucketed by
``event_type`` must plan with NO hash-partitioning Exchange — every
groupBy in the family keys on ``event_type`` plus a time bucket, a
superset of the bucket key, which hash-clustering on the subset already
satisfies — and must return exactly the rows of the plain-parquet run.

This is the write-once-shuffle-never story for the tier-0/rollup
aggregations at 100 TB: the per-query Exchange that dominates q01-q03's
cost disappears when the warehouse lays events out by metric.
"""

from __future__ import annotations

import pytest

from hoard_spark.bucketing import write_bucketed
from hoard_spark.queries import REGISTRY

# sf0.01, not sf0.001: q02's xff gate (known >= 12 hourly buckets per
# day) filters every row at the smallest SF, and an empty result would
# vacuously pass the row comparison
SF = "/root/testdata/sf0.01"
FAMILY = [
    "q01_bucket_lww",
    "q02_rollup_xff",
    "q03_cascaded_rollup",
    "q04_range_fetch",
    "q05_retention_filter",
]


@pytest.fixture(scope="module")
def bucketed_events(spark, tmp_path_factory):
    from hoard_spark.queries import load

    root = tmp_path_factory.mktemp("events_bucketed")
    ev = load(spark, SF, "events")
    write_bucketed(
        ev, "t_events_conf_b", ["event_type"], 8,
        sort_cols=["event_type", "ts"], path=str(root / "events"),
    )
    yield "t_events_conf_b"
    spark.sql("DROP TABLE IF EXISTS t_events_conf_b")


@pytest.mark.parametrize("qname", FAMILY)
def test_family_no_hash_exchange_and_identical_rows(
    spark, qname, bucketed_events
):
    import hoard_spark.queries.timeseries as ts_mod

    plain = [tuple(r) for r in REGISTRY[qname].spark_fn(spark, SF).collect()]

    # Route the family's load('events') to the bucketed catalog table:
    # bucketing metadata lives in the catalog, so a path-based
    # spark.read.parquet can never see it — the swap IS the test.
    real_load = ts_mod.load

    def routed(spark_, sf_dir, name):
        if name == "events":
            return spark_.table(bucketed_events)
        return real_load(spark_, sf_dir, name)

    ts_mod.load = routed
    try:
        df_b = REGISTRY[qname].spark_fn(spark, SF)
        plan = df_b._jdf.queryExecution().executedPlan().toString()
        # the final orderBy legitimately range-partitions; the
        # aggregations must NOT re-shuffle what the bucket layout
        # already clustered
        assert "Exchange hashpartitioning" not in plan, (
            f"{qname}:\n{plan[:2000]}"
        )
        bucketed = [tuple(r) for r in df_b.collect()]
    finally:
        ts_mod.load = real_load
    assert bucketed == plain and plain
