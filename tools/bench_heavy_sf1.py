"""Heavy-family scaling run at sf1 (VERDICT r7 item 8).

Runs the LSH/CC/simjoin family (q35 minhash near-dup, q51 dedup
clusters, q79 thresholded simjoin, q90 top-k ladder) plus the LWW+rollup
ingest micro-batch at BOTH sf0.1 (driver testdata) and a genuine
10x-cardinality sf1 corpus (tools/gen_sf1.py -> /tmp/hoard_sf1), and
records per-stage wall clocks and the sf1/sf0.1 slope. The pass bar from
the verdict: each stage <= ~10x its sf0.1 wall (near-linear scaling; a
superlinear slope means a plan pathology the small scale hid).

Usage: python tools/bench_heavy_sf1.py  (regenerates the corpus if absent)
Writes tools/bench_heavy_sf1.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/hoard_sf1")

HEAVY = [
    "q35_minhash_neardup",
    "q51_dedup_clusters",
    "q79_simjoin_threshold",
    "q90_topk_simjoin_ladder",
]


def bench_ingest(spark, sf_dir: str) -> dict:
    import shutil

    from pyspark.sql import functions as F

    from hoard_spark.engine import HoardEngine
    from hoard_spark.queries import load
    from hoard_spark.streaming.ingest import ingest_microbatch

    events = load(spark, sf_dir, "events")
    pts = events.select(
        F.col("event_type").alias("metric"),
        F.col("ts").cast("long").alias("ts"),
        F.col("value").cast("double").alias("value"),
        F.col("event_id").cast("long").alias("seq"),
    )
    n_rows = pts.count()
    now = pts.agg(F.max("ts")).first()[0] + 1
    wh = tempfile.mkdtemp(prefix="hoard_sf1_wh_")
    try:
        eng = HoardEngine(spark, wh, metric_buckets=16)
        for r in pts.select("metric").distinct().collect():
            eng.create(r["metric"], [(3600, 24 * 40), (86400, 60)], now=now)
        t0 = time.time()
        ingest_microbatch(eng, pts, batch_id=0, now=now)
        dt = time.time() - t0
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    return {
        "rows": n_rows,
        "sec": round(dt, 3),
        "rows_per_sec": round(n_rows / dt),
    }


def main() -> None:
    if not os.path.isdir(SF1):
        subprocess.run(
            [sys.executable, str(REPO / "tools" / "gen_sf1.py"), SF1],
            check=True,
        )

    from hoard_spark.queries import all_queries, release_caches
    from hoard_spark.session import get_spark

    spark = get_spark(app_name="bench-heavy-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    reg = all_queries()

    out: dict = {"sf_dirs": {"sf0.1": SF01, "sf1": SF1}, "stages": {}}
    for sf_name, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        for qname in HEAVY:
            t0 = time.time()
            n = reg[qname].spark_fn(spark, sf_dir).count()
            dt = round(time.time() - t0, 3)
            release_caches()
            out["stages"].setdefault(qname, {})[sf_name] = {
                "sec": dt,
                "rows": n,
            }
            print(f"{sf_name} {qname}: {dt}s ({n} rows)", flush=True)
        out["stages"].setdefault("ingest", {})[sf_name] = bench_ingest(
            spark, sf_dir
        )
        print(f"{sf_name} ingest: {out['stages']['ingest'][sf_name]}", flush=True)

    for stage, runs in out["stages"].items():
        a, b = runs["sf0.1"]["sec"], runs["sf1"]["sec"]
        runs["slope_10x"] = round(b / a, 2) if a > 0 else None
    (REPO / "tools" / "bench_heavy_sf1.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps({k: v.get("slope_10x") for k, v in out["stages"].items()}))


if __name__ == "__main__":
    main()
