"""Benchmark harness — times the conformance query suite at sf0.1.

Prints ONE JSON line:
    {"metric": "suite_seconds", "value": <total>, "unit": "sec",
     "queries": {"q01_bucket_lww": sec, ...}, "sf": 0.1}

Methodology (BASELINE.md): each query plan is executed end-to-end into a
``noop`` sink (full scan/shuffle/compute, no driver-side row transfer), on
``local[$SPARK_GRAFT_CPUS]`` with AQE on — the same session shape the
engine recommends for production. Input dir: ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Quadratic-oracle-twin queries are capped out of the headline suite when
# they would dominate wall-clock; the scale path (LSH/IVF) is benched.
SKIP = set()


def sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    from pyspark.sql import SparkSession

    from hoard_spark.queries import all_queries

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("hoard-spark-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 << 20))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    registry = all_queries()

    # JVM/codegen warm-up: touch every table once (cheap counts).
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name, q in sorted(registry.items()):
        if name in SKIP:
            continue
        t0 = time.time()
        df = q.spark_fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        # drop DataFrames the query persisted internally: keeps every
        # measurement self-contained and stops cached partitions piling up
        # across the 40+-query session
        spark.catalog.clearCache()
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.2f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "suite_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_of(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
