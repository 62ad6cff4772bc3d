"""Capture .explain("formatted") for every declared query → plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix via $PLAN_SUFFIX,
default "before"). Session shape mirrors bench.py so plan shapes match
what the bench executes (same AQE, broadcast threshold, shuffle
partitions). Queries whose *construction* fires jobs (q24's offset
collect, the ANN/cluster artifact builders on a cold store) run those
jobs here too — the captured plan is the terminal plan the noop sink
executes.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    only = set(sys.argv[2:])
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    out_dir = REPO / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)

    from pyspark.sql import SparkSession

    from hoard_spark.queries import all_queries, release_caches

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("hoard-spark-capture-plans")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 << 20))
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    jvm = spark.sparkContext._jvm
    for name, q in sorted(all_queries().items()):
        if only and name not in only:
            continue
        try:
            df = q.spark_fn(spark, SF_DIR)
            txt = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (out_dir / f"{name}_{suffix}.txt").write_text(txt)
            print(f"# {name}: ok", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — capture the rest
            (out_dir / f"{name}_{suffix}.txt").write_text(
                f"ERROR {type(e).__name__}: {e}\n"
            )
            print(f"# {name}: ERROR {type(e).__name__}", file=sys.stderr)
        finally:
            release_caches()
            spark.catalog.clearCache()
    print(f"plans written to {out_dir}")


if __name__ == "__main__":
    main()
