"""Time the shingle-family queries on one tree (fresh JVM per run).

Usage: python tools/bench_shingle_family.py <repo_path> [sf_dir]

Prints one JSON line: per-query walls for the 9 queries that consume the
corpus shingle table, plus a fixed-workload calibration canary (lineitem
groupBy-agg noop at the same SF) so same-host A/B pairs can be read
against host noise (the r8 variance discipline). The artifact root is
cleared first, so the first consumer in sorted order (q35) pays any
materialization cost inside its measured wall — exactly like bench.py.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

REPO = sys.argv[1]
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F  # noqa: E402

FAMILY = [
    "q35_minhash_neardup",
    "q36_simhash_neardup",
    "q37_ngram_jaccard_topk",
    "q66_contamination",
    "q79_simjoin_threshold",
    "q90_topk_simjoin_ladder",
    "q95_ngram_novelty",
    "q98_containment_dedup",
    "q51_dedup_clusters",
]


def main() -> None:
    import importlib

    entry = importlib.import_module("__spark_entry__")
    from hoard_spark.artifacts import artifacts_root
    from hoard_spark.queries import release_caches

    shutil.rmtree(artifacts_root(), ignore_errors=True)
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("bench_shingle_family")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 << 20))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("lineitem", "documents"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.avg("l_quantity"), F.max("l_extendedprice"))
        .write.format("noop").mode("overwrite").save()
    )
    t0 = time.time()
    (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .groupBy("l_partkey")
        .agg(F.sum("l_quantity"), F.avg("l_extendedprice"))
        .write.format("noop").mode("overwrite").save()
    )
    canary = round(time.time() - t0, 3)

    registry = entry.queries()
    timings: dict[str, float] = {}
    for name in FAMILY:
        t0 = time.time()
        registry[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        timings[name] = round(time.time() - t0, 3)
        release_caches()
        spark.catalog.clearCache()
    gate = ["q36_simhash_neardup", "q90_topk_simjoin_ladder",
            "q79_simjoin_threshold", "q98_containment_dedup"]
    print(json.dumps({
        "repo": REPO,
        "sf_dir": SF_DIR,
        "canary_groupby_sec": canary,
        "queries": timings,
        "gate_q36_q90_q79_q98_sec": round(sum(timings[g] for g in gate), 3),
        "family_sec": round(sum(timings.values()), 3),
    }))


if __name__ == "__main__":
    main()
