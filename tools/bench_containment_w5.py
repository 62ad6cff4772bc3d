"""Width-5 containment-join control: q98's declared scale path.

q98's conformance construction (3-gram shingles, t=0.9 directed
containment over base docs + 10% planted truncations) is quadratic ON
THIS CORPUS: the closed 31-word test vocabulary saturates the 3-gram
domain (~30k shapes), so per-gram document frequency grows linearly
with N and the prefix posting join's candidate count
(sum_s df_prefixA(s) * df(s)) grows ~N^2 — at sf10 the candidate
shuffle fills the disk (ENOSPC, bench_full_sf10.json). That is a
property of the synthetic vocabulary, not the plan: real corpora have
open vocabularies where df stays flat.

This control runs the SAME construction over width-5 shingles (domain
31^5 ~ 28.6M, df ~ 1) at sf1 and sf10 and records the decade slope —
the direct analog of q90's width-5 ladder control in
bench_heavy_sf10.json (3.97x/decade).

Usage: python tools/bench_containment_w5.py  (corpora must exist:
/tmp/hoard_sf1 and /tmp/hoard_sf10 via tools/gen_sf1.py)
Writes tools/bench_containment_w5.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/hoard_sf1")
SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/hoard_sf10")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WIDTH = 5
T = 0.9
MIN_SIZE = 5
OFFSET = 3_000_000


def containment_w5(spark, sf_dir):
    from pyspark.sql import functions as F

    from hoard_spark.queries import load
    from hoard_spark.queries.llm import shingle_rows_of
    from hoard_spark.simjoin import containment_join, rank_shingle_rows

    docs = load(spark, sf_dir, "documents")
    sh = shingle_rows_of(docs, width=WIDTH, with_pos=True).select(
        "doc_id", "s", "pos"
    )
    toks = F.split(F.trim("text"), " +")
    k = F.greatest(
        F.lit(WIDTH),
        F.ceil(F.lit(0.6) * F.size(toks)).cast("int"),
    )
    ks = docs.where(F.col("doc_id") % 10 == 0).select(
        "doc_id", k.alias("_k")
    )
    # q98's clone construction: every 10th doc truncated to 60% of its
    # tokens = a pure position filter of the shingle rows
    clones = (
        sh.where(F.col("doc_id") % 10 == 0)
        .join(ks, "doc_id")
        .where(F.col("pos") + F.lit(WIDTH - 1) < F.col("_k"))
        .select(
            (F.col("doc_id") + F.lit(OFFSET)).alias("doc_id"), "s"
        )
    )
    union = sh.select("doc_id", "s").unionByName(clones)
    ranked = rank_shingle_rows(union)
    return containment_join(ranked, T, min_size=MIN_SIZE)


def main() -> None:
    from pyspark.sql import SparkSession

    from hoard_spark.queries import release_caches

    os.environ["HOARD_SPARK_ARTIFACTS"] = tempfile.mkdtemp(
        prefix="cont_w5_artifacts_"
    )
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-containment-w5")
        .config("spark.sql.shuffle.partitions", str(2 * CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "64g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out = {"width": WIDTH, "t": T, "stages": {}}
    for sf_name, sf_dir in (("sf1", SF1), ("sf10", SF10)):
        if not os.path.exists(f"{sf_dir}/documents.parquet"):
            print(f"# {sf_name}: corpus missing at {sf_dir}, skipping",
                  file=sys.stderr)
            continue
        # untimed warm-up pass (codegen compile), then two timed runs;
        # record the min (host-wave discipline, SURVEY §6)
        walls = []
        rows = None
        for i in range(3):
            t0 = time.time()
            df = containment_w5(spark, sf_dir)
            n = df.count()
            dt = round(time.time() - t0, 3)
            release_caches()
            spark.catalog.clearCache()
            if i > 0:
                walls.append(dt)
            rows = n
            print(f"# {sf_name} run{i}: {dt}s ({n} rows)",
                  file=sys.stderr, flush=True)
        out["stages"][sf_name] = {
            "wall_sec_min": min(walls),
            "walls": walls,
            "rows": rows,
        }
    s = out["stages"]
    if "sf1" in s and "sf10" in s:
        out["slope_sf10_over_sf1"] = round(
            s["sf10"]["wall_sec_min"] / s["sf1"]["wall_sec_min"], 2
        )
    out["note"] = (
        "width-5 directed containment join (t=0.9) with q98's planted-"
        "truncation construction at genuine sf1 and sf10 cardinalities. "
        "The declared scale path for q98: on the 31-word closed test "
        "vocabulary the 5-gram domain (~28.6M) keeps df flat, so the "
        "prefix posting join stays near-linear per decade — vs the "
        "3-gram conformance form whose df grows with N (sum df_prefix*"
        "df ~ N^2, ENOSPC at sf10; see bench_full_sf10.json). Min over "
        "2 timed runs after an untimed codegen warm-up."
    )
    path = REPO / "tools" / "bench_containment_w5.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
