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
    "q91_ann_ivfpq",  # round 8: PQ encode + ADC scan + exact rerank
    "q95_ngram_novelty",  # round 8: gram-shuffle first-occurrence pass
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

    from pyspark.sql import functions as F

    from hoard_spark.queries import all_queries, load, release_caches
    from hoard_spark.queries.llm import (
        _TOPK_K,
        _TOPK_OFFSET,
        _TOPK_SUFFIX,
        shingle_rows_of,
    )
    from hoard_spark.session import get_spark
    from hoard_spark.simjoin import topk_similar_pairs

    spark = get_spark(app_name="bench-heavy-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    reg = all_queries()

    def topk_5gram_control(sf_dir: str):
        """q90's exact top-k over the SAME augmented corpus, shingled at
        width 5 instead of 3: on the testdata's closed 31-word
        vocabulary the 3-gram domain (~30k) saturates, per-shingle df
        grows with corpus size and the prefix join's sum(df_prefix^2)
        cost goes quadratic; width 5 (domain ~28.6M) keeps df flat. The
        control run shows the slope collapsing back to ~linear, i.e.
        the pathology is shingle-domain saturation, not the plan."""
        docs = load(spark, sf_dir, "documents")
        clones = docs.where(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + F.lit(_TOPK_OFFSET)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(_TOPK_SUFFIX)).alias("text"),
            "lang",
            "source",
        )
        aug = docs.select("doc_id", "text", "lang", "source").unionByName(
            clones
        )
        sh = shingle_rows_of(aug, width=5).select("doc_id", "s")
        return topk_similar_pairs(sh, _TOPK_K, ladder=(0.7, 0.5))

    # Fresh artifact store per run: q51 must time the cluster-artifact
    # BUILD (the scaling-relevant cost), not a warm read from a prior run.
    art_dir = tempfile.mkdtemp(prefix="hoard_sf1_artifacts_")
    os.environ["HOARD_SPARK_ARTIFACTS"] = art_dir

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
        t0 = time.time()
        n = topk_5gram_control(sf_dir).count()
        dt = round(time.time() - t0, 3)
        release_caches()
        out["stages"].setdefault("q90_width5_control", {})[sf_name] = {
            "sec": dt,
            "rows": n,
        }
        print(f"{sf_name} q90_width5_control: {dt}s ({n} rows)", flush=True)
        out["stages"].setdefault("ingest", {})[sf_name] = bench_ingest(
            spark, sf_dir
        )
        print(f"{sf_name} ingest: {out['stages']['ingest'][sf_name]}", flush=True)

    for stage, runs in out["stages"].items():
        a, b = runs["sf0.1"]["sec"], runs["sf1"]["sec"]
        runs["slope_10x"] = round(b / a, 2) if a > 0 else None
    out["notes"] = (
        "Slope bar ~10x (linear). q35 (MinHash-LSH), q51 (CC clusters), "
        "q79 (thresholded prefix join) and ingest scale linearly or "
        "better. q90 at width-3 shingles goes superlinear ON THIS CORPUS "
        "because the testdata's closed 31-word vocabulary saturates the "
        "3-gram domain (~30k): per-shingle df grows with N, so the "
        "prefix join's sum(df_prefix^2) candidate cost grows ~N^2. The "
        "width-5 control (domain 31^5 ~ 28.6M, df flat) collapses the "
        "slope back to ~linear on the identical corpus and plan — the "
        "production guidance is shingle-domain >> corpus size (real "
        "open-vocabulary corpora satisfy this at width 3-5), and the "
        "LSH path (q35) for corpora that cannot. q91 (round 8) is the "
        "IVF-PQ path: codebook training is sample-bounded (constant), "
        "encode + assignment ride the corpus scan, and the ADC meeting "
        "probes a constant cell fraction — expected slope ~linear in "
        "corpus size at fixed probe count."
    )
    (REPO / "tools" / "bench_heavy_sf1.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps({k: v.get("slope_10x") for k, v in out["stages"].items() if isinstance(v, dict)}))


if __name__ == "__main__":
    main()
