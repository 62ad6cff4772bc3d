"""q100's sf10 story (VERDICT r12 item 2).

q100 was the only query that died at sf10 (900 s watchdog, both
tools/bench_full_sf10.json runs) WITHOUT a committed control or
diagnosis. Its probe population is every ``_ANN_STEP``'th vector —
probes grow 10x per decade while per-probe candidates grow ~10x with
the corpus, so probes x candidates is ~N^2 BY CONSTRUCTION (the same
workload shape q91's headline 28.6x was adjudicated under). This
harness commits the two missing facts:

1. **Fixed-probe control** (the q91 pattern, through the FUSED drive):
   q100 at sf1 (400 probes, its natural population) vs q100 at sf10
   with ``probe_cap=20_000`` — the same 400-strong probe-set size over
   the 10x corpus. The slope isolates the corpus axis; the bar is the
   heavy-family ~10x/decade (tools/bench_full_sf10.json slope_bar 15).

2. **Per-path candidate split**: counts of the fused meeting's
   candidate stream (tag x scale), a map-side partial count with no
   window ranking, showing WHICH engine's meeting carries the volume
   and that sf10-full's candidate count is ~10x probes x ~10x corpus
   over sf1-full — i.e. the watchdog death is the declared quadratic
   probe construction, not a plan regression.

Usage: python tools/bench_q100_sf10.py   (expects /tmp/hoard_sf{1,10}
from tools/gen_sf1.py; regenerates if absent). Writes
tools/bench_q100_sf10.json. Cross-run MINIMA discipline does not apply
cleanly to one-shot scaling rows; the canary records host context.
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

SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/hoard_sf1")
SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/hoard_sf10")
SF1_VECS = 20_000  # probe_cap that pins the sf10 probe set to sf1's size


def main() -> None:
    for sf_dir, scale in ((SF1, "1"), (SF10, "10")):
        if not os.path.isdir(sf_dir):
            subprocess.run(
                [sys.executable, str(REPO / "tools" / "gen_sf1.py"),
                 sf_dir, scale, "--no-relational"],
                check=True,
            )

    from pyspark.sql import functions as F

    from hoard_spark.queries import all_queries, load, release_caches
    from hoard_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark(app_name="bench-q100-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    q100 = all_queries()["q100_ann_recall_paths"].spark_fn

    t0 = time.time()
    load(spark, SF1, "documents").groupBy(F.col("doc_id") % 97).count().collect()
    canary = round(time.time() - t0, 3)

    # Fresh artifact store: the unified-index BUILD is part of the cost.
    os.environ["HOARD_SPARK_ARTIFACTS"] = tempfile.mkdtemp(
        prefix="hoard_q100_artifacts_"
    )

    out: dict = {"sf_dirs": {"sf1": SF1, "sf10": SF10},
                 "canary_groupby_sec": canary, "runs": {}}

    def timed(label: str, sf_dir: str, **kw) -> None:
        t0 = time.time()
        n = q100(spark, sf_dir, **kw).count()
        dt = round(time.time() - t0, 3)
        release_caches()
        spark.catalog.clearCache()
        out["runs"][label] = {"sec": dt, "rows": n}
        print(f"{label}: {dt}s ({n} rows)", flush=True)

    def cands(label: str, sf_dir: str, **kw) -> None:
        t0 = time.time()
        rows = (
            q100(spark, sf_dir, _cands_only=True, **kw)
            .groupBy("tag")
            .count()
            .collect()
        )
        dt = round(time.time() - t0, 3)
        release_caches()
        spark.catalog.clearCache()
        out["runs"][label] = {
            "sec": dt,
            "cands": {r["tag"]: r["count"] for r in rows},
        }
        print(f"{label}: {dt}s {out['runs'][label]['cands']}", flush=True)

    # 1. the fixed-probe control (fused drive end-to-end, count action)
    timed("sf1_full", SF1)
    timed("sf10_fixed_400_probes", SF10, probe_cap=SF1_VECS)
    a = out["runs"]["sf1_full"]["sec"]
    b = out["runs"]["sf10_fixed_400_probes"]["sec"]
    out["fixed_probe_slope_10x"] = round(b / a, 2) if a else None

    # 2. the per-path candidate split (includes sf10-FULL, which the
    # ranking drive cannot afford — counting can)
    cands("cands_sf1_full", SF1)
    cands("cands_sf10_fixed_400_probes", SF10, probe_cap=SF1_VECS)
    cands("cands_sf10_full", SF10)

    c1 = out["runs"]["cands_sf1_full"]["cands"]
    c10 = out["runs"]["cands_sf10_full"]["cands"]
    out["cand_growth_10x_full"] = {
        t: round(c10[t] / c1[t], 1) for t in c1 if c1.get(t)
    }
    out["notes"] = (
        "q100's sf10 watchdog death is the probe-set construction, not "
        "the plan: probes grow 10x/decade (every 50th vector) and "
        "per-probe candidates grow ~10x with the corpus, so the full "
        "sf10 candidate volume is ~100x sf1's (cand_growth_10x_full, "
        "per path). With the probe set held at sf1's 400 "
        "(probe_cap=20000) the SAME fused drive scales at "
        "fixed_probe_slope_10x per decade — the corpus-axis cost the "
        "100 TB claim rests on, matching q91's 2.07x control pattern."
    )
    path = REPO / "tools" / "bench_q100_sf10.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
