"""Full-suite engine walls at sf10 — the relational/window family's
second genuine cardinality decade (VERDICT r11 missing-item #4).

The dedup/ANN/ingest family already has sf1 -> sf10 slopes
(tools/bench_heavy_sf10.json); the other ~70 queries stopped at sf1.
This times EVERY registered query once on the genuine-cardinality sf10
corpus (tools/gen_sf1.py with SCALE=10 INCLUDING the relational star
schema: 60M lineitem / 15M orders / 1.5M customers / 2M parts / 500k
docs / 10M events / 200k vectors — fresh draws, not replication) and
records the per-query slope vs the committed sf1 cross-run minima.
Pass bar 15x per decade (10x data + overhead), same as sf0.1 -> sf1.

Per-query watchdog: a timer cancels the query's job group at
``--cap`` seconds (default 900) and records it as a timeout instead of
letting one known-quadratic conformance workload absorb the suite.
Known cases, diagnosed at sf1/sf10 in the heavy-family artifact:
q90's width-3 ladder (closed 31-word vocabulary saturates the 3-gram
domain, sum(df^2) ~ N^2 — the width-5 control is the declared scale
path) and q91/q100's conformance probe sets (probes = every 50th
vector, so probes x candidates grows ~N^2 by construction; the
fixed-probe control in bench_heavy_sf10.json isolates the engine at
2.07x/decade).

Usage: python tools/bench_full_sf10.py [--runs N] [--cap SEC]
Regenerates the corpus if absent. Writes tools/bench_full_sf10.json
(cross-run minima per the measurement discipline in SURVEY §6).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/hoard_sf10")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SLOPE_BAR = 15.0

# Quadratic-on-THIS-corpus conformance workloads, excluded by default
# with their committed diagnoses (they fill the disk with candidate
# shuffle spill long before the watchdog fires — measured ENOSPC at
# sf10 in both runs of r12):
# - q90's width-3 ladder: the closed 31-word testdata vocabulary
#   saturates the 3-gram domain (~30k shapes), df grows with N and the
#   prefix join's sum(df^2) candidate count is ~N^2 REGARDLESS of plan
#   (diagnosed at sf1; the width-5 control — domain ~28.6M, df flat —
#   is the declared scale path: bench_heavy_sf10.json 3.97x/decade).
# - q98's 3-gram containment join: same vocabulary saturation one
#   construction over (candidates = sum df_prefixA * df); the width-5
#   containment control in tools/bench_containment_w5.json is its
#   declared scale path.
SKIP = {
    "q90_topk_simjoin_ladder": "ENOSPC: 3-gram domain saturated, "
    "sum(df^2)~N^2 on the closed test vocabulary; width-5 control is "
    "the scale path (bench_heavy_sf10.json)",
    "q98_containment_dedup": "ENOSPC: same 3-gram saturation via the "
    "containment prefix join; width-5 control is the scale path "
    "(bench_containment_w5.json)",
}


def _fp() -> str:
    from tools.check_correctness import corpus_fingerprint

    return corpus_fingerprint(SF10)


def _arg(flag: str, default: int) -> int:
    return (
        int(sys.argv[sys.argv.index(flag) + 1])
        if flag in sys.argv
        else default
    )


def one_run(spark, cap: float, skip: set, only: set) -> tuple[dict, dict, dict]:
    from pyspark.sql import functions as F

    from hoard_spark.queries import all_queries, release_caches

    # warm-up: shuffle + codegen + python workers (bench.py discipline)
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(f"{SF10}/{t}.parquet").count()
    (
        spark.read.parquet(f"{SF10}/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.avg("l_quantity"), F.max("l_extendedprice"))
        .write.format("noop").mode("overwrite").save()
    )
    (
        spark.range(CPUS).repartition(CPUS)
        .mapInPandas(lambda it: it, "id long")
        .write.format("noop").mode("overwrite").save()
    )
    t0 = time.time()
    (
        spark.read.parquet(f"{SF10}/lineitem.parquet")
        .groupBy("l_partkey")
        .agg(F.sum("l_quantity"), F.avg("l_extendedprice"))
        .write.format("noop").mode("overwrite").save()
    )
    canary = round(time.time() - t0, 3)

    sc = spark.sparkContext
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, q in sorted(all_queries().items()):
        if only and name not in only:
            continue
        if name in skip or name in SKIP:  # earlier timeout / documented
            continue                      # quadratic — no minimum to gain
        group = f"sf10:{name}"
        sc.setJobGroup(group, name, interruptOnCancel=True)
        timer = threading.Timer(cap, sc.cancelJobGroup, args=(group,))
        timer.start()
        t0 = time.time()
        try:
            q.spark_fn(spark, SF10).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[name] = round(time.time() - t0, 3)
            print(f"# {name}: {timings[name]:.2f}s", file=sys.stderr,
                  flush=True)
        except Exception as e:  # noqa: BLE001 — time the rest regardless
            wall = time.time() - t0
            kind = "TIMEOUT" if wall >= cap - 1 else "ERROR"
            errors[name] = f"{kind} at {wall:.0f}s: " + (
                f"{type(e).__name__}: {e}"[:220]
            )
            print(f"# {name}: {errors[name][:120]}", file=sys.stderr,
                  flush=True)
        finally:
            timer.cancel()
            sc.setJobGroup("", "")
            release_caches()
            spark.catalog.clearCache()
    return timings, errors, {"canary_groupby_sec": canary}


def main() -> None:
    if not os.path.exists(f"{SF10}/lineitem.parquet"):
        subprocess.run(
            [sys.executable, str(REPO / "tools" / "gen_sf1.py"),
             SF10, "10"],
            check=True,
        )
    runs = _arg("--runs", 2)
    cap = float(_arg("--cap", 900))
    only = (
        set(sys.argv[sys.argv.index("--only") + 1 :])
        if "--only" in sys.argv
        else set()
    )

    from pyspark.sql import SparkSession

    # own artifact root: sf10 artifacts must not collide with the bench's
    art_dir = tempfile.mkdtemp(prefix="hoard_sf10_full_artifacts_")
    os.environ["HOARD_SPARK_ARTIFACTS"] = art_dir

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-full-sf10")
        .config("spark.sql.shuffle.partitions", str(2 * CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "80g")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 << 20))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = {}
    base_path = REPO / "tools" / "bench_full_sf1.json"
    if base_path.exists():
        base = json.loads(base_path.read_text()).get("queries", {})

    all_runs = []
    minima: dict[str, float] = {}
    errors_union: dict[str, str] = {}
    timed_out: set = set()
    for i in range(runs):
        timings, errors, meta = one_run(spark, cap, timed_out, only)
        timed_out |= {
            n for n, msg in errors.items() if msg.startswith("TIMEOUT")
        }
        all_runs.append({
            "suite_seconds": round(sum(timings.values()), 3),
            "n_timed": len(timings),
            **meta,
        })
        errors_union.update(errors)
        for n, t in timings.items():
            if n not in minima or t < minima[n]:
                minima[n] = t
        print(f"# run {i + 1}/{runs}: {all_runs[-1]}", file=sys.stderr,
              flush=True)

    path = REPO / "tools" / "bench_full_sf10.json"
    if only and path.exists():
        # targeted refresh: merge the re-measured queries into the
        # committed artifact (same discipline as check_correctness.py's
        # partial runs) — entries not re-run keep their prior minima,
        # refreshed entries REPLACE (not min-merge) theirs so a plan
        # change's new wall is recorded even when it is slower
        prior = json.loads(path.read_text())
        merged = dict(prior.get("queries", {}))
        merged.update(minima)
        minima = merged
        prior_errors = {
            k: v
            for k, v in prior.get("errors", {}).items()
            if k not in only and k not in minima
        }
        errors_union = {**prior_errors, **errors_union}
        all_runs = prior.get("runs", []) + [
            {**r, "only": sorted(only)} for r in all_runs
        ]
    slopes = {
        n: round(t / base[n], 2)
        for n, t in minima.items()
        if base.get(n, 0) > 0
    }
    outliers = {
        n: {"sf10_sec": minima[n], "sf1_sec": base[n], "slope": s}
        for n, s in sorted(slopes.items(), key=lambda kv: -kv[1])
        if s > SLOPE_BAR
    }
    out = {
        "note": (
            "engine walls for the FULL suite at genuine-cardinality "
            "sf10 (fresh-sample corpus INCLUDING the relational star "
            "schema: 60M lineitem; see tools/gen_sf1.py SCALE=10). "
            "slope = sf10_wall / committed sf1 cross-run-minimum; bar "
            f"= {SLOPE_BAR}x per decade. CROSS-RUN MINIMA over "
            f"{runs} same-tree runs (this host's 2-4x waves make "
            "single runs indefensible). Queries in `errors` hit the "
            f"{cap:.0f}s watchdog or failed — each carries its "
            "diagnosis in the module docstring."
        ),
        "sf10_dir": SF10,
        "corpus_fingerprint": _fp(),
        "cpus": CPUS,
        "protocol": f"min over {runs} runs, {cap:.0f}s per-query cap",
        "runs": all_runs,
        "suite_seconds_minima": round(sum(minima.values()), 3),
        "n_queries": len(minima),
        "errors": errors_union,
        "slope_bar": SLOPE_BAR,
        "skipped_quadratic": SKIP,
        "outliers_over_bar": outliers,
        "slopes": dict(sorted(slopes.items(), key=lambda kv: -kv[1])),
        "queries": minima,
    }
    path = REPO / "tools" / "bench_full_sf10.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    import shutil

    shutil.rmtree(art_dir, ignore_errors=True)
    print(json.dumps({
        "suite_seconds_minima": out["suite_seconds_minima"],
        "n_queries": out["n_queries"],
        "errors": list(errors_union),
        "worst_slopes": dict(list(out["slopes"].items())[:8]),
        "outliers_over_bar": list(outliers),
        "artifact": str(path.relative_to(REPO)),
    }))


if __name__ == "__main__":
    main()
