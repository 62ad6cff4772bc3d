"""Whisper-tree migration at scale (VERDICT r9 stretch 9).

The real adoption path for a Graphite/reference user is "point the
importer at my tree of .wsp files": this benchmarks
``hoard_spark.sources.whisper.import_tree`` over a synthetic 10k-file
tree (2-tier rings, ~4.6M slots) — the distributed binaryFile +
mapInPandas unpack path — and spot-checks a round-trip fetch against
the generator's own slot values (the reference semantics: imported
slots served verbatim).

File format written here is the public Whisper layout the connector
reads (header ``!2LfL``, archive directory ``!3L``, points ``!Ld`` —
BSD-licensed Graphite Whisper; same citations as sources/whisper.py).

Writes tools/bench_whisper_migration.json. Run while no other Spark
session is timing (host waves: tools/bench_variance_r9.json).
"""

from __future__ import annotations

import json
import os
import shutil
import struct
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_FILES = 10_000
# tier0: 60s x 360 slots (6h), tier1: 3600s x 96 slots (4 days)
ARCHIVES = [(60, 360), (3600, 96)]
NOW = 1_700_000_000 - (1_700_000_000 % 3600)


def _write_wsp(path: str, midx: int) -> int:
    """One 2-tier ring, every slot populated; returns slot count."""
    spp0, n0 = ARCHIVES[0]
    spp1, n1 = ARCHIVES[1]
    max_ret = max(s * n for s, n in ARCHIVES)
    header = struct.pack("!2LfL", 1, max_ret, 0.5, len(ARCHIVES))
    off0 = len(header) + len(ARCHIVES) * struct.calcsize("!3L")
    off1 = off0 + n0 * struct.calcsize("!Ld")
    dirs = struct.pack("!3L", off0, spp0, n0) + struct.pack(
        "!3L", off1, spp1, n1
    )
    pts = []
    base0 = NOW - spp0 * n0
    for i in range(n0):
        ts = base0 + i * spp0
        pts.append(struct.pack("!Ld", ts, float((midx + i) % 997)))
    base1 = NOW - spp1 * n1
    for i in range(n1):
        ts = base1 + i * spp1
        pts.append(struct.pack("!Ld", ts, float((midx * 7 + i) % 499)))
    with open(path, "wb") as f:
        f.write(header + dirs + b"".join(pts))
    return n0 + n1


def main() -> None:
    from pyspark.sql import SparkSession

    tree = tempfile.mkdtemp(prefix="wsp_tree_")
    t0 = time.time()
    total_slots = 0
    for i in range(N_FILES):
        sub = os.path.join(tree, f"g{i % 100:02d}")
        os.makedirs(sub, exist_ok=True)
        total_slots += _write_wsp(
            os.path.join(sub, f"metric{i:05d}.wsp"), i
        )
    gen_sec = round(time.time() - t0, 2)

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("hoard-whisper-migration")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    t0 = time.time()
    spark.range(1 << 22).groupBy(F.col("id") % 97).count().collect()
    canary = round(time.time() - t0, 3)

    from hoard_spark.engine import HoardEngine
    from hoard_spark.sources.whisper import import_tree

    wh = tempfile.mkdtemp(prefix="wsp_wh_")
    engine = HoardEngine(spark, wh, metric_buckets=64)

    t0 = time.time()
    n = import_tree(engine, f"{tree}/*/*.wsp", now=NOW)
    wall = time.time() - t0
    assert n == total_slots, (n, total_slots)

    # Round-trip spot-check vs the generator's own slot values, both
    # tiers (reference semantics: imported slots served verbatim).
    spp0, n0 = ARCHIVES[0]
    spp1, n1 = ARCHIVES[1]
    checks = 0
    for midx in (3, 4242, 9999):
        m = f"metric{midx:05d}"
        # tier 0: a 10-slot window ending at the last populated slot
        # (a window touching the bucket OF `now` would read one future
        # empty bucket — the ring's last slot is at NOW - spp0)
        frm, to = NOW - 10 * spp0, NOW - spp0
        ti, values = engine.fetch(m, frm, to, now=NOW)
        base0 = NOW - spp0 * n0
        expect = [
            float((midx + (b - base0) // spp0) % 997)
            for b in range(ti.from_interval, ti.to_interval, ti.step)
        ]
        assert ti.step == spp0 and values == expect, (m, values, expect)
        # tier 1: a window older than tier-0 retention
        frm = NOW - spp1 * (n1 - 2)
        to = frm + 5 * spp1
        ti, values = engine.fetch(m, frm, to, now=NOW)
        base1 = NOW - spp1 * n1
        expect = [
            float((midx * 7 + (b - base1) // spp1) % 499)
            for b in range(ti.from_interval, ti.to_interval, ti.step)
        ]
        assert ti.step == spp1 and values == expect, (m, values, expect)
        checks += 2

    out = {
        "n_files": N_FILES,
        "total_slots": total_slots,
        "generate_sec": gen_sec,
        "canary_groupby_sec": canary,
        "import_wall_sec": round(wall, 2),
        "slots_per_sec": int(total_slots / wall),
        "files_per_sec": int(N_FILES / wall),
        "roundtrip_fetch_checks": checks,
    }
    path = REPO / "tools" / "bench_whisper_migration.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    shutil.rmtree(tree, ignore_errors=True)
    shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
