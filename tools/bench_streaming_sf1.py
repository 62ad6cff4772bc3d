"""Streaming-store scaling curves at sf1 (VERDICT r9 item 3).

The batch suite has genuine-10x sf1 slopes for all 100 queries; this
closes the one unmeasured axis — the four incremental streaming stores
(neardup / vectors / novelty / containment) driven micro-batch by
micro-batch until the store holds the sf1-scale corpus, recording
per-batch wall vs store size.

What linear-vs-superlinear means here: every store's per-batch work is
(batch-sized build) + (candidate meeting against the store) + (append).
The candidate joins are banded/prefix-bounded, so per-batch wall should
stay FLAT-to-mildly-growing as the store grows 10x — a superlinear
curve would mean a store rescan crept into the batch path. The stores
re-READ their parquet tail per batch (postings()/signatures() are
plain scans), so a mild linear term from scan width is expected and
declared; the batch path must not square it.

Method per store: split the sf1 table (50k docs / 20k vectors) into 10
equal id-ordered batches, process_batch each, record wall + cumulative
store rows. Fit: report r = wall(last batch)/median(wall of batches
2-4) — under ~2x is flat-to-linear at a 10x store growth (batch 1 is
excluded from the base: first-batch walls carry codegen + store
bootstrap). Canary context per the host-variance discipline.

Writes tools/bench_streaming_sf1.json. Run while no other Spark
session is timing (host waves: see tools/bench_variance_r9.json).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF1 = "/tmp/hoard_sf1"
BATCHES = 10


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("hoard-streaming-sf1")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 << 20))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF1}/documents.parquet").select(
        "doc_id", "text"
    )
    vecs = spark.read.parquet(f"{SF1}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_docs = docs.count()
    n_vecs = vecs.count()

    t0 = time.time()
    docs.groupBy(F.col("doc_id") % 97).count().collect()
    canary = round(time.time() - t0, 3)

    root = tempfile.mkdtemp(prefix="hoard_stream_sf1_")
    out: dict = {
        "sf": 1,
        "batches": BATCHES,
        "n_docs": n_docs,
        "n_vecs": n_vecs,
        "canary_groupby_sec": canary,
        "stores": {},
    }

    def drive(name, index, table, id_col, n_rows, store_rows_fn):
        walls, sizes = [], []
        step = (n_rows + BATCHES - 1) // BATCHES
        for b in range(BATCHES):
            lo, hi = b * step, min((b + 1) * step, n_rows)
            batch = table.where(
                (F.col(id_col) >= lo) & (F.col(id_col) < hi)
            )
            t = time.time()
            index.process_batch(batch, batch_id=b)
            walls.append(round(time.time() - t, 3))
            sizes.append(store_rows_fn())
        base = sorted(walls[1:4])[1]  # median of batches 2-4
        ratio = round(walls[-1] / base, 3) if base else None
        out["stores"][name] = {
            "per_batch_wall_sec": walls,
            "store_rows_after_batch": sizes,
            "last_over_median234": ratio,
        }
        print(f"{name}: walls={walls} ratio={ratio}", flush=True)

    from hoard_spark.streaming.containment import ContainmentIndex
    from hoard_spark.streaming.neardup import NearDupIndex
    from hoard_spark.streaming.novelty import NoveltyIndex
    from hoard_spark.streaming.vectors import VectorDupIndex

    nd = NearDupIndex(spark, f"{root}/neardup", threshold=0.7)
    drive(
        "neardup", nd, docs, "doc_id", n_docs,
        lambda: nd.signatures().count(),
    )

    nv = NoveltyIndex(spark, f"{root}/novelty")
    drive(
        "novelty", nv, docs, "doc_id", n_docs,
        lambda: nv.grams().count(),
    )

    ct = ContainmentIndex(spark, f"{root}/containment", threshold=0.9)
    drive(
        "containment", ct, docs, "doc_id", n_docs,
        lambda: ct.postings().count(),
    )

    vd = VectorDupIndex(spark, f"{root}/vectors", dim=64, threshold=0.92)
    drive(
        "vectors", vd, vecs, "vec_id", n_vecs,
        lambda: vd.signatures().count(),
    )

    path = REPO / "tools" / "bench_streaming_sf1.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
