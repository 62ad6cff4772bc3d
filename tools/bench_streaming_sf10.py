"""Streaming-store scaling curves one more decade out: sf10
(VERDICT r12 item 6 — the stretch carried from r11).

Same method as tools/bench_streaming_sf1.py (read that docstring for
the linear-vs-superlinear contract), at the genuine-cardinality sf10
corpus: 500k docs / 200k vectors in 10 id-ordered micro-batches, so
every store ends holding 10x the sf1 corpus. Two extra axes recorded
here because they are the declared sf10 watch items:

- **per-batch parquet FILE COUNT of each store** — containment v2
  appends a ``batch=<id>`` directory per batch (that design killed the
  store-wide dedupe+anti shuffles at sf1), so its file population
  grows ~tasks x batches; at some depth the per-batch scan's file
  listing, not the data, becomes the cost. The curve makes that
  visible instead of anecdotal.
- **store rows** — the fingerprint/posting/signature population the
  next batch must meet.

Writes tools/bench_streaming_sf10.json. Run while no other Spark
session is timing (host waves: tools/bench_variance_r13.json).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/hoard_sf10")
BATCHES = 10
# compact every N batches (0 = never, the r13 append-only curve); the
# r14 re-run sets 3 to measure the operator-maintained store
COMPACT_EVERY = int(os.environ.get("HOARD_COMPACT_EVERY", "0"))


def _file_count(root: str) -> int:
    n = 0
    for _, _, files in os.walk(root):
        n += len(files)
    return n


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("hoard-streaming-sf10")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 << 20))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF10}/documents.parquet").select(
        "doc_id", "text"
    )
    vecs = spark.read.parquet(f"{SF10}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_docs = docs.count()
    n_vecs = vecs.count()

    t0 = time.time()
    docs.groupBy(F.col("doc_id") % 97).count().collect()
    canary = round(time.time() - t0, 3)

    root = tempfile.mkdtemp(prefix="hoard_stream_sf10_")
    out: dict = {
        "sf": 10,
        "batches": BATCHES,
        "n_docs": n_docs,
        "n_vecs": n_vecs,
        "canary_groupby_sec": canary,
        "stores": {},
    }

    def drive(name, index, table, id_col, n_rows, store_rows_fn, store_dir):
        walls, sizes, files, compact_secs = [], [], [], []
        step = (n_rows + BATCHES - 1) // BATCHES
        for b in range(BATCHES):
            lo, hi = b * step, min((b + 1) * step, n_rows)
            batch = table.where(
                (F.col(id_col) >= lo) & (F.col(id_col) < hi)
            )
            t = time.time()
            index.process_batch(batch, batch_id=b)
            walls.append(round(time.time() - t, 3))
            # Operator-cadence maintenance (VERDICT r13 item 9): run the
            # store's crash-safe compaction every COMPACT_EVERY batches,
            # between batches as documented in streaming/compact.py, so
            # the file-count curve shows the MAINTAINED store, not the
            # append-only worst case. 0 = off (the r13 curve).
            if COMPACT_EVERY and (b + 1) % COMPACT_EVERY == 0:
                t = time.time()
                index.compact()
                compact_secs.append(round(time.time() - t, 3))
            sizes.append(store_rows_fn())
            files.append(_file_count(store_dir))
        base = sorted(walls[1:4])[1]  # median of batches 2-4
        ratio = round(walls[-1] / base, 3) if base else None
        out["stores"][name] = {
            "per_batch_wall_sec": walls,
            "store_rows_after_batch": sizes,
            "store_files_after_batch": files,
            "last_over_median234": ratio,
            **(
                {"compact_every": COMPACT_EVERY,
                 "compact_wall_sec": compact_secs}
                if COMPACT_EVERY
                else {}
            ),
        }
        print(f"{name}: walls={walls} ratio={ratio} files={files[-1]}",
              flush=True)

    from hoard_spark.streaming.containment import ContainmentIndex
    from hoard_spark.streaming.neardup import NearDupIndex
    from hoard_spark.streaming.novelty import NoveltyIndex
    from hoard_spark.streaming.vectors import VectorDupIndex

    nd = NearDupIndex(spark, f"{root}/neardup", threshold=0.7)
    drive(
        "neardup", nd, docs, "doc_id", n_docs,
        lambda: nd.signatures().count(), f"{root}/neardup",
    )

    nv = NoveltyIndex(spark, f"{root}/novelty")
    drive(
        "novelty", nv, docs, "doc_id", n_docs,
        lambda: nv.grams().count(), f"{root}/novelty",
    )

    # width-3 containment is SKIPPED at sf10 with its diagnosis: the
    # closed 31-word testdata vocabulary saturates the 3-gram domain, so
    # per-gram df grows with the store and the prefix meetings go
    # quadratic regardless of plan — the first sf10 attempt (r13, this
    # harness) spilled ~77 GB and died ENOSPC mid-store (~batch 5/10,
    # store ~13M postings), exactly the batch q98 pathology. The width-5
    # store (domain ~28.6M, df flat) is the declared scale path,
    # mirroring tools/bench_containment_w5.json for the batch family.
    out["stores"]["containment_w3"] = {
        "skipped": (
            "ENOSPC at sf10 (~77 GB spill, died ~batch 5/10): 3-gram "
            "domain saturated on the closed test vocabulary, df grows "
            "with the store => per-batch candidates ~batch_df x "
            "store_df ~ N^2; width-5 control below is the scale path "
            "(same treatment as batch q98)"
        ),
    }
    ct = ContainmentIndex(
        spark, f"{root}/containment", threshold=0.9, width=5
    )
    drive(
        "containment_w5", ct, docs, "doc_id", n_docs,
        lambda: ct.postings().count(), f"{root}/containment",
    )

    vd = VectorDupIndex(spark, f"{root}/vectors", dim=64, threshold=0.92)
    drive(
        "vectors", vd, vecs, "vec_id", n_vecs,
        lambda: vd.signatures().count(), f"{root}/vectors",
    )

    suffix = f"_compact{COMPACT_EVERY}" if COMPACT_EVERY else ""
    path = REPO / "tools" / f"bench_streaming_sf10{suffix}.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {path}")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
