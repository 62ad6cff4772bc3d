"""Streaming-store compaction A/B: file growth + per-batch wall.

24 micro-batches of documents drive TWO containment stores over the
same data — one compacted every 8 batches, one never — interleaved
batch-by-batch so host waves hit both arms alike. Records per-batch
walls, recursive store file counts after each batch, and the final
pair-set equality check (compaction must be invisible to results).

At this conformance scale the per-batch wall is dominated by Spark's
fixed job floor, so the headline is the FILE-COUNT axis (tasks x
batches growth vs bounded) plus the equality pin; the wall columns
document whether listing cost is already measurable at N=24.

Usage: python tools/bench_compaction.py  →  tools/bench_compaction.json
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_BATCHES = 24
COMPACT_EVERY = 8
DOCS_PER_BATCH = 40


def _batch(spark, b: int):
    rows = [
        (b * DOCS_PER_BATCH + i,
         " ".join(f"s{(b * DOCS_PER_BATCH + i) % 9}w{j}" for j in range(14)))
        for i in range(DOCS_PER_BATCH)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def main() -> None:
    from hoard_spark.session import get_spark
    from hoard_spark.streaming.compact import store_file_count
    from hoard_spark.streaming.containment import ContainmentIndex

    spark = get_spark(shuffle_partitions=16)
    base = tempfile.mkdtemp(prefix="hoard_compaction_ab_")
    comp = ContainmentIndex(spark, f"{base}/comp", threshold=0.8)
    ctrl = ContainmentIndex(spark, f"{base}/ctrl", threshold=0.8)

    def files(idx) -> int:
        return sum(
            store_file_count(spark, p)
            for p in (idx.post_path, idx.docfp_path, idx.pair_path)
        )

    rows = []
    compact_walls = []
    for b in range(N_BATCHES):
        df = _batch(spark, b)
        t0 = time.time()
        ctrl.process_batch(df, b)
        w_ctrl = round(time.time() - t0, 3)
        t0 = time.time()
        comp.process_batch(df, b)
        w_comp = round(time.time() - t0, 3)
        if b > 0 and b % COMPACT_EVERY == 0:
            t0 = time.time()
            comp.compact(target_files=8)
            compact_walls.append(round(time.time() - t0, 3))
        rows.append(
            {
                "batch": b,
                "wall_ctrl": w_ctrl,
                "wall_comp": w_comp,
                "files_ctrl": files(ctrl),
                "files_comp": files(comp),
            }
        )
        print(f"# {rows[-1]}", file=sys.stderr, flush=True)

    # final compaction, then the invisibility pin
    comp.compact(target_files=8)
    pc = {
        (r["a_id"], r["b_id"], r["inter"]) for r in comp.pairs().collect()
    }
    pt = {
        (r["a_id"], r["b_id"], r["inter"]) for r in ctrl.pairs().collect()
    }
    half = N_BATCHES // 2
    out = {
        "what": (
            "containment-store compaction A/B: interleaved per-batch "
            "walls + recursive store file counts; compacted arm folds "
            f"every {COMPACT_EVERY} batches to target_files=8"
        ),
        "n_batches": N_BATCHES,
        "docs_per_batch": DOCS_PER_BATCH,
        "pairs_equal": pc == pt,
        "n_pairs": len(pt),
        "files_final": {
            "ctrl": rows[-1]["files_ctrl"],
            "comp_after_final_compact": files(comp),
        },
        "wall_mean_first_half": {
            "ctrl": round(sum(r["wall_ctrl"] for r in rows[:half]) / half, 3),
            "comp": round(sum(r["wall_comp"] for r in rows[:half]) / half, 3),
        },
        "wall_mean_second_half": {
            "ctrl": round(sum(r["wall_ctrl"] for r in rows[half:]) / half, 3),
            "comp": round(sum(r["wall_comp"] for r in rows[half:]) / half, 3),
        },
        "compact_walls": compact_walls,
        "batches": rows,
    }
    path = REPO / "tools" / "bench_compaction.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({k: out[k] for k in (
        "pairs_equal", "n_pairs", "files_final",
        "wall_mean_first_half", "wall_mean_second_half",
    )}))


if __name__ == "__main__":
    main()
