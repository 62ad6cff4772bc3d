"""Structured Streaming ingest — the streaming update/updateMany surface.

The reference has no streaming runtime, but its write path IS a streaming
contract (SURVEY.md §2B): tumbling buckets (src/hoard.coffee:203), bounded
lateness = maxRetention (:186-189), and late/out-of-order upserts inside
retention as a first-class feature (README.md:20-22 — the improvement over
RRD that motivated Whisper).

Design (SURVEY.md §7 hard part 2): Whisper-style backfill reaches *years*
into the past — far beyond any tenable watermark state for a stateful
streaming aggregation. So the stream never holds aggregation state at all:

    readStream -> foreachBatch:
        1. validity filter + tier routing + aligned append   (batch ingest)
        2. incremental rollup of the touched buckets only    (propagate)

Each micro-batch is a bounded batch job; LWW remains an at-read/compaction
concern anchored on ``seq``. Checkpointing gives exactly-once per batch
(appends are idempotent per epoch via Spark's file-sink-style semantics; for
true end-to-end idempotence under retries, carry a source ``seq`` so replays
collapse in the LWW dedup).

Multi-metric batches are grouped by retention-policy signature so each
distinct policy costs one Spark write per batch, not one per metric — with
millions of metrics and a handful of policies (the Graphite
storage-schemas.conf pattern) this is the 100 TB-scale shape.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from hoard_spark.engine import HoardEngine


def _policy_signature(info) -> tuple:
    return (
        tuple((a.seconds_per_point, a.points) for a in info.archives),
        info.x_files_factor,
    )


def ingest_microbatch(
    engine: HoardEngine,
    batch_df: DataFrame,
    batch_id: int,
    now: int | None = None,
    propagate: bool = True,
) -> None:
    """Process one micro-batch: columns (metric, ts, value[, seq]).

    Unknown metrics (no catalog policy) are skipped — the reference errors
    on a missing file; a stream must not die on one bad key, so they are
    dropped here (a dead-letter sink is the production extension point).
    """
    now = int(now if now is not None else time.time())
    # ONE scan answers both "is the batch empty" and "which metrics does
    # it touch" (round 8 — a separate isEmpty() action cost one extra
    # job per micro-batch, pure floor at streaming cadence).
    metrics = [
        r["metric"] for r in batch_df.select("metric").distinct().collect()
    ]
    known = [m for m in metrics if engine.catalog.exists(m)]
    if not known:
        return
    if "seq" not in batch_df.columns:
        # No source sequence: order within the batch is arbitrary, so
        # synthesize one that makes batches apply in arrival order.
        # Explicit bit budget (64-bit long): batch_id gets bits 40+,
        # partition id bits 28-39 (<=4096 partitions, asserted below),
        # per-partition record index bits 0-27 (<=268M rows/partition in
        # one micro-batch). monotonically_increasing_id alone can't sit
        # under batch_id's bits: it packs partitionId at bit 33, so any
        # partition id >=128 would overflow into the next batch's range.
        npart = batch_df.rdd.getNumPartitions()
        if npart > 1 << 12:
            raise ValueError(
                f"micro-batch has {npart} partitions; seq bit budget "
                "allows 4096 — repartition the stream or supply a seq column"
            )
        per_part_idx = F.monotonically_increasing_id().bitwiseAND(
            F.lit((1 << 33) - 1)
        )
        # Enforce the 28-bit index budget per row (assert_true is a codegen
        # expression — no extra job): a partition with >2^28 rows in one
        # micro-batch would otherwise bleed into the partition-id bits and
        # corrupt cross-partition LWW ordering.
        idx_guard = F.coalesce(
            F.assert_true(
                per_part_idx < F.lit(1 << 28),
                F.lit(
                    "micro-batch partition exceeds 2^28 rows; seq bit "
                    "budget overflow — repartition the stream or supply "
                    "a seq column"
                ),
            ).cast("long"),
            F.lit(0).cast("long"),
        )
        batch_df = batch_df.withColumn(
            "seq",
            (F.lit(int(batch_id)).cast("long") * F.lit(1 << 40))
            + (F.spark_partition_id().cast("long") * F.lit(1 << 28))
            + per_part_idx
            + idx_guard,
        )
    batch_df = batch_df.select("metric", "ts", "value", "seq")

    # One prepare+append per distinct policy signature (routing and
    # alignment depend only on the policy, never the metric name).
    by_sig: dict[tuple, list[str]] = {}
    for m in known:
        by_sig.setdefault(_policy_signature(engine.catalog.info(m)), []).append(m)

    with engine._writer_lock():
        _apply_microbatch(engine, batch_df, by_sig, now, propagate)


def _apply_microbatch(engine, batch_df, by_sig, now, propagate):
    for sig_metrics in by_sig.values():
        info = engine.catalog.info(sig_metrics[0])
        sub = batch_df.where(F.col("metric").isin(sig_metrics))
        # Prepare once, cache, and run the ROLLUP PASS BEFORE the points
        # append (round 8): with the prepared batch supplied as
        # ``pending``, the tier views take the micro-batch from memory
        # and read only pre-existing history from disk — the recompute
        # no longer re-lists and re-opens the small files the append
        # just wrote. Ordering is safe either way (LWW collapses rows
        # that are both on disk and in pending; a crash between the two
        # writes converges on foreachBatch replay) — the only observable
        # difference is a transient window where a rollup may be fresher
        # than the not-yet-visible raw points.
        prepared = engine.ingestor.prepare(sub, info, now).cache()
        # ONE catalog write per policy group (touch_many), not one per
        # metric — the control plane stays O(1) writes per micro-batch.
        engine.catalog.touch_many(sig_metrics, now)
        if propagate and len(info.archives) > 1:
            # ONE multi-metric cascade per policy group: O(tiers) Spark
            # jobs per micro-batch, independent of metric count.
            engine.propagate_many(
                sig_metrics, batch=prepared, pending=prepared
            )
        engine.ingestor.write(prepared)
        prepared.unpersist()


def start_ingest(
    engine: HoardEngine,
    stream_df: DataFrame,
    checkpoint_dir: str,
    now_fn: Callable[[], int] | None = None,
    propagate: bool = True,
    trigger: dict | None = None,
    query_name: str = "hoard_ingest",
) -> StreamingQuery:
    """Attach the ingest pipeline to a streaming DataFrame and start it.

    ``stream_df`` columns: (metric, ts long epoch-seconds, value double
    [, seq long]). ``trigger`` kwargs pass through to ``.trigger()``
    (default: ``availableNow=True`` — drain what's there, then stop; use
    ``processingTime='30 seconds'`` for continuous ingest).
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        ingest_microbatch(
            engine,
            batch_df,
            batch_id,
            now=now_fn() if now_fn else None,
            propagate=propagate,
        )

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
    )
    return writer.start()
