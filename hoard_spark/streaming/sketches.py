"""Incremental sketch-table maintenance under streaming ingest.

The pre-aggregated sketch tables (hoard_spark/sketches.py: HLL
distinct-count, equi-depth histogram quantiles) are only useful at
100 TB if they stay fresh WITHOUT re-reading the corpus. Both sketch
kinds are mergeable, so per-micro-batch maintenance is the natural
streaming sink:

    readStream -> foreachBatch:
        build the batch's sketch partials (map-side, batch-sized)
        merge with the persisted state   (sketch-sized, keys x grain)
        publish via crash-safe FS rename (WarehouseFS, staging dir)

The merge never touches raw history — state is the sketch table itself
(one HLL binary / one count array per (key, grain) group), so each batch
costs O(batch) + O(state). Each batch must be applied exactly once
(Spark's checkpointed foreachBatch gives at-least-once with batch_id;
a production sink should record the last applied batch_id next to the
state and skip replays — the same epoch guard every non-idempotent
foreachBatch sink needs).

Losslessness is the whole contract: state-after-N-batches must EQUAL the
one-shot table over the union of the batches — pinned by
tests/test_streaming_sketches.py for both sketch kinds.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hoard_spark.fsutil import WarehouseFS
from hoard_spark.sketches import (
    DEFAULT_LG_K,
    distinct_sketch_table,
    merge_quantile,
    quantile_sketch_table,
)


def _publish(spark: SparkSession, df: DataFrame, state_path: str) -> None:
    """Materialize ``df`` to a staging dir, then swap it into
    ``state_path`` with the crash-safe replace rename. ``df`` may read
    the CURRENT state — the staging write materializes it before the
    old tree moves."""
    fs = WarehouseFS(spark)
    staging = f"{state_path.rstrip('/')}.stage-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(staging)
    fs.rename(staging, state_path)


def update_distinct_state(
    spark: SparkSession,
    state_path: str,
    batch_df: DataFrame,
    keys: list[str],
    col: str,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Merge one micro-batch into the persisted HLL sketch table at
    ``state_path`` (created on first batch). Returns the new state as a
    parquet scan. lg_k must match across batches (union requirement)."""
    fs = WarehouseFS(spark)
    batch_tbl = distinct_sketch_table(batch_df, keys, col, lg_k)
    if fs.exists(f"{state_path.rstrip('/')}/_SUCCESS"):
        prev = spark.read.parquet(state_path)
        combined = (
            prev.unionByName(batch_tbl)
            .groupBy(*keys)
            .agg(
                F.hll_union_agg("sketch").alias("sketch"),
                F.sum("rows").alias("rows"),
            )
        )
    else:
        combined = batch_tbl
    _publish(spark, combined, state_path)
    return spark.read.parquet(state_path)


def update_quantile_state(
    spark: SparkSession,
    state_path: str,
    batch_df: DataFrame,
    keys: list[str],
    col: str,
    boundaries: list[float],
) -> DataFrame:
    """Merge one micro-batch into the persisted histogram sketch table.

    ``boundaries`` is the SHARED grid and must be fixed for the life of
    the state (compute once from a reference sample /
    ``quantile_boundaries``; mergeability requires identical grids —
    passing it explicitly is what makes that contract visible)."""
    fs = WarehouseFS(spark)
    batch_tbl = quantile_sketch_table(
        batch_df, keys, col, boundaries=boundaries
    )
    if fs.exists(f"{state_path.rstrip('/')}/_SUCCESS"):
        prev = spark.read.parquet(state_path)
        combined = merge_quantile(prev.unionByName(batch_tbl), keys)
    else:
        combined = batch_tbl
    _publish(spark, combined, state_path)
    return spark.read.parquet(state_path)


def distinct_maintenance_sink(
    state_path: str, keys: list[str], col: str, lg_k: int = DEFAULT_LG_K
):
    """``foreachBatch`` adapter: keeps the HLL sketch table fresh under
    a streaming source. Usage:
    ``stream.writeStream.foreachBatch(distinct_maintenance_sink(...))``.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        update_distinct_state(
            batch_df.sparkSession, state_path, batch_df, keys, col, lg_k
        )

    return sink
