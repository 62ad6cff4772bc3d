"""HoardEngine — the facade tying catalog + ingest + rollup + fetch together.

This is the Spark-native replacement for the reference's five-call API
(src/hoard.coffee:515-519):

    create / info       -> Catalog (driver-side metadata)
    update / updateMany -> partitioned Parquet append + LWW-at-read
    fetch               -> tier routing + pruned scan + spine gap-fill

plus the maintenance jobs a 100 TB deployment needs (compaction, retention
drop) and the incremental rollup cascade (the reference's propagate).

Storage layout (all append-only Parquet):

    <warehouse>/points/tier=K/metric=M/date=D/   raw aligned points
        (bucket_ts long, value double, seq long, ts long)
    <warehouse>/rollups/tier=K/metric=M/date=D/  materialized downsamples
        (bucket_ts long, value double, known long)

Partitioning by (tier, metric, date) gives partition pruning on every fetch
(a range fetch touches only the dates it covers) and makes retention drop a
partition delete. For very-high-cardinality metric spaces, the opt-in
hash-bucketed layout (``metric_buckets=N``) swaps the ``metric`` partition
column for ``mb = crc32(metric) % N`` with ``metric`` as a data column.
Data-plane filesystem operations go through the Hadoop FileSystem API
(hoard_spark/fsutil.py) so maintenance works on file://, HDFS and S3
alike; the driver-side JSON control plane (catalog/seq/layout/markers) is
the documented single-writer simplification that becomes a metastore table
in production.
"""

from __future__ import annotations

import fcntl
import json
import os
import re
import time
import zlib
from contextlib import contextmanager
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hoard_spark.catalog import Catalog, HoardError, MetricInfo
from hoard_spark.fetch import TimeInfo, collect_values, fetch_df, plan_fetch
from hoard_spark.fsutil import WarehouseFS, strip_local_uri
from hoard_spark.functions import align_ts, bucket_date_col, spine
from hoard_spark.ingest import Ingestor, lww, prepare_batch, validate_single
from hoard_spark.rollup import merge_direct, plan_cascade, rollup_tier

_POINTS_READ_SCHEMA = T.StructType(
    [
        T.StructField("bucket_ts", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("seq", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("tier", T.IntegerType()),
        T.StructField("metric", T.StringType()),
        T.StructField("date", T.DateType()),
    ]
)

_ROLLUP_READ_SCHEMA = T.StructType(
    [
        T.StructField("bucket_ts", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("known", T.LongType()),
        T.StructField("tier", T.IntegerType()),
        T.StructField("metric", T.StringType()),
        T.StructField("date", T.DateType()),
    ]
)


# partition-dir values Spark writes verbatim (no escaping); the driver-side
# fetch fast path only handles these
_SAFE_PART_RE = re.compile(r"[A-Za-z0-9._-]+\Z")


def _day_start(date_str: str) -> int:
    dt = datetime.strptime(date_str, "%Y-%m-%d").replace(tzinfo=timezone.utc)
    return int(dt.timestamp())


class HoardEngine:
    def __init__(
        self,
        spark: SparkSession,
        warehouse_dir: str,
        metric_buckets: int | None = None,
        fetch_driver_max_files: int = 32,
        propagate_touched_cap: int = 100_000,
    ):
        """``metric_buckets``: opt-in hash-bucketed layout for very-high-
        cardinality metric spaces. With N buckets the partition scheme is
        ``(tier, mb, date)`` where ``mb = crc32(metric) % N`` and ``metric``
        is a plain data column — a million metrics become N directories
        instead of a million, while fetches still prune to one (tier, mb)
        branch and parquet min/max on the sorted ``metric`` column skips
        row groups within it. The layout choice is persisted with the
        warehouse (the stored value wins on reopen) because it is a
        physical property of the written data.

        ``propagate_touched_cap``: the rollup cascade scopes its recompute
        to the exact (metric, date) pairs a batch touched, which needs one
        driver-side ``distinct().collect()``. For streaming micro-batches
        that list is tiny (metrics x days-per-batch), but a multi-year x
        100k-metric BACKFILL would pull millions of pairs through the
        driver — above this cap the engine skips the list entirely and
        recomputes each cascade tier over the batch's min/max bucket range
        as a scan predicate instead (value-equal; pinned by
        tests/test_propagate_scale.py). 0 disables the capped path.
        """
        self.spark = spark
        self.warehouse_dir = warehouse_dir
        # fetch() windows whose pruned partition list is at most this many
        # parquet files are read driver-side (no Spark job); 0 disables
        self.fetch_driver_max_files = fetch_driver_max_files
        self.propagate_touched_cap = propagate_touched_cap
        self.fs = WarehouseFS(spark)  # data plane: works on file://, HDFS, S3
        # Control plane (catalog/seq/layout JSON) is driver-local plain
        # I/O by design; normalize local file: URI forms to the OS path
        # so file:/wh and /wh name ONE control plane, not a literal
        # "file:" directory (ADVICE r7 URI-forms family).
        ctl_dir = strip_local_uri(warehouse_dir) or warehouse_dir
        self.catalog = Catalog(ctl_dir)
        self.points_path = os.path.join(warehouse_dir, "points")
        self.rollups_path = os.path.join(warehouse_dir, "rollups")
        self._seq_path = os.path.join(ctl_dir, "_hoard_seq.json")
        self._seq: dict[str, int] = {}
        if os.path.exists(self._seq_path):
            with open(self._seq_path) as f:
                self._seq = json.load(f)
        self._layout_path = os.path.join(ctl_dir, "_hoard_layout.json")
        if os.path.exists(self._layout_path):
            with open(self._layout_path) as f:
                stored = json.load(f).get("metric_buckets")
            self.metric_buckets = stored
        else:
            self.metric_buckets = metric_buckets
            with open(self._layout_path, "w") as f:
                json.dump({"metric_buckets": metric_buckets}, f)
        # (tier, metric) pairs with a materialized rollup — replaces the
        # per-metric directory probe, which the bucketed layout can't offer
        self._mat_path = os.path.join(ctl_dir, "_hoard_materialized.json")
        self._materialized: set[str] = set()
        if os.path.exists(self._mat_path):
            with open(self._mat_path) as f:
                self._materialized = set(json.load(f))
        self._lock_path = os.path.join(ctl_dir, "_hoard_writer.lock")
        self._lock_depth = 0
        self.ingestor = Ingestor(
            spark, self.catalog, self.points_path, self.metric_buckets
        )

    @contextmanager
    def _writer_lock(self):
        """Serialize mutating ops per warehouse (reference FIXME parity:
        'Check file lock?' at src/hoard.coffee:67, 183, 243 — the engine,
        like the reference, assumes a single writer; this makes the
        assumption enforced instead of silent).

        An exclusive, non-blocking ``flock`` on a control-plane lock file,
        held for the duration of one mutating operation: a second writer
        — another process, or another engine handle in this process —
        gets an immediate ``HoardError`` instead of interleaving catalog/
        seq writes. Advisory flock is released by the OS on process death,
        so no stale-lock recovery is needed. Reentrant within one engine
        handle (ingest -> propagate nests). Like the rest of the control
        plane this guards same-driver-host writers; a multi-driver
        deployment moves the control plane to a metastore (catalog.py).
        """
        if self._lock_depth:
            self._lock_depth += 1
            try:
                yield
            finally:
                self._lock_depth -= 1
            return
        fd = os.open(self._lock_path, os.O_CREAT | os.O_RDWR, 0o644)
        try:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except OSError:
                raise HoardError(
                    "warehouse is locked by another writer "
                    f"(lock file: {self._lock_path})"
                ) from None
            os.write(fd, f"{os.getpid()}\n".encode())
            self._lock_depth = 1
            try:
                yield
            finally:
                self._lock_depth = 0
                fcntl.flock(fd, fcntl.LOCK_UN)
        finally:
            os.close(fd)

    # ------------------------------------------------------- layout helpers
    @property
    def _part_cols(self) -> list[str]:
        if self.metric_buckets:
            return ["tier", "mb", "date"]
        return ["tier", "metric", "date"]

    def _mb_of(self, metric: str) -> int:
        return zlib.crc32(metric.encode("utf-8")) % self.metric_buckets

    def _metric_pred(self, metric: str):
        pred = F.col("metric") == metric
        if self.metric_buckets:
            pred = pred & (F.col("mb") == self._mb_of(metric))
        return pred

    def _metrics_pred(self, metrics: list[str]):
        pred = F.col("metric").isin(metrics)
        if self.metric_buckets:
            pred = pred & F.col("mb").isin(
                sorted({self._mb_of(m) for m in metrics})
            )
        return pred

    def _mark_materialized(self, tier: int, metrics: list[str]) -> None:
        keys = {f"{tier}:{m}" for m in metrics}
        if keys <= self._materialized:
            return
        self._materialized |= keys
        tmp = self._mat_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sorted(self._materialized), f)
        os.replace(tmp, self._mat_path)

    def _is_materialized(self, tier: int, metric: str) -> bool:
        if f"{tier}:{metric}" in self._materialized:
            return True
        # legacy unbucketed warehouses predate the marker file
        if not self.metric_buckets:
            return self.fs.isdir(
                os.path.join(self.rollups_path, f"tier={tier}", f"metric={metric}")
            )
        return False

    # ------------------------------------------------------------------ DDL
    def create(
        self,
        metric: str,
        archives: list[tuple[int, int]],
        x_files_factor: float = 0.5,
        now: int | None = None,
    ) -> MetricInfo:
        """Reference create() (O1, src/hoard.coffee:30-69)."""
        with self._writer_lock():
            return self.catalog.create(metric, archives, x_files_factor, now)

    def create_many(
        self,
        entries: list[tuple[str, list[tuple[int, int]], float]],
        now: int | None = None,
    ) -> list[MetricInfo]:
        """Bulk create with ONE catalog write (see Catalog.create_many —
        per-metric create() from a bulk registration is O(metrics²)
        driver bytes; the Whisper-tree migration is the canonical
        caller)."""
        with self._writer_lock():
            return self.catalog.create_many(entries, now)

    def info(self, metric: str) -> MetricInfo:
        """Reference info() (O2, src/hoard.coffee:392-424)."""
        return self.catalog.info(metric)

    # -------------------------------------------------------------- ingest
    def _next_seq(self, metric: str, n: int) -> int:
        start = self._seq.get(metric, 0)
        self._seq[metric] = start + n
        tmp = self._seq_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._seq, f)
        os.replace(tmp, self._seq_path)
        return start

    def update(
        self, metric: str, value: float, ts: int, now: int | None = None
    ) -> None:
        """Single-point write (O3, src/hoard.coffee:181-239).

        Unlike the reference — whose single-update propagation is commented
        out (:227-238, a documented divergence from Python Whisper) — this
        engine propagates, per intended Whisper semantics (SURVEY.md §5.3).
        """
        now = int(now if now is not None else time.time())
        info = self.catalog.info(metric)
        validate_single(info, int(ts), now)
        self.update_many(metric, [(int(ts), float(value))], now=now)

    def update_many(
        self,
        metric: str,
        points: list[tuple[int, float]],
        now: int | None = None,
        propagate: bool = True,
    ) -> DataFrame:
        """Batch write (O4/O5, src/hoard.coffee:241-390).

        Within one call, points are applied in chronological order (the
        reference sorts each archive's batch back to chronological before
        committing, :242, :284), so the newest timestamp wins a bucket;
        across calls, the later call wins (slot overwrite). Both collapse to
        LWW on a ``seq`` assigned here in (ts, input-position) order.
        """
        now = int(now if now is not None else time.time())
        info = self.catalog.info(metric)
        if not points:
            return None
        ordered = sorted(
            range(len(points)), key=lambda i: (points[i][0], i)
        )  # stable chronological order
        base = self._next_seq(metric, len(points))
        df = self.ingestor.points_batch(
            metric, [points[i] for i in ordered], seq_start=base
        )
        prepared = self.ingest_df(metric, df, now=now, propagate=propagate)
        return prepared

    def ingest_df(
        self,
        metric: str,
        df: DataFrame,
        now: int | None = None,
        propagate: bool = True,
    ) -> DataFrame:
        """DataFrame ingest for one metric: columns (metric, ts, value, seq).

        The scalable entry point: validity filter + tier routing + aligned
        append, then incremental rollup scoped to the touched buckets.
        """
        now = int(now if now is not None else time.time())
        info = self.catalog.info(metric)
        # Same shape as the streaming micro-batch path (round 8): prepare
        # once, cache, run the rollup pass from memory (``pending``) so it
        # reads only pre-existing history from disk, then append.
        with self._writer_lock():
            prepared = self.ingestor.prepare(df, info, now).cache()
            self.catalog.touch(metric, now)
            if propagate and len(info.archives) > 1:
                self.propagate(metric, batch=prepared, pending=prepared)
            self.ingestor.write(prepared)
            prepared.unpersist()
        return prepared

    # ------------------------------------------------------------- reading
    def _read_schema(self, base: T.StructType) -> T.StructType:
        if not self.metric_buckets:
            return base
        return T.StructType(
            list(base.fields) + [T.StructField("mb", T.IntegerType())]
        )

    def _read_parquet_root(self, path: str, schema: T.StructType) -> DataFrame:
        """Read a warehouse root, treating ONLY path-not-found as empty.

        A not-yet-written root is a normal state (fresh warehouse); any
        other analysis failure — corrupted footers, a conflicting schema —
        must raise, not silently read as "no data" (a corrupted warehouse
        answering every fetch with gaps is a wrong answer, not an empty
        one).
        """
        from pyspark.errors import AnalysisException

        if not self.fs.isdir(path):
            return self.spark.createDataFrame([], schema)
        try:
            return self.spark.read.schema(schema).parquet(path)
        except AnalysisException as e:
            if "PATH_NOT_FOUND" in str(getattr(e, "errorClass", "") or str(e)):
                return self.spark.createDataFrame([], schema)
            raise

    def _read_points(self) -> DataFrame:
        return self._read_parquet_root(
            self.points_path, self._read_schema(_POINTS_READ_SCHEMA)
        )

    def _read_rollups(self) -> DataFrame:
        return self._read_parquet_root(
            self.rollups_path, self._read_schema(_ROLLUP_READ_SCHEMA)
        )

    @staticmethod
    def _date_pred(ts_range: tuple[int, int] | None):
        """Partition-pruning predicate on the physical ``date`` column.

        ``bucket_ts`` is a plain data column — a range filter on it reaches
        parquet row groups but can NOT prune ``date=`` directories. Every
        time-bounded read must carry this explicit date predicate, or a
        1-hour fetch over a 3-year metric lists and scans ~1100 partitions
        (verified: the fix turns those scans into 1-2 partition reads).
        """
        if ts_range is None:
            return None
        lo_s, hi_s = ts_range
        lo_d = datetime.fromtimestamp(int(lo_s), tz=timezone.utc).date()
        hi_d = datetime.fromtimestamp(int(hi_s), tz=timezone.utc).date()
        return (F.col("date") >= F.lit(lo_d)) & (F.col("date") <= F.lit(hi_d))

    def _direct_lww(
        self,
        metric: str,
        tier: int,
        ts_range: tuple[int, int] | None = None,
    ) -> DataFrame:
        pts = self._read_points().where(
            (F.col("tier") == tier) & self._metric_pred(metric)
        )
        dpred = self._date_pred(ts_range)
        if dpred is not None:
            pts = pts.where(dpred)
        return lww(pts).select("metric", "bucket_ts", "value")

    def tier_view(
        self,
        metric: str,
        tier: int,
        use_materialized: bool = True,
        ts_range: tuple[int, int] | None = None,
    ) -> DataFrame:
        """LWW-normalized view of one tier: (metric, bucket_ts, value).

        Tier 0 is the dedup view over raw appends; coarser tiers read the
        materialized rollup when present, else compute the cascade on the
        fly (correctness never depends on maintenance having run).

        ``ts_range`` (epoch-seconds, [lo, hi)) scopes every underlying scan
        to the touched ``date`` partitions; buckets are date-monotonic, so
        the cascade can pass the same bounds all the way down.
        """
        info = self.catalog.info(metric)
        if tier == 0:
            return self._direct_lww(metric, 0, ts_range)
        if use_materialized and self._is_materialized(tier, metric):
            view = self._read_rollups().where(
                (F.col("tier") == tier) & self._metric_pred(metric)
            )
            dpred = self._date_pred(ts_range)
            if dpred is not None:
                view = view.where(dpred)
            return view.select("metric", "bucket_ts", "value")
        higher = info.archives[tier - 1]
        lower = info.archives[tier]
        cascade_range = ts_range
        if cascade_range is not None:
            # widen the lower bound to the lower-tier bucket start so the
            # finer tier contributes every row of the first covered bucket
            lo_s, hi_s = cascade_range
            cascade_range = (align_ts(lo_s, lower.seconds_per_point), hi_s)
        rolled = rollup_tier(
            self.tier_view(metric, tier - 1, use_materialized, cascade_range),
            lower.seconds_per_point,
            higher.seconds_per_point,
            info.x_files_factor,
        )
        return merge_direct(
            rolled, self._direct_lww(metric, tier, cascade_range)
        ).select("metric", "bucket_ts", "value")

    # -------------------------------------------------------------- rollup
    def _direct_lww_many(
        self,
        metrics: list[str],
        tier: int,
        ts_range: tuple[int, int] | None = None,
        pending: DataFrame | None = None,
    ) -> DataFrame:
        """LWW view of one tier's direct points. ``pending`` is a
        ``Ingestor.prepare``d batch whose rows may not be on the points
        table yet — it is unioned in under the SAME predicates before the
        LWW collapse, so the rollup pass can consume the micro-batch from
        memory instead of re-reading the freshly appended small files
        (round 8). Safe whether or not those rows were already appended:
        a duplicate (metric, tier, bucket, seq) collapses in max_by."""
        cols = ["metric", "tier", "bucket_ts", "value", "seq"]
        pts = self._read_points().where(
            (F.col("tier") == tier) & self._metrics_pred(metrics)
        )
        dpred = self._date_pred(ts_range)
        if dpred is not None:
            pts = pts.where(dpred)
        pts = pts.select(*cols)
        if pending is not None:
            extra = pending.where(
                (F.col("tier") == tier) & self._metrics_pred(metrics)
            )
            if dpred is not None:
                extra = extra.where(dpred)
            pts = pts.unionByName(extra.select(*cols))
        return lww(pts).select("metric", "bucket_ts", "value")

    def _tier_view_many(
        self,
        metrics: list[str],
        tier: int,
        ts_range: tuple[int, int] | None = None,
        pending: DataFrame | None = None,
    ) -> DataFrame:
        """Multi-metric tier view: one scan for every materialized metric,
        per-metric cascade fallback only for the stragglers (steady-state
        streaming has none, so this stays a single pruned scan)."""
        if tier == 0:
            return self._direct_lww_many(metrics, 0, ts_range, pending)
        materialized = [
            m for m in metrics if self._is_materialized(tier, m)
        ]
        parts: list[DataFrame] = []
        if materialized:
            view = self._read_rollups().where(
                (F.col("tier") == tier) & self._metrics_pred(materialized)
            )
            dpred = self._date_pred(ts_range)
            if dpred is not None:
                view = view.where(dpred)
            parts.append(view.select("metric", "bucket_ts", "value"))
        for m in metrics:
            if m not in materialized:
                parts.append(self.tier_view(m, tier, ts_range=ts_range))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def propagate(
        self,
        metric: str,
        batch: DataFrame | None = None,
        pending: DataFrame | None = None,
    ) -> None:
        """Materialize the rollup cascade (O6, src/hoard.coffee:71-178)."""
        self.propagate_many([metric], batch=batch, pending=pending)

    def propagate_many(
        self,
        metrics: list[str],
        batch: DataFrame | None = None,
        pending: DataFrame | None = None,
        touched_by_tier: dict[int, set[tuple[str, str]]] | None = None,
        force_range: bool = False,
    ) -> None:
        """See ``_propagate_many_impl``; serialized by the writer lock."""
        with self._writer_lock():
            self._propagate_many_impl(
                metrics, batch, pending, touched_by_tier, force_range
            )

    def _propagate_many_impl(
        self,
        metrics: list[str],
        batch: DataFrame | None = None,
        pending: DataFrame | None = None,
        touched_by_tier: dict[int, set[tuple[str, str]]] | None = None,
        force_range: bool = False,
    ) -> None:
        """Materialize the rollup cascade for metrics SHARING one policy.

        With ``batch`` (a prepared ingest batch covering the metrics) the
        recompute is scoped to exactly the (metric, date) rollup partitions
        the batch touched — the generalized ``_.uniq`` propagate-target
        dedup (src/hoard.coffee:373-378) — and written with dynamic
        partition overwrite. Without it, a full rebuild.

        ``pending``: the same prepared batch when its rows are NOT yet
        (or not necessarily yet) appended to the points table — the tier
        views union it in before the LWW collapse, so the rollup pass
        reads only pre-existing history from disk and takes the
        micro-batch from memory. Duplicates (rows both on disk and in
        pending) collapse in LWW, so passing it is always safe.

        ``force_range``: the caller already knows the batch blows the
        touched-pair cap (streaming ingest collects the touched sets in
        its own fused job and sees the overflow first) — skip straight to
        the per-tier min/max span path instead of re-running the capped
        distinct-collect on exactly the huge batch the cap protects
        against (ADVICE r9).

        Scale contract: the whole call runs O(tiers) Spark jobs regardless
        of metric count — per tier, one distinct over the micro-batch, one
        multi-metric groupBy recompute, one partitioned write. Never a
        per-metric driver loop (that was the round-1 scale-killer: a
        100k-metric micro-batch cost O(metrics x tiers) jobs).
        """
        # the cascade/xff come from metrics[0]; a caller mixing policies
        # would get rollups computed with the wrong tier spans, silently
        # persisted — validate up front like fetch_many does
        info = self._require_shared_policy(metrics, "propagate_many")
        cascade = plan_cascade(info)
        if not cascade:
            return

        # ``touched_by_tier`` may arrive precomputed (streaming ingest
        # collects it in the same job that discovers the batch's metrics
        # and fills the pending cache — no second distinct pass here).
        range_by_tier: dict[int, tuple[int, int]] | None = None
        if touched_by_tier is None and batch is not None:
            batch = batch.select("metric", "tier", "bucket_ts")
            over_cap = force_range
            rows: list = []
            if not over_cap:
                # (metric, date) pairs affected per cascade tier: rows
                # routed to finer tiers cascade down; rows routed directly
                # to a tier land as-is; coarser rows don't touch it. ONE
                # fused distinct job computes the touched sets for ALL
                # cascade steps (round 8 — was one distinct job per tier):
                # the per-tier frames are unioned with a tier tag, so the
                # whole scoping pass costs a single batch-sized shuffle
                # regardless of cascade depth.
                frames = []
                for tier_k, _, lower_spp in cascade:
                    frames.append(
                        batch.where(F.col("tier") <= tier_k).select(
                            F.lit(tier_k).alias("tk"),
                            "metric",
                            bucket_date_col(
                                F.col("bucket_ts")
                                - F.pmod(
                                    F.col("bucket_ts"), F.lit(lower_spp)
                                )
                            ).alias("d"),
                        )
                    )
                un = frames[0]
                for f in frames[1:]:
                    un = un.unionByName(f)
                cap = self.propagate_touched_cap
                rows = (
                    un.distinct().limit(cap + 1).collect()
                    if cap > 0
                    else un.distinct().collect()
                )
                over_cap = cap > 0 and len(rows) > cap
            if over_cap:
                # Backfill-scale batch: the touched list would flood the
                # driver. Fall back to per-tier min/max bucket spans (one
                # #tiers-row agg job) and recompute each cascade tier over
                # that date range as a predicate — a superset of the
                # touched scope, so value-equal by construction.
                spans = {
                    r["tier"]: (r["lo"], r["hi"])
                    for r in batch.groupBy("tier")
                    .agg(
                        F.min("bucket_ts").alias("lo"),
                        F.max("bucket_ts").alias("hi"),
                    )
                    .collect()
                }
                range_by_tier = {}
                for tier_k, _, _lspp in cascade:
                    los = [lo for t, (lo, _) in spans.items() if t <= tier_k]
                    his = [hi for t, (_, hi) in spans.items() if t <= tier_k]
                    if los:
                        range_by_tier[tier_k] = (min(los), max(his))
                # only metrics the batch actually carries get the
                # materialized flag (bounded by the metric universe — the
                # caller's ``metrics`` list is already that size; it is
                # the metrics x days product the cap avoids): a passed-
                # but-absent metric was recomputed only within the range,
                # so flagging its rollup complete would be wrong.
                batch_metrics = sorted(
                    r["metric"]
                    for r in batch.select("metric").distinct().collect()
                )
            else:
                touched_by_tier = {}
                for r in rows:
                    touched_by_tier.setdefault(r["tk"], set()).add(
                        (r["metric"], str(r["d"]))
                    )

        for tier_k, higher_spp, lower_spp in cascade:
            touched_pairs: list[tuple[str, str]] | None = None
            ts_range: tuple[int, int] | None = None
            if touched_by_tier is not None:
                touched_pairs = sorted(touched_by_tier.get(tier_k, set()))
                if not touched_pairs:
                    continue
                dates = sorted({d for _, d in touched_pairs})
                lo = _day_start(dates[0])
                hi = _day_start(dates[-1]) + 86400 + lower_spp
                ts_range = (align_ts(lo, lower_spp), hi)
            elif range_by_tier is not None:
                span = range_by_tier.get(tier_k)
                if span is None:
                    continue
                # same day-aligned window the touched path derives from its
                # date list: every (metric, date) partition the write will
                # replace is recomputed over its FULL day, and the range is
                # aligned down to a lower-bucket boundary so the first
                # covered bucket sees all its higher-tier rows.
                lo_b, hi_b = align_ts(span[0], lower_spp), align_ts(
                    span[1], lower_spp
                )
                lo = lo_b - (lo_b % 86400)
                hi = hi_b - (hi_b % 86400) + 86400 + lower_spp
                ts_range = (align_ts(lo, lower_spp), hi)

            # ts_range prunes the scans to the touched date partitions (a
            # one-day micro-batch must not list 3 years of directories)
            higher_view = self._tier_view_many(
                metrics, tier_k - 1, ts_range, pending=pending
            )
            if ts_range is not None:
                higher_view = higher_view.where(
                    (F.col("bucket_ts") >= ts_range[0])
                    & (F.col("bucket_ts") < ts_range[1])
                )

            rolled = rollup_tier(
                higher_view, lower_spp, higher_spp, info.x_files_factor
            )
            merged = merge_direct(
                rolled,
                self._direct_lww_many(
                    metrics, tier_k, ts_range, pending=pending
                ),
            )
            out = (
                merged.withColumn("tier", F.lit(tier_k))
                .withColumn("date", bucket_date_col(F.col("bucket_ts")))
            )
            if touched_pairs is not None:
                pairs_df = self.spark.createDataFrame(
                    [
                        (m, datetime.strptime(d, "%Y-%m-%d").date())
                        for m, d in touched_pairs
                    ],
                    T.StructType(
                        [
                            T.StructField("metric", T.StringType()),
                            T.StructField("date", T.DateType()),
                        ]
                    ),
                )
                out = out.join(
                    F.broadcast(pairs_df), ["metric", "date"], "left_semi"
                )
            out = out.select(
                "bucket_ts", "value", "known", "tier", "metric", "date"
            )
            if self.metric_buckets:
                out = out.withColumn(
                    "mb",
                    F.pmod(
                        F.crc32(F.col("metric").cast("binary")),
                        F.lit(self.metric_buckets),
                    ).cast("int"),
                )
                # An (mb, date) partition holds MANY metrics; dynamic
                # overwrite replaces whole partitions, so rows of metrics
                # NOT being recomputed must ride along unchanged.
                cols = ["bucket_ts", "value", "known", "tier", "metric",
                        "date", "mb"]
                existing = self._read_rollups().where(F.col("tier") == tier_k)
                if touched_pairs is not None:
                    # Tuple-equality joins, NOT string-concat keys: a metric
                    # name containing the separator (e.g. 'a|2026-01-01')
                    # must never collide with another (metric, date) pair
                    # and silently drop a co-bucketed metric's rows.
                    mb_dates = self.spark.createDataFrame(
                        sorted(
                            {
                                (
                                    self._mb_of(m),
                                    datetime.strptime(d, "%Y-%m-%d").date(),
                                )
                                for m, d in touched_pairs
                            }
                        ),
                        T.StructType(
                            [
                                T.StructField("mb", T.IntegerType()),
                                T.StructField("date", T.DateType()),
                            ]
                        ),
                    )
                    keep = existing.join(
                        F.broadcast(mb_dates), ["mb", "date"], "left_semi"
                    ).join(
                        F.broadcast(pairs_df), ["metric", "date"], "left_anti"
                    )
                else:
                    overwritten = out.select("mb", "date").distinct()
                    keep = (
                        existing.where(~F.col("metric").isin(metrics))
                        .join(F.broadcast(overwritten), ["mb", "date"],
                              "left_semi")
                    )
                out = out.unionByName(keep.select(*cols))
            (
                # cluster rows by output partition (one file per replaced
                # (tier, mb|metric, date) dir instead of one per write
                # task — the rollup dirs are fetch-short-circuit read
                # targets; the shuffled frame is partition-scoped and
                # rollup-sized, so the extra exchange is cheap even per
                # micro-batch), then by metric within each file so parquet
                # min/max statistics on `metric` skip row groups at read.
                # Explicit partition count: a columns-only repartition is
                # an AQE coalesce target and a small batch collapses the
                # write to one task; with the count pinned each dir still
                # hashes to exactly one task (one file per dir) while
                # distinct dirs write in parallel.
                out.repartition(
                    self.spark.sparkContext.defaultParallelism,
                    *self._part_cols,
                )
                .sortWithinPartitions(
                    *self._part_cols,
                    *[c for c in ("metric", "bucket_ts")
                      if c not in self._part_cols],
                )
                .write.partitionBy(*self._part_cols)
                # set dynamic overwrite ON THE WRITER: correctness must not
                # depend on spark.sql.sources.partitionOverwriteMode in the
                # session (a static-mode session would truncate every other
                # partition of the shared rollups root).
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .parquet(self.rollups_path)
            )
            self._mark_materialized(
                tier_k,
                sorted({m for m, _ in touched_pairs})
                if touched_pairs is not None
                else (batch_metrics if range_by_tier is not None else metrics),
            )

    # --------------------------------------------------------------- fetch
    def fetch(
        self, metric: str, from_ts: int, to_ts: int, now: int | None = None
    ) -> tuple[TimeInfo, list[float | None]]:
        """Range query (O7): ``(timeInfo, values)`` exactly as the reference.

        Small windows short-circuit the Spark job entirely (VERDICT r6
        item 6): a dashboard fetch whose pruned partition list is at most
        ``fetch_driver_max_files`` parquet files is read driver-side
        through the Hadoop FS API and LWW-merged in Python — identical
        values (property-pinned vs the Spark path), ~ms latency instead
        of the ~0.5 s per-job floor. Wide windows, unmaterialized coarse
        tiers, and escaped metric names fall through to the Spark plan.
        """
        now = int(now if now is not None else time.time())
        info = self.catalog.info(metric)
        archive, ti = plan_fetch(info, int(from_ts), int(to_ts), now)
        fast = self._fetch_fast_values(metric, archive.tier, ti)
        if fast is not None:
            return ti, fast
        view = self.tier_view(
            metric, archive.tier, ts_range=(ti.from_interval, ti.to_interval)
        )
        return ti, collect_values(fetch_df(view, ti), ti)

    def _fetch_fast_values(
        self, metric: str, tier: int, ti: TimeInfo
    ) -> list[float | None] | None:
        """Driver-side fetch over the pruned partition files, or None to
        fall back to the Spark plan. Reads the SAME physical table the
        Spark path would scan (tier-0 points with Python LWW max-by-seq,
        or the materialized rollup), so the result is identical by
        construction; an on-the-fly cascade (tier>0, not materialized)
        always falls back."""
        if self.fetch_driver_max_files <= 0:
            return None
        if tier > 0 and not self._is_materialized(tier, metric):
            return None
        if not _SAFE_PART_RE.match(metric):
            # Spark escapes special chars in partition-dir values; rather
            # than reimplement that encoding, route such names to Spark
            return None
        root = self.points_path if tier == 0 else self.rollups_path
        mid = (
            f"mb={self._mb_of(metric)}"
            if self.metric_buckets
            else f"metric={metric}"
        )
        # same date span as _date_pred: date(from_interval)..date(to_interval)
        lo_d = datetime.fromtimestamp(ti.from_interval, tz=timezone.utc).date()
        hi_d = datetime.fromtimestamp(ti.to_interval, tz=timezone.utc).date()
        # budget the dir LISTINGS as well as the files: each date dir is
        # one filesystem round trip (an RPC on S3/HDFS), so a years-wide
        # window over a sparse metric must not walk ~1100 dirs just to
        # discover it should fall back — even though its few files might
        # technically fit the file budget, Spark's listing is parallel
        # and the driver's is not
        if (hi_d - lo_d).days + 1 > max(2 * self.fetch_driver_max_files, 8):
            return None
        dates = []
        d = lo_d
        while d <= hi_d:
            dates.append(d.isoformat())
            d += timedelta(days=1)
        # ONE listing round-trip for the whole window on remote stores
        # (globStatus date alternation); per-present-date scandir locally.
        files = self.fs.list_date_files(f"{root}/tier={tier}/{mid}", dates)
        if len(files) > self.fetch_driver_max_files:
            return None
        if not files:
            # No files resolved. Either the window is genuinely empty (a
            # cheap pruned Spark scan confirms) or a listing misresolution
            # (URI-form path, permission/transient FS error masked as
            # "not found") would otherwise become a SILENT all-None
            # answer for data that exists. Fall back to the Spark plan —
            # it is the ground truth either way.
            return None

        import io

        import pyarrow.parquet as pq

        # tier 0: LWW merge (max seq wins per bucket); tier>0: rollup rows
        # are unique per bucket already
        best: dict[int, tuple[int, float | None]] = {}
        for fpath in files:
            pf = pq.ParquetFile(io.BytesIO(self.fs.read_bytes(fpath)))
            phys = {c.name for c in pf.schema_arrow}
            want = [c for c in ("metric", "bucket_ts", "value", "seq")
                    if c in phys]
            tbl = pf.read(columns=want)
            bt = tbl["bucket_ts"].to_pylist()
            vv = tbl["value"].to_pylist()
            mm = tbl["metric"].to_pylist() if "metric" in phys else None
            sq = tbl["seq"].to_pylist() if tier == 0 else None
            for i, b in enumerate(bt):
                if mm is not None and mm[i] != metric:
                    continue
                if not (ti.from_interval <= b < ti.to_interval):
                    continue
                s = sq[i] if sq is not None else 0
                if b not in best or s > best[b][0]:
                    best[b] = (s, vv[i])
        n = max(0, (ti.to_interval - ti.from_interval) // ti.step)
        values: list[float | None] = [None] * n
        for b, (_, v) in best.items():
            values[(b - ti.from_interval) // ti.step] = v
        return values

    def fetch_dataframe(
        self, metric: str, from_ts: int, to_ts: int, now: int | None = None
    ) -> tuple[TimeInfo, DataFrame]:
        """Distributed fetch: the gap-filled result as an unactioned plan."""
        now = int(now if now is not None else time.time())
        info = self.catalog.info(metric)
        archive, ti = plan_fetch(info, int(from_ts), int(to_ts), now)
        # scope the scan to the fetch window's date partitions — a 1-hour
        # fetch over a 3-year metric must read 1-2 partitions, not ~1100
        view = self.tier_view(
            metric, archive.tier, ts_range=(ti.from_interval, ti.to_interval)
        )
        return ti, fetch_df(view, ti)

    def fetch_many(
        self,
        metrics: list[str],
        from_ts: int,
        to_ts: int,
        now: int | None = None,
    ) -> tuple[TimeInfo, dict[str, list[float | None]]]:
        """Scalar dashboard fetch: ``(timeInfo, {metric: values})``.

        Small windows answer driver-side per series (the fetch()
        short-circuit; ~ms per series, a 20-series dashboard stays well
        under one Spark job's floor — co-bucketed series re-read shared
        files, acceptable at these sizes). If ANY series exceeds the
        file budget or needs an on-the-fly cascade, the whole request
        falls back to fetch_many_dataframe's single pruned scan.
        """
        now = int(now if now is not None else time.time())
        info = self._require_shared_policy(metrics, "fetch_many")
        archive, ti = plan_fetch(info, int(from_ts), int(to_ts), now)
        fast: dict[str, list[float | None]] | None = {}
        for m in metrics:
            v = self._fetch_fast_values(m, archive.tier, ti)
            if v is None:
                fast = None
                break
            fast[m] = v
        if fast is not None:
            return ti, fast
        ti, df = self.fetch_many_dataframe(metrics, from_ts, to_ts, now)
        n = max(0, (ti.to_interval - ti.from_interval) // ti.step)
        out: dict[str, list[float | None]] = {m: [None] * n for m in metrics}
        for row in df.collect():
            idx = (row["bucket_ts"] - ti.from_interval) // ti.step
            if 0 <= idx < n:
                out[row["metric"]][idx] = row["value"]
        return ti, out

    def fetch_many_dataframe(
        self,
        metrics: list[str],
        from_ts: int,
        to_ts: int,
        now: int | None = None,
    ) -> tuple[TimeInfo, DataFrame]:
        """Multi-series fetch: (metric, bucket_ts, value), gap-filled, ONE
        pruned scan for all metrics sharing a policy (the dashboard shape —
        N series must not cost N driver round-trips).

        All metrics must share the policy signature so a single tier
        answers; the per-metric spine is the bucket sequence crossed with
        the (broadcast-small) metric list.
        """
        now = int(now if now is not None else time.time())
        info = self._require_shared_policy(metrics, "fetch_many")
        archive, ti = plan_fetch(info, int(from_ts), int(to_ts), now)
        view = self._tier_view_many_at(
            metrics, archive.tier, (ti.from_interval, ti.to_interval)
        )
        sp = spine(self.spark, ti.from_interval, ti.to_interval, ti.step)
        mdf = self.spark.createDataFrame([(m,) for m in metrics], "metric string")
        grid = sp.crossJoin(F.broadcast(mdf))
        data = view.where(
            (F.col("bucket_ts") >= ti.from_interval)
            & (F.col("bucket_ts") < ti.to_interval)
        )
        out = (
            grid.join(F.broadcast(data), ["metric", "bucket_ts"], "left")
            .orderBy("metric", "bucket_ts")
            .select("metric", "bucket_ts", "value")
        )
        return ti, out

    def _require_shared_policy(
        self, metrics: list[str], op: str
    ) -> MetricInfo:
        """Verify every metric shares one policy signature; return its info."""
        if not metrics:
            raise HoardError(f"{op} requires at least one metric")
        sig = None
        first = None
        for m in metrics:
            info = self.catalog.info(m)
            s = tuple(
                (a.seconds_per_point, a.points) for a in info.archives
            ) + (info.x_files_factor,)
            if sig is None:
                sig, first = s, info
            elif s != sig:
                raise HoardError(
                    f"{op} requires metrics sharing one retention policy; "
                    f"{metrics[0]!r} and {m!r} differ"
                )
        return first

    def _tier_view_many_at(
        self, metrics: list[str], tier: int, ts_range: tuple[int, int]
    ) -> DataFrame:
        """Like _tier_view_many but with uniform fetch semantics: verify the
        metrics share one policy signature first."""
        self._require_shared_policy(metrics, "fetch_many")
        return self._tier_view_many(metrics, tier, ts_range)

    # ---------------------------------------------------------------- SQL
    def register_sql_views(self, prefix: str = "hoard") -> None:
        """Expose the warehouse to Spark SQL (new surface — the reference
        has no query language, SURVEY.md §2B):

        - ``<prefix>_points``   raw appends (pre-LWW, every write visible)
        - ``<prefix>_series``   LWW-normalized per (metric, tier, bucket)
        - ``<prefix>_rollups``  materialized downsamples
        - ``<prefix>_catalog``  one row per metric policy

        All are lazy views over the partitioned parquet roots, so SQL
        predicates on tier/metric/date prune partitions exactly like the
        DataFrame paths.
        """
        self._read_points().createOrReplaceTempView(f"{prefix}_points")
        lww(self._read_points()).select(
            "metric", "tier", "bucket_ts", "value"
        ).createOrReplaceTempView(f"{prefix}_series")
        self._read_rollups().createOrReplaceTempView(f"{prefix}_rollups")
        policies = [
            (
                m.metric,
                m.x_files_factor,
                m.max_retention,
                [(a.tier, a.seconds_per_point, a.points) for a in m.archives],
            )
            for m in self.catalog._metrics.values()
        ]
        self.spark.createDataFrame(
            policies,
            "metric string, x_files_factor double, max_retention long, "
            "archives array<struct<tier:int,seconds_per_point:int,points:int>>",
        ).createOrReplaceTempView(f"{prefix}_catalog")

    def sql(self, query: str) -> DataFrame:
        """Run Spark SQL against the registered warehouse views."""
        self.register_sql_views()
        return self.spark.sql(query)

    # --------------------------------------------------------- maintenance
    def partition_file_counts(
        self, metric: str, tier: int = 0
    ) -> dict[str, int]:
        """Parquet file count per date partition of one metric's points —
        the compaction cadence signal: a dir above
        ``fetch_driver_max_files`` pushes small fetches off the driver
        short-circuit and onto a full Spark job, so "any dir > budget"
        means it is time for ``compact(metric)`` (which rewrites each
        partition to exactly one file). One listStatus per date dir,
        scoped to the metric's (tier, metric|mb) branch."""
        sub = (
            f"mb={self._mb_of(metric)}"
            if self.metric_buckets
            else f"metric={metric}"
        )
        root = f"{self.points_path}/tier={tier}/{sub}"
        out: dict[str, int] = {}
        for d in self.fs.listdir(root):
            if not d.startswith("date="):
                continue
            out[d[len("date="):]] = sum(
                1
                for f in self.fs.listdir(f"{root}/{d}")
                if f.endswith(".parquet")
            )
        return out

    def compact(self, metric: str | None = None) -> None:
        """Fold LWW physically: rewrite each tier's points with one row per
        bucket (keeps max seq so later appends still win correctly).

        The Spark analog of the ring buffer's implicit in-place dedup; run
        periodically so read-side dedup cost stays bounded.
        """
        with self._writer_lock():
            self._compact_impl(metric)

    def _compact_impl(self, metric: str | None = None) -> None:
        pts = self._read_points()
        if metric is not None:
            if self.metric_buckets:
                # bucketed layout: the swap granularity is the hash bucket,
                # so compact every metric sharing this metric's bucket
                pts = pts.where(F.col("mb") == self._mb_of(metric))
            else:
                pts = pts.where(F.col("metric") == metric)
        folded = (
            pts.groupBy("metric", "tier", "bucket_ts")
            .agg(
                F.max_by("value", "seq").alias("value"),
                F.max("seq").alias("seq"),
                F.max("ts").alias("ts"),
            )
            .withColumn("date", bucket_date_col(F.col("bucket_ts")))
            .select("bucket_ts", "value", "seq", "ts", "tier", "metric", "date")
        )
        if self.metric_buckets:
            folded = folded.withColumn(
                "mb",
                F.pmod(
                    F.crc32(F.col("metric").cast("binary")),
                    F.lit(self.metric_buckets),
                ).cast("int"),
            )
        tmp = self.points_path + "_compacting"
        (
            # cluster rows by their output partition first: after the LWW
            # groupBy the rows of one (tier, metric, date) are scattered
            # across tasks, and a direct write would leave up to
            # shuffle.partitions files per partition dir — defeating the
            # point of compaction (bounded read-side file counts, and the
            # fetch short-circuit's file budget). One extra shuffle buys
            # exactly ONE file per partition dir.
            folded.repartition(*self._part_cols)
            .sortWithinPartitions("metric", "bucket_ts")
            .write.partitionBy(*self._part_cols)
            .mode("overwrite")
            .parquet(tmp)
        )
        if metric is None:
            self.fs.rename(tmp, self.points_path)
        else:
            # swap only the rewritten partitions
            sub = (
                f"mb={self._mb_of(metric)}"
                if self.metric_buckets
                else f"metric={metric}"
            )
            for tier_dir in self.fs.listdir(tmp):
                if not tier_dir.startswith("tier="):
                    continue
                src = os.path.join(tmp, tier_dir, sub)
                dst = os.path.join(self.points_path, tier_dir, sub)
                if self.fs.isdir(src):
                    self.fs.rename(src, dst)
            self.fs.rmtree(tmp)

    def drop(self, metric: str) -> None:
        """Remove a metric end-to-end: point/rollup data, catalog entry,
        seq state, materialized markers. Lifecycle admin the reference
        delegates to the filesystem (delete the .hoard file); here it
        must also be partition-layout-aware.

        Unbucketed layout: O(tiers) directory deletes, no data rewrite —
        the (tier, metric, date) scheme makes a metric a directory
        family, so drop runs at metadata speed at any data size.
        Bucketed layout: the swap granularity is the hash bucket, so the
        metric's bucket is rewritten without its rows and swapped in
        (the same ride-along-partition shape as compact(metric)); a
        bucket left empty is deleted outright.
        """
        with self._writer_lock():
            self._drop_impl(metric)

    def _drop_impl(self, metric: str) -> None:
        self.catalog.info(metric)  # raises HoardError on unknown metric
        if not self.metric_buckets:
            for root in (self.points_path, self.rollups_path):
                if not self.fs.isdir(root):
                    continue
                for tier_dir in self.fs.listdir(root):
                    if not tier_dir.startswith("tier="):
                        continue
                    p = os.path.join(root, tier_dir, f"metric={metric}")
                    if self.fs.isdir(p):
                        self.fs.rmtree(p)
        else:
            mb = self._mb_of(metric)
            for root, reader in (
                (self.points_path, self._read_points),
                (self.rollups_path, self._read_rollups),
            ):
                if not self.fs.isdir(root):
                    continue
                keep = reader().where(
                    (F.col("mb") == mb) & (F.col("metric") != metric)
                )
                tmp = root + "_dropping"
                (
                    keep.sortWithinPartitions("metric", "bucket_ts")
                    .write.partitionBy(*self._part_cols)
                    .mode("overwrite")
                    .parquet(tmp)
                )
                sub = f"mb={mb}"
                for tier_dir in self.fs.listdir(root):
                    if not tier_dir.startswith("tier="):
                        continue
                    dst = os.path.join(root, tier_dir, sub)
                    src = os.path.join(tmp, tier_dir, sub)
                    if self.fs.isdir(src):
                        self.fs.rename(src, dst)
                    elif self.fs.isdir(dst):
                        # the bucket held only this metric
                        self.fs.rmtree(dst)
                if self.fs.isdir(tmp):
                    self.fs.rmtree(tmp)
        self.catalog.drop(metric)
        if metric in self._seq:
            del self._seq[metric]
            tmp = self._seq_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(self._seq, f)
            os.replace(tmp, self._seq_path)
        stale = {
            k for k in self._materialized if k.split(":", 1)[1] == metric
        }
        if stale:
            self._materialized -= stale
            mtmp = self._mat_path + ".tmp"
            with open(mtmp, "w") as f:
                json.dump(sorted(self._materialized), f)
            os.replace(mtmp, self._mat_path)

    def drop_expired(self, metric: str, now: int | None = None) -> list[str]:
        """Retention enforcement: delete (tier, metric, date) partitions whose
        whole day lies past the tier's retention — the ring buffer's eviction
        (src/hoard.coffee:217-222) as a partition drop, no data rewrite.
        """
        with self._writer_lock():
            return self._drop_expired_impl(metric, now)

    def _drop_expired_impl(
        self, metric: str, now: int | None = None
    ) -> list[str]:
        now = int(now if now is not None else time.time())
        info = self.catalog.info(metric)
        dropped: list[str] = []
        for root in (self.points_path, self.rollups_path):
            if not self.fs.isdir(root):
                continue
            for a in info.archives:
                if self.metric_buckets:
                    # bucketed layout: an (mb, date) dir holds many metrics,
                    # so a dir is only safely dead once the day is past the
                    # LONGEST retention any catalog metric has at this tier;
                    # read-side retention filtering covers the remainder.
                    cutoff = now - max(
                        mi.archives[a.tier].retention
                        for mi in self.catalog._metrics.values()
                        if len(mi.archives) > a.tier
                    )
                    tier_dirs = [
                        os.path.join(root, f"tier={a.tier}", mb_dir)
                        for mb_dir in self.fs.listdir(
                            os.path.join(root, f"tier={a.tier}")
                        )
                        if mb_dir.startswith("mb=")
                    ]
                else:
                    cutoff = now - a.retention
                    tier_dirs = [
                        os.path.join(root, f"tier={a.tier}", f"metric={metric}")
                    ]
                for tier_dir in tier_dirs:
                    for d in self.fs.listdir(tier_dir):
                        if not d.startswith("date="):
                            continue
                        day_end = _day_start(d.split("=", 1)[1]) + 86400
                        if day_end <= cutoff:
                            self.fs.rmtree(os.path.join(tier_dir, d))
                            dropped.append(os.path.join(tier_dir, d))
        return dropped
