"""Declared conformance queries (SURVEY.md §2C).

Each query exists twice, by design:

- a **Spark builder** ``(spark, sf_dir) -> DataFrame`` written with the
  DataFrame API (declarative, so Catalyst gets pushdown / pruning / join
  planning for free), and
- an **oracle**: the equivalent ANSI SQL that DuckDB runs over the same
  parquet files. The driver hash-compares the two result sets at sf=0.01.

Determinism rules (SURVEY.md §2C): total ORDER BY everywhere; floating
aggregates ROUND(x, 4); large SUMs accumulate in DECIMAL(38,6) then cast to
double (parallel double summation order differs between engines by more
than 1e-4 at sf>=0.01 — exact decimal accumulation removes the drift);
integer SUMs cast to BIGINT in the oracle (DuckDB widens to HUGEINT);
top-k ties broken by a unique key; identical aliases on both sides.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@dataclass(frozen=True)
class Query:
    name: str
    description: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => engine-only (weaker rows-only check)
    survey_ref: str
    # Scale-path twin: same answer as ``oracle`` but via a candidate
    # (shared-shingle inverted-index) join instead of the quadratic
    # all-pairs — still EXACT (a qualifying pair shares >= 1 gram; no
    # reliance on the engine's prefix-filter theorem) yet runs in
    # seconds at sf0.1 where the brute-force twin hits the bench's 120 s
    # interrupt. The driver gate keeps ``oracle`` (maximal independence
    # at sf0.01); bench.py and the sf0.1 value check prefer this when
    # set (VERDICT r8 item 10).
    oracle_scale: str | None = None


REGISTRY: dict[str, Query] = {}

# Cache registry moved to hoard_spark.cache so library operators
# (simjoin etc.) can persist multi-consumer subtrees without importing
# the query registry; re-exported here for the existing import sites.
from hoard_spark.cache import (  # noqa: E402,F401
    release_caches,
    track_cache,
    track_checkpoint,
)


def query(
    name: str,
    description: str,
    oracle: str | None,
    survey_ref: str,
    oracle_scale: str | None = None,
):
    """Register a conformance query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(
            name, description, fn, oracle, survey_ref, oracle_scale
        )
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table.

    ``events.ts`` is physically TIMESTAMP(NANOS), which Spark 4.x refuses
    to read as a timestamp ([PARQUET_TYPE_ILLEGAL]). We read it as raw
    nanos (``spark.sql.legacy.parquet.nanosAsLong``) and convert with
    exact integer arithmetic — ``timestamp_micros(ts DIV 1000)`` — rather
    than a double division, which would lose precision at 1.7e18 ns.

    MEMOIZED per (SparkContext, corpus dir, table, file stamp):
    ``spark.read.parquet`` pays driver-side file listing + parquet
    footer/schema resolution on EVERY call (~80 ms here), and the
    conformance suite issues a few hundred of them — ~15 s of the
    suite's wall was this one fixed cost, invisible in any executor
    metric. DataFrames are immutable and lazy, so handing every caller
    the same object is value-safe; the (mtime, size) stamp in the key
    keeps a REGENERATED corpus at the same path from serving a stale
    file listing (the listing is frozen inside the plan's file index),
    matching the artifact layer's fingerprint discipline. Non-local
    (URI) corpora bypass the memo — a remote stat per call would just
    move the cost around.
    """
    if name == "events":
        # Conf-set OUTSIDE the memoized path: a memo hit must not skip
        # re-pinning the session conf another caller may have reset
        # (ADVICE r11 #4) — the conf is read at SCAN time, not at
        # plan-construction time.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    key = None
    if "://" not in sf_dir:
        path = os.path.join(os.path.abspath(sf_dir), f"{name}.parquet")
        stamp = _dir_stamp(path)
        if stamp is not None:
            key = (spark.sparkContext.applicationId, path, stamp)
            hit = _LOAD_MEMO.get(key)
            if hit is not None:
                _LOAD_MEMO[key] = _LOAD_MEMO.pop(key)  # refresh LRU slot
                return hit
    df = _load_uncached(spark, sf_dir, name)
    if key is not None:
        # evict oldest-first BEFORE exceeding the cap: >= keeps the memo
        # at exactly 256 entries after insertion (ADVICE r12 #5's
        # off-by-one made it 257)
        while len(_LOAD_MEMO) >= 256:
            _LOAD_MEMO.pop(next(iter(_LOAD_MEMO)))
        _LOAD_MEMO[key] = df
    return df


def _dir_stamp(path: str):
    """RECURSIVE freshness stamp of a parquet file/dir: a regenerated
    partitioned corpus rewrites leaf files under subdirectories, which a
    top-level scandir would miss (ADVICE r11 #4). Stamp = sha256 of the
    full sorted (relative path, mtime, size) listing, walked depth-first
    — hashed rather than stored verbatim so a many-file corpus doesn't
    make every memo key arbitrarily large (ADVICE r12 #5)."""
    try:
        st = os.stat(path)
        if not os.path.isdir(path):
            return (st.st_mtime_ns, st.st_size)
        listing = []
        for root, dirs, files in os.walk(path):
            dirs.sort()
            for f in sorted(files):
                fp = os.path.join(root, f)
                fst = os.stat(fp)
                listing.append(
                    (os.path.relpath(fp, path), fst.st_mtime_ns,
                     fst.st_size)
                )
        return hashlib.sha256(repr(listing).encode()).hexdigest()
    except OSError:
        return None


_LOAD_MEMO: dict[tuple, DataFrame] = {}


def _load_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        dtype = dict(df.dtypes).get("ts")
        if dtype == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        elif dtype == "timestamp_ntz":
            # parquet timestamp[us] (no tz) reads as TIMESTAMP_NTZ, which
            # unix_micros() & friends reject at analysis. The session tz is
            # pinned UTC everywhere (session.py), so this cast is value-stable.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp views for the few queries expressed in Spark SQL text."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def present_sorted(df: DataFrame, *cols) -> DataFrame:
    """Terminal presentation sort for a BOUNDED conformance result.

    A terminal ``orderBy`` plans a range exchange whose partition-bound
    SAMPLING pass re-executes everything after the last materialized
    exchange — for verify-join / candidate-ranking / Arrow-UDF tails
    that re-executed suffix IS the expensive part of the query, and the
    rows being ordered are a few hundred to a few thousand (pairs over
    a threshold, per-probe top-1s, per-doc scores). Measured on q98 at
    sf0.1: 3.9 s with ``orderBy`` vs 1.6 s with this funnel — the range
    sort's sampling pass was re-running the whole candidate verify.

    Funneling to ONE partition and sorting within it executes the plan
    exactly once and still yields a total order. This is a small-result
    operator BY DECLARATION: callers whose output is table-sized (the
    per-line-item projections, the 100k-row window tables) keep the
    distributed ``orderBy`` — a global funnel of an unbounded result
    would serialize at 100 TB.

    Scope discipline (ADVICE r11 #2): "bounded" means the output does
    NOT grow with the corpus — group-by aggregates over a fixed domain,
    per-probe top-k (probe set is fixed), planted/thresholded pair sets
    (sparse by construction, ~0.5% of docs at every measured scale).
    Per-doc / per-chunk / per-cluster projections are O(corpus) and use
    :func:`ordered` instead; tests/test_plan_audit.py pins both lists.
    """
    return df.repartition(1).sortWithinPartitions(*cols)


def ordered(df: DataFrame, *cols) -> DataFrame:
    """Terminal DISTRIBUTED total order for a corpus-sized result.

    The scale-correct counterpart of :func:`present_sorted`: per-doc /
    per-chunk / per-cluster outputs grow with the corpus, so a single-
    partition funnel would serialize (and eventually OOM) the terminal
    sort at sf10+.

    Materialize-then-sort, not a bare ``orderBy``: the range exchange's
    partition-bound sampling pass executes the plan suffix once for the
    bounds and the main pass executes it AGAIN — for the tokenizing /
    scoring tails these projections carry, that is the whole query
    twice plus a full-width shuffle (measured on q41 at sf10: 41 s bare
    orderBy vs 14.5 s body-only). A tracked MEMORY_AND_DISK persist in
    between executes the tail once; both the sampling and the sort read
    the InMemoryRelation (14.7 s — within noise of the body). The
    persist is corpus-sized but spill-safe and fault-tolerant
    (recomputable on executor loss), the standard materialize-before-
    total-sort shape; callers that can live without a total order
    should simply not sort an O(corpus) result.

    Each call retires the PREVIOUS ordered() persist: the exported
    driver contract (``__spark_entry__.queries()``) has no release
    hook, so a driver session running all 17 range-sorted queries
    back-to-back would otherwise accumulate 17 corpus-sized caches
    that the CacheManager strong-holds (ADVICE r12 #2). By the time
    the next query builds, the previous one's terminal action has
    consumed its sort; at worst an earlier frame a caller kept around
    recomputes its tail on re-execution — a perf cost, never a
    correctness one. ``release_caches()`` remains the bulk hook for
    bench/tests.
    """
    from hoard_spark.cache import untrack_cache

    while _LIVE_ORDERED:
        untrack_cache(_LIVE_ORDERED.pop())
    out = track_cache(df)
    _LIVE_ORDERED.append(out)
    return out.orderBy(*cols)


_LIVE_ORDERED: list[DataFrame] = []


def spread(df: DataFrame) -> DataFrame:
    """Fan a narrow scan out across all cores before compute-heavy work.

    A small single-file parquet corpus reads as ONE partition, which
    would serialize the expensive stage that follows (shingle explosion,
    128-way MinHash, per-vector math) on a single core — measured 3.3 s
    -> 0.5 s for the q35 signature build at sf0.1. At production scale
    inputs arrive in many splits and this is a no-op; the guard keeps it
    from *reducing* parallelism or adding a shuffle when the scan is
    already wide.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def spread_by_stats(df: DataFrame) -> DataFrame:
    """``spread`` for JOB-FREE plan construction paths.

    ``spread`` asks the RDD for its partition count, which under AQE can
    fire jobs during plan construction — forbidden on surfaces pinned to
    zero-job construction (tests/test_ann.py). This variant estimates
    the scan's split count from the optimizer's size statistics (file
    size / maxPartitionBytes — available without touching execution)
    and repartitions only when the estimate is below the core count.
    Unknown/huge statistics (in-memory relations, joins) estimate many
    splits and correctly no-op: the hazard this guards is specifically
    the narrow SINGLE-FILE scan feeding a row-multiplying join."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        raw = spark.conf.get(
            "spark.sql.files.maxPartitionBytes", str(128 << 20)
        )
        try:
            max_pb = int(raw.rstrip("bB"))
        except ValueError:
            max_pb = 128 << 20
        if size // max(max_pb, 1) + 1 < target:
            return df.repartition(target)
    except Exception:  # noqa: BLE001 — stats probe must never break a plan
        pass
    return df


def dround(col: Column, n: int = 4) -> Column:
    """Boundary-stable ROUND for decimal-ish doubles.

    Much of the testdata is 2-4dp decimal, so derived products/averages
    hit TRUE midpoint ties at 4dp (e.g. 73372.9*0.95*1.07 = 74583.55285
    exactly). Spark rounds the double's shortest decimal representation
    (BigDecimal.valueOf) while DuckDB rounds the exact binary expansion —
    the two disagree on such ties. Routing through DECIMAL(25,10) first
    makes both engines recover the intended decimal value, then decimal
    ROUND (half-away-from-zero in both) is exact. Oracle twin:
    ``ROUND(CAST(x AS DECIMAL(25,10)), 4)``.
    """
    return F.round(col.cast("decimal(25,10)"), n).cast("double")


def dsum10(col: Column | str) -> Column:
    """Exact DECIMAL(25,10) accumulation, cast back to double — makes a
    double SUM independent of Spark's partial-aggregation order. Oracle
    twin: ``CAST(SUM(CAST(x AS DECIMAL(25,10))) AS DOUBLE)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(25,10)")).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum / count, boundary-stable
    round. Spark's parallel double AVG drifts ~1e-13 run-to-run with the
    merge order, which flips ROUND(x, 4) on midpoint values. Oracle twin:
    ``CAST(ROUND(CAST(CAST(SUM(CAST(x AS DECIMAL(25,10))) AS DOUBLE)
    / COUNT(*) AS DECIMAL(25,10)), 4) AS DOUBLE)``."""
    c = F.col(col) if isinstance(col, str) else col
    return dround(dsum10(c) / F.count(c))


def dsum(col: Column) -> Column:
    """Order-independent SUM for doubles: exact DECIMAL(38,6) accumulation,
    result cast back to double. Oracle twin:
    ``CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)``."""
    return F.sum(col.cast("decimal(38,6)")).cast("double")


def all_queries() -> dict[str, Query]:
    # import side-effect: populate REGISTRY
    import importlib

    for mod in ("timeseries", "relational", "llm", "multimodal"):
        try:
            importlib.import_module(f"hoard_spark.queries.{mod}")
        except ImportError:  # module not yet implemented this round
            pass
    return dict(REGISTRY)
