"""As-of (backward) join as a library operator over ANY DataFrames.

The conformance query q50 (hoard_spark/queries/relational.py) is the
fixed-shape twin over `events`; this module is the composable form —
the relationship ``pipeline.py`` has to q35/q51/q67 and ``ann.py`` has
to q38/q39.

The 100 TB shape (VERDICT r2): an as-of join expressed as a range join
is quadratic per key without interval indexing. Instead, tag reference
rows kind=0 and probe rows kind=1, union, and run ONE window per key
ordered by ``(order, kind)``: the latest reference row's carry columns —
packed into a single struct that is non-null for every reference row, so
NULL carry *values* propagate faithfully — flow forward to every later
probe row via ``last(struct, ignorenulls)`` over the unbounded-preceding
frame. One shuffle + one sort, **no join operator at all**. A probe and
reference row at the same order value match (ASOF's ``>=`` bound)
because kind sorts the reference row first.

Skew: one key's whole history sorts in one task under the single
window. ``skew_buckets > 0`` switches to the split plan: rows are
range-bucketed on ``order`` (boundaries from one ``approx_percentile``
job, inlined as literals), the same window runs per ``(keys, bucket)``
— so a hot key spreads over ``skew_buckets`` tasks — and a second,
boundary-sized window over the per-bucket last-reference table computes
each bucket's carry-in, joined back on ``(keys, bucket)``. Two extra
narrow stages over a keys×buckets-sized table buy per-key
parallelism; below the threshold the single window is strictly cheaper.
Measured on 32 cores (tools/stress_scale.json ``hot_key_windows``):
at 2M rows/key the split is roughly a wash (its fixed stages can lose
in an idle session, 3.1s → 4.6s); at 20M rows/key it wins 3.2× idle
(56.6s → 17.7s) and 16× under the stress harness's memory pressure
(103s → 6.4s — the single task starts spilling, which is exactly the
100 TB hot-key failure mode). Reach for it when a key's history is
tens of millions of rows or a task spills.

No reference analog (the reference is a single-metric time-series
store, src/hoard.coffee); this generalizes its "latest value at or
before t" read primitive (O7 fetch routes + reads one bucket's slot,
src/hoard.coffee:426-513) to arbitrary keyed event streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ASOF_ORDER = "asof_order"
_KIND = "_kind"
_CARRY = "_asof_carry"
_BUCKET = "_asof_bucket"
_ORD_FIELD = "__asof_ord"

# rows-per-key above which the split plan wins on 32 cores (measured
# crossover lives between 2M and 20M; see module docstring)
AUTO_SKEW_THRESHOLD = 5_000_000
AUTO_SKEW_BUCKETS = 32


def resolve_skew_buckets(
    df: DataFrame,
    keys: list[str],
    skew_buckets: int | str,
    threshold: int = AUTO_SKEW_THRESHOLD,
) -> int:
    """Turn ``skew_buckets="auto"`` into a concrete bucket count: ONE
    small aggregate job finds the hottest key's row count; the split
    engages only past ``threshold``. Numeric values pass through
    unchanged (0 = never split). Shared by asof and sessionize."""
    if skew_buckets != "auto":
        return int(skew_buckets)
    hottest = (
        df.groupBy(*keys)
        .count()
        .agg(F.max("count").alias("m"))
        .first()["m"]
    )
    return AUTO_SKEW_BUCKETS if (hottest or 0) > threshold else 0


def _validate(probe: DataFrame, reference: DataFrame, carry: list[str]):
    overlap = set(carry) & set(probe.columns)
    if overlap:
        raise ValueError(f"carry columns collide with probe columns: {overlap}")
    # includes the skew-split stage-2 intermediates — an input column
    # named e.g. _carry_in would pass a narrower guard and only break
    # (ambiguous column) when skew_buckets engages, possibly by surprise
    # via skew_buckets="auto"
    reserved = {
        _KIND, _CARRY, _BUCKET, ASOF_ORDER,
        "_in_bucket", "_carry_in", "_last_ref",
    }
    for side, df in (("probe", probe), ("reference", reference)):
        hit = reserved & set(df.columns)
        if hit:
            raise ValueError(
                f"{side} columns collide with reserved as-of names: {hit}"
            )


def _tagged_union(
    probe: DataFrame,
    reference: DataFrame,
    keys: list[str],
    order: str,
    carry: list[str],
) -> tuple[DataFrame, list[str]]:
    """Union of both sides with ``_kind`` (0=reference, 1=probe) and the
    reference's carry columns + order packed into the ``_asof_carry``
    struct — non-null for every reference row, null for probe rows, so
    ``last(ignorenulls)`` tracks reference ROWS, not non-null values."""
    probe_extra = [c for c in probe.columns if c not in (*keys, order)]
    ref_dtypes = dict(reference.dtypes)
    ref_side = reference.select(
        *keys,
        F.col(order).alias(order),
        F.lit(0).alias(_KIND),
        *[
            F.lit(None).cast(dict(probe.dtypes)[c]).alias(c)
            for c in probe_extra
        ],
        F.struct(
            *[F.col(c).alias(c) for c in carry],
            F.col(order).alias(_ORD_FIELD),
        ).alias(_CARRY),
    )
    carry_type = ref_side.schema[_CARRY].dataType.simpleString()
    probe_side = probe.select(
        *keys,
        F.col(order).alias(order),
        F.lit(1).alias(_KIND),
        *probe_extra,
        F.lit(None).cast(carry_type).alias(_CARRY),
    )
    return ref_side.unionByName(probe_side), probe_extra


def _unpack(out: DataFrame, carry: list[str], struct_col: str) -> DataFrame:
    sel = [c for c in out.columns if c not in (struct_col, _KIND, _BUCKET)]
    return out.where(F.col(_KIND) == 1).select(
        *sel,
        *[F.col(struct_col)[c].alias(c) for c in carry],
        F.col(struct_col)[_ORD_FIELD].alias(ASOF_ORDER),
    )


def asof_backward(
    probe: DataFrame,
    reference: DataFrame,
    keys: list[str],
    order: str,
    carry: list[str],
    skew_buckets: int | str = 0,
) -> DataFrame:
    """For each probe row, attach the ``carry`` columns of the LATEST
    reference row with ``reference.order <= probe.order``, per ``keys``.

    Contract:
    - ``reference`` must be unique per (keys, order) — pre-aggregate
      ties upstream (e.g. ``max_by`` on a unique id) so the match is
      deterministic;
    - probe columns other than keys/order ride through unchanged;
    - output adds ``carry`` (null when no reference row precedes — a
      reference row whose carry VALUE is null still matches and yields
      null, with ``asof_order`` reporting that row's order) and
      ``asof_order`` (the matched reference row's order value, null only
      when no reference row precedes);
    - ``order`` must be numeric or timestamp when ``skew_buckets > 0``
      (range bucketing quantiles it).

    ``skew_buckets``: 0 (default) runs the single window per key — right
    whenever every key's history fits one task. N>0 splits each key's
    window across up to N order-range buckets (see module docstring) —
    use for pathological keys (a bot user_id with 10⁸ events).
    ``"auto"`` spends one small aggregate job to find the hottest key
    and engages the split only past AUTO_SKEW_THRESHOLD rows.
    """
    return _asof(probe, reference, keys, order, carry, skew_buckets, False)


def asof_forward(
    probe: DataFrame,
    reference: DataFrame,
    keys: list[str],
    order: str,
    carry: list[str],
    skew_buckets: int | str = 0,
) -> DataFrame:
    """Mirror of :func:`asof_backward`: attach the EARLIEST reference
    row with ``reference.order >= probe.order`` (the "next reading"
    direction — e.g. match each order to the next price tick). Same
    contract, same plans; the windows simply scan in descending order,
    and the skew-split carry-in flows from LATER buckets.
    """
    return _asof(probe, reference, keys, order, carry, skew_buckets, True)


def _asof(
    probe: DataFrame,
    reference: DataFrame,
    keys: list[str],
    order: str,
    carry: list[str],
    skew_buckets: int | str,
    forward: bool,
) -> DataFrame:
    _validate(probe, reference, carry)
    u, _ = _tagged_union(probe, reference, keys, order, carry)
    skew_buckets = resolve_skew_buckets(u, keys, skew_buckets)
    if skew_buckets > 1:
        _check_order_bucketable(u, order)
        return _asof_skew_split(u, keys, order, carry, skew_buckets, forward)
    ord_spec = F.desc(order) if forward else F.asc(order)
    w = (
        Window.partitionBy(*keys)
        .orderBy(ord_spec, _KIND)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # one projection → Catalyst plans a single Window operator
    passthrough = [c for c in u.columns if c != _CARRY]
    out = u.select(
        *passthrough,
        F.last(_CARRY, ignorenulls=True).over(w).alias(_CARRY),
    )
    return _unpack(out, carry, _CARRY)


def _check_order_bucketable(df: DataFrame, order: str) -> None:
    """The skew split range-buckets on ``cast(order as double)``. For a
    non-castable order column (e.g. string) that cast yields nulls, the
    percentile job returns null, bounds collapse to [] and every row
    lands in bucket 0 — the caller asked for skew handling (possibly via
    ``"auto"``) but would silently get the single-task window, the exact
    failure mode the split exists to avoid. Fail loudly instead."""
    dtype = dict(df.dtypes)[order]
    ok = dtype in ("timestamp", "timestamp_ntz", "date") or any(
        dtype.startswith(p)
        for p in ("tinyint", "smallint", "int", "bigint", "float",
                  "double", "decimal")
    )
    if not ok:
        raise TypeError(
            f"skew_buckets requires a numeric/timestamp order column; "
            f"got {order!r} of type {dtype}"
        )


def _asof_skew_split(
    u: DataFrame,
    keys: list[str],
    order: str,
    carry: list[str],
    buckets: int,
    forward: bool = False,
) -> DataFrame:
    # Bucket boundaries: one small aggregate job; inlined as literals so
    # assignment is a map-side codegen projection on the scan (the ann.py
    # centroid-hoisting pattern). Approximate quantiles only affect
    # balance, never correctness.
    qs = [i / buckets for i in range(1, buckets)]
    row = u.select(
        F.percentile_approx(F.col(order).cast("double"), qs).alias("b")
    ).first()
    bounds = sorted(set(row["b"] or []))
    bucket_expr = F.lit(0)
    for b in bounds:
        bucket_expr = bucket_expr + F.when(
            F.col(order).cast("double") > F.lit(b), 1
        ).otherwise(0)
    ub = u.withColumn(_BUCKET, bucket_expr)

    ord_spec = F.desc(order) if forward else F.asc(order)
    # Stage 1: in-bucket window — identical semantics to the single
    # window, but the hot key now spreads across the buckets it spans.
    w_in = (
        Window.partitionBy(*keys, _BUCKET)
        .orderBy(ord_spec, _KIND)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    staged = ub.select(
        *[c for c in ub.columns if c != _CARRY],
        F.last(_CARRY, ignorenulls=True).over(w_in).alias("_in_bucket"),
    )

    # Stage 2: per (keys, bucket) the boundary reference struct (LAST
    # for backward, FIRST for forward) — a keys×buckets-sized table —
    # then each bucket's carry-in is the nearest boundary struct from
    # strictly earlier (backward) / later (forward) buckets.
    edge_pick = F.min_by if forward else F.max_by
    boundary = ub.where(F.col(_KIND) == 0).groupBy(*keys, _BUCKET).agg(
        edge_pick(_CARRY, F.col(order)).alias("_last_ref")
    )
    # every (keys, bucket) that exists on EITHER side needs a carry-in
    # row — a probe-only bucket still inherits across the edge
    occupied = ub.groupBy(*keys, _BUCKET).agg(F.lit(1).alias("_one")).drop(
        "_one"
    )
    boundary = occupied.join(boundary, on=[*keys, _BUCKET], how="left")
    w_carry = (
        Window.partitionBy(*keys)
        .orderBy(F.desc(_BUCKET) if forward else F.asc(_BUCKET))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_in = boundary.select(
        *keys,
        F.col(_BUCKET),
        F.last("_last_ref", ignorenulls=True).over(w_carry).alias("_carry_in"),
    )

    out = staged.join(carry_in, on=[*keys, _BUCKET], how="left").withColumn(
        _CARRY, F.coalesce("_in_bucket", "_carry_in")
    )
    return _unpack(
        out.drop("_in_bucket", "_carry_in"), carry, _CARRY
    )
