"""As-of (backward) join as a library operator over ANY DataFrames.

The conformance query q50 (hoard_spark/queries/relational.py) is the
fixed-shape twin over `events`; this module is the composable form —
the relationship ``pipeline.py`` has to q35/q51/q67 and ``ann.py`` has
to q38/q39.

The 100 TB shape (VERDICT r2): an as-of join expressed as a range join
is quadratic per key without interval indexing. Instead, tag reference
rows kind=0 and probe rows kind=1, union, and run ONE window per key
ordered by ``(order, kind)``: ``last(col, ignorenulls)`` over the
unbounded-preceding frame carries each reference row forward to every
later probe row. One shuffle + one sort, **no join operator at all**.
A probe and reference row at the same order value match (ASOF's ``>=``
bound) because kind sorts the reference row first.

No reference analog (the reference is a single-metric time-series
store, src/hoard.coffee); this generalizes its "latest value at or
before t" read primitive (O7 fetch routes + reads one bucket's slot,
src/hoard.coffee:426-513) to arbitrary keyed event streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASOF_ORDER = "asof_order"


def asof_backward(
    probe: DataFrame,
    reference: DataFrame,
    keys: list[str],
    order: str,
    carry: list[str],
) -> DataFrame:
    """For each probe row, attach the ``carry`` columns of the LATEST
    reference row with ``reference.order <= probe.order``, per ``keys``.

    Contract:
    - ``reference`` must be unique per (keys, order) — pre-aggregate
      ties upstream (e.g. ``max_by`` on a unique id) so the match is
      deterministic;
    - probe columns other than keys/order ride through unchanged;
    - output adds ``carry`` (null when no reference row precedes) and
      ``asof_order`` (the matched reference row's order value, null
      likewise).

    Skew note: one key's whole history sorts in one task. For a
    pathological key, split the window by coarse order-range, carry
    boundary state between splits (same trick as q48's sessionization
    at scale) — not needed at tested scales.
    """
    overlap = set(carry) & set(probe.columns)
    if overlap:
        raise ValueError(f"carry columns collide with probe columns: {overlap}")
    from pyspark.sql import Window

    probe_extra = [c for c in probe.columns if c not in (*keys, order)]
    ref_side = reference.select(
        *keys,
        F.col(order).alias(order),
        F.lit(0).alias("_kind"),
        *[F.lit(None).cast(dict(probe.dtypes)[c]).alias(c) for c in probe_extra],
        *carry,
    )
    probe_side = probe.select(
        *keys,
        F.col(order).alias(order),
        F.lit(1).alias("_kind"),
        *probe_extra,
        *[
            F.lit(None).cast(dict(reference.dtypes)[c]).alias(c)
            for c in carry
        ],
    )
    u = ref_side.unionByName(probe_side)
    w = (
        Window.partitionBy(*keys)
        .orderBy(order, "_kind")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # every window expression in ONE projection → Catalyst plans a single
    # Window operator (separate withColumns would stack one per call)
    passthrough = [c for c in u.columns if c not in carry and c != "_kind"]
    out = u.select(
        *passthrough,
        F.col("_kind"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carry],
        F.last(
            F.when(F.col("_kind") == 0, F.col(order)), ignorenulls=True
        )
        .over(w)
        .alias(ASOF_ORDER),
    )
    return out.where(F.col("_kind") == 1).drop("_kind")
