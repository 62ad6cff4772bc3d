"""Keyed snapshot diff: added / removed / changed rows between tables.

The reconciliation primitive every large pipeline needs: after a
backfill, a code change, or a dedup-policy bump, "what changed?" must
be answerable without eyeballing row counts. ``table_diff`` compares
two snapshots by key with ONE full outer join (one shuffle per side,
AQE-skew-safe) and JVM-side struct equality for the value columns — no
per-column Python, no N passes.

Output: one row per differing key — ``change`` ∈ {'added', 'removed',
'changed'} plus both sides' value structs (null on the absent side).
Unchanged keys are filtered before the final projection, so the result
is |delta|-sized, not |table|-sized.

Null semantics: two NULLs compare equal (ANSI ``<=>`` via struct
equality inside ``eqNullSafe``) — a NULL→NULL column is NOT a change.

No reference analog (src/hoard.coffee has no multi-snapshot surface);
q87 is the oracle-checked conformance twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE = "change"


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare: list[str] | None = None,
) -> DataFrame:
    """Rows whose presence or ``compare`` columns differ between
    snapshots. ``compare`` defaults to all shared non-key columns; both
    sides must be key-unique (pre-aggregate upstream otherwise).

    Output: ``keys..., change, old_vals (struct), new_vals (struct)``.
    """
    if compare is None:
        compare = [
            c
            for c in old.columns
            if c in set(new.columns) and c not in keys
        ]
    missing = [
        c
        for c in compare
        if c not in old.columns or c not in new.columns
    ]
    if missing:
        raise ValueError(f"compare columns absent from a side: {missing}")
    if CHANGE in (*keys, *compare):
        raise ValueError(f"'{CHANGE}' collides with an input column")

    o = old.select(
        *keys,
        F.struct(*[F.col(c).alias(c) for c in compare]).alias("old_vals"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *keys,
        F.struct(*[F.col(c).alias(c) for c in compare]).alias("new_vals"),
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("old_vals").eqNullSafe(F.col("new_vals")),
            F.lit("changed"),
        )
    )
    return (
        j.withColumn(CHANGE, change)
        .where(F.col(CHANGE).isNotNull())
        .select(*keys, CHANGE, "old_vals", "new_vals")
    )
