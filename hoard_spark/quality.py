"""Data-quality operators: single-pass column profiling + declarative
constraint validation.

A 100 TB ingest pipeline gates every dataset version on two questions —
*what does this table look like* (null rates, cardinalities, numeric
ranges) and *does it satisfy its contract* (keys unique, references
resolve, values in range). The shapes here are the Spark-native answers
(the public pattern popularized by AWS Deequ's analyzers/verification
suites — re-derived on plain DataFrame aggregates, no dependency):

- :func:`profile_columns` computes every column's profile in ONE scan:
  Catalyst rewrites the multi-column ``count_distinct`` battery into a
  single Expand + two-phase aggregate (one pass over the data, map-side
  partials, no per-column jobs), and the bounded wide row is exploded
  to long form driver-free. Exact distinct counts are the conformance
  semantics; at extreme cardinalities ``approx=True`` swaps in HLL
  sketches (``approx_count_distinct``) — same single-pass plan, bounded
  memory — the same exact-twin/approx-scale-path split q56 documents
  for percentiles.
- :func:`validate` runs a declarative checklist of :class:`Check`
  constraints and returns one ``(constraint, violations)`` row each.
  Counts are plain filters/aggregates; referential checks are anti
  joins (the q12 shape — shuffle-partitioned on the key at scale,
  broadcast when the parent side is bounded).

No reference analog (src/hoard.coffee:1-520 exposes no tabular
surface); this extends the training-data curation library the same way
the dedup/ANN families do.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_columns(
    df: DataFrame,
    columns: "Sequence[str] | None" = None,
    approx: bool = False,
) -> DataFrame:
    """Long-form per-column profile in one scan:
    ``(col, n_nulls, n_distinct, min_num, max_num, mean_num)``.

    Numeric stats are NULL for non-numeric columns. ``mean_num`` uses
    the order-independent decimal accumulation (``davg``) so the value
    is stable under partial-aggregation order and matches an ANSI-SQL
    twin bit-for-bit. One aggregate node: the distinct battery expands
    (Expand operator, one pass), never one job per column.
    """
    from hoard_spark.queries import davg

    cols = list(columns) if columns is not None else df.columns
    types = {f.name: f.dataType for f in df.schema}
    aggs = [F.count(F.lit(1)).alias("_n")]
    nd = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.count_distinct(F.col(c)))
    )
    for c in cols:
        aggs += [F.count(c).alias(f"_c_{c}"), nd(c).alias(f"_d_{c}")]
        if isinstance(types[c], _NUMERIC_TYPES):
            aggs += [
                F.min(c).cast("double").alias(f"_mn_{c}"),
                F.max(c).cast("double").alias(f"_mx_{c}"),
                davg(c).alias(f"_av_{c}"),
            ]
    wide = df.agg(*aggs)
    null_d = F.lit(None).cast("double")
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                (F.col("_n") - F.col(f"_c_{c}")).alias("n_nulls"),
                F.col(f"_d_{c}").alias("n_distinct"),
                *(
                    (
                        F.col(f"_mn_{c}").alias("min_num"),
                        F.col(f"_mx_{c}").alias("max_num"),
                        F.col(f"_av_{c}").alias("mean_num"),
                    )
                    if isinstance(types[c], _NUMERIC_TYPES)
                    else (
                        null_d.alias("min_num"),
                        null_d.alias("max_num"),
                        null_d.alias("mean_num"),
                    )
                ),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(entries).alias("e")).select("e.*")


@dataclass(frozen=True)
class Check:
    """One named constraint; ``violations`` builds a 1-row count frame."""

    name: str
    violations: Callable[[], DataFrame]


def _count(df: DataFrame) -> DataFrame:
    return df.agg(F.count(F.lit(1)).alias("violations"))


def not_null(df: DataFrame, col: str) -> Check:
    return Check(
        f"not_null({col})",
        lambda: _count(df.where(F.col(col).isNull())),
    )


def unique(df: DataFrame, col: str) -> Check:
    """COUNT(*) - COUNT(DISTINCT col) over non-null values (each extra
    copy of a duplicated value counts as one violation)."""
    return Check(
        f"unique({col})",
        lambda: df.where(F.col(col).isNotNull()).agg(
            (F.count(F.lit(1)) - F.count_distinct(F.col(col))).alias(
                "violations"
            )
        ),
    )


def in_range(df: DataFrame, col: str, lo, hi) -> Check:
    return Check(
        f"in_range({col},{lo},{hi})",
        lambda: _count(
            df.where(
                F.col(col).isNotNull()
                & ((F.col(col) < lo) | (F.col(col) > hi))
            )
        ),
    )


def satisfies(df: DataFrame, name: str, cond) -> Check:
    """Violations = rows where ``cond`` (a boolean Column) is NOT true
    (false or NULL) — SQL CHECK-constraint semantics."""
    return Check(name, lambda: _count(df.where(~F.coalesce(cond, F.lit(False)))))


def references(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str,
    name: "str | None" = None,
) -> Check:
    """Referential integrity: child rows (non-null key) with no parent.
    An anti join on the key — shuffle-partitioned at scale, broadcast
    when the parent is bounded (Catalyst/AQE decides from stats)."""
    return Check(
        name or f"references({child_col}->{parent_col})",
        lambda: _count(
            child.where(F.col(child_col).isNotNull()).join(
                parent.select(F.col(parent_col).alias(child_col)),
                child_col,
                "left_anti",
            )
        ),
    )


def validate(checks: Sequence[Check]) -> DataFrame:
    """(constraint, violations) — one row per check, single plan (the
    per-check aggregates union into one job)."""
    out = None
    for c in checks:
        row = c.violations().select(
            F.lit(c.name).alias("constraint"),
            F.col("violations").cast("long").alias("violations"),
        )
        out = row if out is None else out.unionByName(row)
    if out is None:
        raise ValueError("validate: empty check list")
    return out
