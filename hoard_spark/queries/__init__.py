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


REGISTRY: dict[str, Query] = {}


def query(name: str, description: str, oracle: str | None, survey_ref: str):
    """Register a conformance query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name, description, fn, oracle, survey_ref)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp views for the few queries expressed in Spark SQL text."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def dsum(col: Column) -> Column:
    """Order-independent SUM for doubles: exact DECIMAL(38,6) accumulation,
    result cast back to double. Oracle twin:
    ``CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)``."""
    return F.sum(col.cast("decimal(38,6)")).cast("double")


def all_queries() -> dict[str, Query]:
    # import side-effect: populate REGISTRY
    from hoard_spark.queries import llm, relational, timeseries  # noqa: F401

    return dict(REGISTRY)
