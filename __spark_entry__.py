"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``hoard_spark.queries.REGISTRY`` (timeseries Q1-Q5,
relational Q6-Q30, LLM-pipeline Q31-Q43, multimodal Q44-Q46, embedding
near-dup Q47); this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make hoard_spark importable regardless of the driver's cwd — both driver-
# side (sys.path) and executor-side (PYTHONPATH, inherited by the Python
# workers of any SparkSession created after this import; mapInPandas
# closures reference hoard_spark module functions by name).
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
_pp = os.environ.get("PYTHONPATH", "")
if _REPO not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = _REPO + (os.pathsep + _pp if _pp else "")

from hoard_spark.queries import all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "q01_bucket_lww"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (tier-0 bucket LWW — the reference's core write
    semantics, SURVEY.md §2A) on sf0.001; driver checks rows>0."""
    return all_queries()[FLAGSHIP].spark_fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark_fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; engine-only queries (no
    portable SQL form, e.g. LSH near-dup) are omitted → rows-only check."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle}
