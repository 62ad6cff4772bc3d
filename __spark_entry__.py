"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``hoard_spark.queries.REGISTRY`` (SURVEY.md §2C
Q1-Q78: timeseries core, relational/window/set/scalar surface, the
LLM-training-data pipeline family, multimodal codecs); this module is a
thin adapter that also controls driver-gate ordering (see _PRIORITY).
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

# The driver's correctness gate covers the first 50 registry entries per
# round. Emit least-recently-driver-verified queries first so every query
# accumulates a driver-green row across rounds. Round-14 rotation:
# q101/q102 lead (declared in r13, never in any driver gate — the only
# queries with zero driver-side oracle evidence), followed by 48 of the
# r12 gate set (newest driver row: CORRECTNESS_r12.json). Round-robin
# debt: q25_topk and q30_conditional (both r12-green, untouched since)
# slip to r15 to make room; ledger in SURVEY.md §"Driver-gate rotation".
_PRIORITY = [
    "q101_profile", "q102_integrity",
    "q01_bucket_lww", "q08_inner_join_agg", "q09_left_join",
    "q10_full_join", "q11_semi_join",
    "q21_ranking_windows", "q22_lag_delta", "q23_moving_avg",
    "q24_ntile", "q26_set_ops", "q27_string_fns",
    "q28_date_fns", "q29_math_fns",
    "q31_exact_dedup", "q32_token_stats", "q33_json_extract",
    "q34_cosine_topk", "q35_minhash_neardup", "q37_ngram_jaccard_topk",
    "q38_knn_exact", "q39_ann_ivf", "q40_lang_id", "q41_quality_score",
    "q54_pivot", "q55_unpivot", "q56_percentiles", "q57_range_join",
    "q58_salted_agg", "q69_weighted_median", "q70_map_fns",
    "q79_simjoin_threshold", "q81_merge_upsert", "q82_quantile_sketch",
    "q83_gapfill", "q84_ewma", "q85_interval_join",
    "q86_window_distinct", "q87_snapshot_diff", "q88_scd2_intervals",
    "q89_fuzzy_probe",
    "q91_ann_ivfpq", "q92_ann_filtered", "q93_ann_lsh",
    "q94_label_outliers", "q95_ngram_novelty", "q96_pmi_bigrams",
    "q97_mixture_weights", "q98_containment_dedup",
]


def _ordered():
    reg = all_queries()
    rank = {n: i for i, n in enumerate(_PRIORITY)}
    names = sorted(reg, key=lambda n: (rank.get(n, len(_PRIORITY)), n))
    return {n: reg[n] for n in names}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (tier-0 bucket LWW — the reference's core write
    semantics, SURVEY.md §2A) on sf0.001; driver checks rows>0."""
    return all_queries()[FLAGSHIP].spark_fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark_fn for name, q in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; engine-only queries (no
    portable SQL form, e.g. LSH near-dup) are omitted → rows-only check."""
    return {name: q.oracle for name, q in _ordered().items() if q.oracle}
