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
# accumulates a driver-green row across rounds. Round-13 rotation: the 50
# queries whose newest driver row is r11 (exactly the CORRECTNESS_r11.json
# key set — the complement of the r12 gate) go first, keeping every
# query's newest driver evidence ≤1 round old a seventh time.
_PRIORITY = [
    "q02_rollup_xff", "q03_cascaded_rollup", "q04_range_fetch",
    "q05_retention_filter", "q06_filter", "q07_projection_math",
    "q12_anti_join", "q13_cross_join", "q14_theta_join",
    "q15_multiway_join", "q16_exact_distinct", "q17_grouping_sets",
    "q18_rollup", "q19_cube", "q20_stats_aggs",
    "q36_simhash_neardup",
    "q42_token_count_bpe", "q43_doc_fingerprint",
    "q44_mm_metadata", "q45_mm_features", "q46_frame_sample",
    "q47_embedding_neardup", "q48_sessionize", "q49_decode_resize",
    "q50_asof_join", "q51_dedup_clusters", "q52_hash_sample",
    "q53_text_clean",
    "q59_array_fns", "q60_pii_redact", "q61_stratified_sample",
    "q62_embedding_quantize", "q63_chunking", "q64_tfidf_top_term",
    "q65_repetition_score", "q66_contamination", "q67_canonical_pick",
    "q68_bm25_topk",
    "q71_bigram_lm_score", "q72_span_dedup", "q73_pack_contexts",
    "q74_quality_blend", "q75_scalar_subquery", "q76_value_windows",
    "q77_funnel", "q78_cohort_retention", "q80_sorted_collect",
    "q90_topk_simjoin_ladder",
    "q99_ann_recall", "q100_ann_recall_paths",
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
