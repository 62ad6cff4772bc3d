"""Guards on the __spark_entry__ driver contract.

The driver checks only the FIRST 50 ``queries()`` entries per round, so
the `_PRIORITY` rotation list is load-bearing: a typo'd name silently
falls out of rank and a stale query loses its fresh driver evidence.
These tests don't run any Spark jobs.
"""

from __future__ import annotations

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

entry = importlib.import_module("__spark_entry__")


def test_priority_names_exist_in_registry():
    from hoard_spark.queries import all_queries

    reg = set(all_queries())
    missing = [n for n in entry._PRIORITY if n not in reg]
    assert not missing, f"_PRIORITY names not in registry: {missing}"


def test_priority_has_no_duplicates():
    assert len(entry._PRIORITY) == len(set(entry._PRIORITY))


def test_queries_and_oracles_line_up():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    # every oracle key is a query; engine-only queries may omit oracles
    assert set(oracles) <= set(qs)
    # no engine-only queries remain: q36/q43 gained oracles in round 7
    # and q39 in round 8 (planted duplicate vectors — the IVF path must
    # return each clone's source as exact top-1); the genuine-neighbor
    # recall pin lives in tests/test_llm_queries.py on ann_ivf_topk
    assert set(qs) - set(oracles) == set()


def test_first_50_covers_all_priority_entries():
    names = list(entry.queries())
    window = set(names[:50])
    dropped = [n for n in entry._PRIORITY if n not in window]
    assert not dropped, (
        f"_PRIORITY entries pushed out of the driver's 50-entry window "
        f"(list too long?): {dropped}"
    )


def test_flagship_is_registered():
    assert entry.FLAGSHIP in entry.queries()
