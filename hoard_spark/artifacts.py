"""Corpus-keyed materialized intermediates ("persisted cluster table").

Expensive derived tables that several queries share — the near-dup
cluster assignment (q51/q67, VERDICT r3 item 4) is the canonical case —
are computed once per *corpus fingerprint* and persisted as parquet under
a scratch root. A consumer gets a plain parquet scan instead of re-running
the LSH → connected-components pipeline; at 100 TB this is exactly the
warehouse pattern (materialize the cluster table once per corpus version,
join against it everywhere).

The fingerprint keys on the absolute input paths plus their
(mtime_ns, size), so a regenerated corpus at the same path invalidates
the artifact automatically. Artifacts are deterministic by construction
(every producer here has engine-independent output), so reuse across
sessions/rounds is value-safe.

Root: ``$HOARD_SPARK_ARTIFACTS`` (default ``<tmp>/hoard_spark_artifacts``).
Writes go to a pid-suffixed staging dir and are renamed into place, so a
concurrent builder never exposes a half-written table.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession


def artifacts_root() -> str:
    return os.environ.get(
        "HOARD_SPARK_ARTIFACTS",
        os.path.join(tempfile.gettempdir(), "hoard_spark_artifacts"),
    )


def corpus_fingerprint(sf_dir: str, tables: Iterable[str]) -> str:
    """Stable key for (corpus dir, input tables): path + mtime_ns + size
    per table. Works for both single-file and directory-style parquet
    (a Spark re-write touches the directory mtime)."""
    h = hashlib.md5()
    h.update(os.path.abspath(sf_dir).encode())
    for t in sorted(tables):
        p = os.path.join(sf_dir, f"{t}.parquet")
        try:
            st = os.stat(p)
            h.update(f"|{t}:{st.st_mtime_ns}:{st.st_size}".encode())
        except OSError:
            h.update(f"|{t}:absent".encode())
    return h.hexdigest()[:16]


def get_or_build(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    tables: Iterable[str],
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the materialized table ``name`` for this corpus, building
    (and persisting) it on first use. The returned DataFrame is a parquet
    scan — cheap to re-read, prunable, and shared across queries."""
    path = os.path.join(artifacts_root(), corpus_fingerprint(sf_dir, tables), name)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        staging = f"{path}.stage{os.getpid()}"
        build().write.mode("overwrite").parquet(staging)
        try:
            os.rename(staging, path)
        except OSError:  # concurrent builder won the rename — use theirs
            shutil.rmtree(staging, ignore_errors=True)
    return spark.read.parquet(path)
