"""Corpus-keyed materialized intermediates ("persisted cluster table").

Expensive derived tables that several queries share — the near-dup
cluster assignment (q51/q67, VERDICT r3 item 4) is the canonical case —
are computed once per *corpus fingerprint* and persisted as parquet under
a scratch root. A consumer gets a plain parquet scan instead of re-running
the LSH → connected-components pipeline; at 100 TB this is exactly the
warehouse pattern (materialize the cluster table once per corpus version,
join against it everywhere).

The fingerprint keys on the input paths plus their (mtime, size), so a
regenerated corpus at the same path invalidates the artifact
automatically. Artifacts are deterministic by construction (every
producer here has engine-independent output), so reuse across
sessions/rounds is value-safe.

All path operations go through the Hadoop ``FileSystem`` API
(:class:`hoard_spark.fsutil.WarehouseFS`), so the artifact root and the
corpus may live on any Hadoop-supported store (``file://``, HDFS, S3A,
GCS) — the same rule the engine's own data plane follows. Driver-side
``os.*`` calls would silently only work on local disk.

Root: ``$HOARD_SPARK_ARTIFACTS`` (default ``<tmp>/hoard_spark_artifacts``).
Writes go to a pid-suffixed staging dir and are swapped into place via
the crash-safe FS rename in ``WarehouseFS.rename``, so a concurrent
builder never exposes a half-written table and a previously half-written
``path`` (no ``_SUCCESS``) is replaced rather than wedging the cache.
"""

from __future__ import annotations

import hashlib
import os
import posixpath
import tempfile
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

from hoard_spark.fsutil import WarehouseFS


def artifacts_root() -> str:
    return os.environ.get(
        "HOARD_SPARK_ARTIFACTS",
        os.path.join(tempfile.gettempdir(), "hoard_spark_artifacts"),
    )


def _join(base: str, *parts: str) -> str:
    """URI-safe path join: ``os.path.join`` would mangle ``s3a://`` style
    roots on Windows and is local-FS-thinking anyway."""
    return posixpath.join(base.rstrip("/"), *parts)


def corpus_fingerprint(
    sf_dir: str, tables: Iterable[str], spark: SparkSession | None = None
) -> str:
    """Stable key for (corpus dir, input tables): path + mtime + size per
    table. Works for both single-file and directory-style parquet (a
    Spark re-write touches the directory mtime and its child summary).

    With a session the stat goes through the Hadoop FS API, so the
    corpus may live on any supported store; without one (driver-local
    convenience paths only) it falls back to ``os.stat``.
    """
    fs = WarehouseFS(spark) if spark is not None else None
    h = hashlib.md5()
    key_dir = sf_dir if "://" in sf_dir else os.path.abspath(sf_dir)
    h.update(key_dir.encode())
    for t in sorted(tables):
        p = _join(key_dir, f"{t}.parquet")
        if fs is not None:
            st = fs.status(p)
            if st is None:
                h.update(f"|{t}:absent".encode())
                continue
            mtime_ms, length = st
            if length == 0 and fs.isdir(p):
                n, total = fs.child_summary(p)
                h.update(f"|{t}:{mtime_ms}:dir{n}:{total}".encode())
            else:
                h.update(f"|{t}:{mtime_ms}:{length}".encode())
        else:
            try:
                st = os.stat(p)
                h.update(f"|{t}:{st.st_mtime_ns}:{st.st_size}".encode())
            except OSError:
                h.update(f"|{t}:absent".encode())
    return h.hexdigest()[:16]


def get_or_build_json(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    tables: Iterable[str],
    build: Callable[[], object],
) -> object:
    """Corpus-keyed SMALL driver-side artifact (a model sidecar: trained
    centroids/codebooks, a few KB of JSON) — same fingerprint/staging
    discipline as ``get_or_build``, but written/read through the FS
    stream API with ZERO Spark jobs. A tiny model stored as a parquet
    table costs a write job + a collect job per cold consumer; as JSON
    it costs one driver round-trip."""
    import json

    fs = WarehouseFS(spark)
    path = _join(
        artifacts_root(),
        corpus_fingerprint(sf_dir, tables, spark),
        f"{name}.json",
    )
    if fs.exists(path):
        return json.loads(fs.read_bytes(path).decode("utf-8"))
    obj = build()
    staging = f"{path}.stage{os.getpid()}"
    fs.write_bytes(staging, json.dumps(obj).encode("utf-8"))
    if fs.exists(path):
        fs.rmtree(staging)  # concurrent builder published first
    else:
        fs.rename(staging, path)
    return json.loads(fs.read_bytes(path).decode("utf-8"))


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
    fs = WarehouseFS(spark)
    path = _join(
        artifacts_root(), corpus_fingerprint(sf_dir, tables, spark), name
    )
    if not fs.exists(_join(path, "_SUCCESS")):
        staging = f"{path}.stage{os.getpid()}"
        build().write.mode("overwrite").parquet(staging)
        if fs.exists(_join(path, "_SUCCESS")):
            # concurrent builder published first — deterministic content,
            # use theirs and drop ours
            fs.rmtree(staging)
        else:
            fs.rename(staging, path)
    return spark.read.parquet(path)
