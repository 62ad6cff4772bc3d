"""Streaming-store compaction (file-count maintenance).

Every micro-batch adds files: the flat append stores (signatures /
matches / grams / scores / pairs) grow by one file per write task, and
the containment store adds a ``batch=<id>`` directory per admitting
batch — so a long-lived store accumulates ~tasks x batches small files.
Listing cost then grows linearly with batches and scan parallelism
degrades into per-file open overhead; the r13 sf10 streaming artifact
measured ~93 files/batch on the containment posting store (bounded over
its 10 batches, and called out there as the axis to watch at 100+
batches). ``compact_flat`` / ``compact_partitioned`` rewrite a store
into ``target_files`` files with an IDENTICAL row multiset — no dedupe,
no reordering semantics: row identity is the invariant the stores'
replay discipline reasons about, so compaction must be invisible to it.

Crash safety is roll-forward, not rollback: the rewrite is staged into
a ``_``-prefixed directory INSIDE the store root (Spark's parquet file
listing skips underscore/dot paths, so readers never see the staging
copy), then a JSON manifest — the commit point — records exactly which
old entries the apply step deletes and which staged files it moves in.
The apply step is pure filesystem metadata work, idempotent, and
re-runnable from the manifest at any point; ``recover`` replays it, and
every store entry point calls ``recover`` first (one existence probe
when no compaction is pending). A crash BEFORE the manifest write
leaves the store untouched (the staging dir is invisible and simply
overwritten next time); a crash AFTER it is finished by the next
``recover``. Readers are protected against crashes, not against a
concurrently running compactor: run compaction between batches, like
``AnnIndexStore.maintain``.

All filesystem access goes through :class:`hoard_spark.fsutil.
WarehouseFS`, so a store rooted at a ``file://`` URI (or any Hadoop
filesystem) compacts identically to a POSIX path.

No reference analog (src/hoard.coffee:1-520 has no multi-file store —
one preallocated ring-buffer file per metric); this is maintenance the
Spark-native store layout needs at scale.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hoard_spark.fsutil import WarehouseFS

_MANIFEST = "_compact_manifest.json"
_STAGING = "_compact_staged"


def _manifest(root: str) -> str:
    return f"{root.rstrip('/')}/{_MANIFEST}"


def _staging(root: str) -> str:
    return f"{root.rstrip('/')}/{_STAGING}"


def _visible(names: list[str]) -> list[str]:
    return [n for n in names if not n.startswith(("_", "."))]


def recover(spark: SparkSession, root: str) -> bool:
    """Finish a compaction that crashed mid-apply; True if one was
    pending. Idempotent — safe to call from every store entry point."""
    fs = WarehouseFS(spark)
    mp = _manifest(root)
    if not fs.exists(mp):
        return False
    try:
        m = json.loads(fs.read_bytes(mp).decode("utf-8"))
    except ValueError:
        # Truncated by a crash MID-WRITE: the manifest is the commit
        # point and it never finished, so nothing was applied — discard
        # it and the (invisible) staging dir; the store is untouched.
        import warnings

        warnings.warn(
            f"discarding corrupt compaction manifest at {mp} "
            "(crash before commit point; store left as-is)",
            RuntimeWarning,
            stacklevel=2,
        )
        fs.rmtree(mp)
        fs.rmtree(_staging(root))
        return False
    _apply(fs, root, m)
    return True


def _apply(fs: WarehouseFS, root: str, m: dict) -> None:
    """The manifest's delete-then-move plan. Every step probes
    existence first, so replaying after a crash at ANY point converges
    on the same final state (the staged files not yet moved are still
    under ``_compact_staged``; the ones already moved are gone from
    it)."""
    root = root.rstrip("/")
    if m["kind"] == "flat":
        for n in m["delete"]:
            fs.rmtree(f"{root}/{n}")
        for n in m["staged"]:
            src = f"{root}/{_STAGING}/{n}"
            if fs.exists(src):
                fs.rename(src, f"{root}/{n}")
    else:  # partitioned: fold batch=<id> dirs into batch=-1
        for i in m["fold"]:
            fs.rmtree(f"{root}/batch={i}")
        if fs.exists(_staging(root)):
            fs.rename(_staging(root), f"{root}/batch=-1")
    fs.rmtree(_staging(root))
    fs.rmtree(_manifest(root))


def compact_flat(
    spark: SparkSession,
    root: str,
    schema,
    target_files: int = 32,
) -> dict:
    """Rewrite a flat append store (all parquet files directly under
    ``root``) into ``target_files`` files, row-multiset-identical.

    Skips stores that are absent or already at/below the target (a
    compaction pass over a fleet of stores must be cheap to no-op)."""
    fs = WarehouseFS(spark)
    recover(spark, root)
    root = root.rstrip("/")
    if not fs.exists(root):
        return {"skipped": "absent"}
    old = _visible(fs.listdir(root))
    if len(old) <= target_files:
        return {"skipped": "at_target", "files": len(old)}
    (
        spark.read.schema(schema)
        .parquet(root)
        .repartition(target_files)
        .write.mode("overwrite")
        .parquet(_staging(root))
    )
    staged = [
        n for n in fs.listdir(_staging(root)) if n.startswith("part-")
    ]
    m = {"kind": "flat", "delete": old, "staged": staged}
    fs.write_bytes(_manifest(root), json.dumps(m).encode("utf-8"))
    _apply(fs, root, m)
    return {"files_before": len(old), "files_after": len(staged)}


def compact_partitioned(
    spark: SparkSession,
    root: str,
    schema,
    target_files: int = 32,
) -> dict:
    """Fold a ``batch=<id>``-partitioned store's COMMITTED batch
    directories into one consolidated ``batch=-1`` directory.

    The newest real batch id is always left in place: it is the only
    batch a streaming checkpoint can still replay (foreachBatch
    replays are at-least-once for the LAST uncommitted batch only), and
    its deterministic overwrite directory is the replay mechanism.
    Batches older than that are immutable by the store's append-only
    contract, so folding them — and re-folding the previous ``batch=-1``
    — changes nothing a reader or replayer can observe: partition
    filters ``batch != <current>`` still exclude exactly the current
    batch (current ids are >= 0), and a replay's own overwrite
    directory never collides with ``-1``.

    ``schema`` must include the ``batch`` partition column (int)."""
    fs = WarehouseFS(spark)
    recover(spark, root)
    root = root.rstrip("/")
    if not fs.exists(root):
        return {"skipped": "absent"}
    ids = sorted(
        i
        for i in (
            _batch_id(n) for n in fs.listdir(root) if n.startswith("batch=")
        )
        if i is not None
    )
    real = [i for i in ids if i >= 0]
    fold = [i for i in ids if not real or i != max(real)]
    if len(fold) <= 1:
        return {"skipped": "at_target", "batches": len(ids)}
    if isinstance(schema, str):  # accept DDL strings like the stores use
        schema = spark.createDataFrame([], schema).schema
    cols = [f.name for f in schema.fields if f.name != "batch"]
    (
        spark.read.schema(schema)
        .parquet(root)
        .where(F.col("batch").isin(fold))
        .select(*cols)
        .repartition(target_files)
        .write.mode("overwrite")
        .parquet(_staging(root))
    )
    m = {"kind": "partitioned", "fold": fold}
    fs.write_bytes(_manifest(root), json.dumps(m).encode("utf-8"))
    _apply(fs, root, m)
    return {"folded_batches": len(fold), "batches_after": len(ids) - len(fold) + 1}


def _batch_id(name: str) -> "int | None":
    try:
        return int(name.split("=", 1)[1])
    except ValueError:  # e.g. a rename's transient batch=-1.__old dir
        return None


def store_file_count(spark: SparkSession, root: str) -> int:
    """Recursive data-file count under a store root (observability for
    compaction decisions; underscore/dot entries excluded)."""
    fs = WarehouseFS(spark)
    if not fs.exists(root):
        return 0
    total = 0
    stack = [root.rstrip("/")]
    while stack:
        p = stack.pop()
        for n in _visible(fs.listdir(p)):
            child = f"{p}/{n}"
            if fs.isdir(child):
                stack.append(child)
            else:
                total += 1
    return total
