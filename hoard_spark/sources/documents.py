"""Document corpus source/sink — JSONL / CSV / Parquet ingestion.

Training corpora rarely arrive as clean Parquet: the common wire formats
are JSONL (one JSON doc per line) and CSV. This connector reads any of
them into the canonical ``documents`` schema with the disciplines that
matter at 100 TB:

- **Explicit schema, never inference.** Schema inference is a full extra
  pass over the data (Spark reads every file once just to guess types);
  at corpus scale that doubles ingest cost and can still guess wrong.
  The documents schema is fixed here and pushed into the reader.
- **Corrupt-record policy is explicit.** ``mode="permissive"`` captures
  undecodable lines in a ``_corrupt_record`` column (quarantined, not
  dropped — silent row loss in an ingest pipeline is a wrong answer);
  ``mode="failfast"`` aborts on the first bad record for
  trust-but-verify loads.
- **Derived columns are normalized**: ``n_chars`` is recomputed from
  ``text`` when absent or null, so downstream operators can rely on it.
- **Sink side** writes Parquet partitioned by a chosen column (default
  ``lang`` — the stratum key every sampling/QA query groups by), with
  Zstandard compression.

No reference analog (the reference reads only its own binary ring files,
src/hoard.coffee:399); declared round-3 source/sink extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_MODES = {"permissive": "PERMISSIVE", "failfast": "FAILFAST"}


def _schema_with_corrupt() -> T.StructType:
    # StructType.add mutates in place — never call it on the module-level
    # schema, or every read after the first sees a duplicate column.
    return T.StructType(
        list(DOCUMENTS_SCHEMA.fields)
        + [T.StructField("_corrupt_record", T.StringType())]
    )


def read_documents(
    spark: SparkSession,
    path: str,
    fmt: str = "jsonl",
    mode: str = "permissive",
) -> DataFrame:
    """Read a document corpus into the canonical schema.

    ``fmt``: ``jsonl`` | ``csv`` | ``parquet``. In permissive mode the
    result carries a ``_corrupt_record`` column (null for good rows);
    use :func:`split_corrupt` to quarantine. n_chars is recomputed when
    missing.
    """
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {sorted(_MODES)}: {mode!r}")
    if fmt == "jsonl":
        schema = _schema_with_corrupt()
        df = (
            spark.read.schema(schema)
            .option("mode", _MODES[mode])
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path)
        )
    elif fmt == "csv":
        schema = _schema_with_corrupt()
        df = (
            spark.read.schema(schema)
            .option("header", "true")
            .option("mode", _MODES[mode])
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .option("multiLine", "true")  # docs contain newlines
            .option("escape", '"')
            .csv(path)
        )
    elif fmt == "parquet":
        df = spark.read.schema(DOCUMENTS_SCHEMA).parquet(path).withColumn(
            "_corrupt_record", F.lit(None).cast("string")
        )
    else:
        raise ValueError(f"unknown format: {fmt!r}")
    return df.withColumn(
        "n_chars",
        F.when(
            F.col("_corrupt_record").isNull(),
            F.coalesce(F.col("n_chars"), F.length("text").cast("long")),
        ),
    )


def stream_documents(
    spark: SparkSession,
    path: str,
    fmt: str = "jsonl",
    mode: str = "permissive",
) -> DataFrame:
    """Streaming twin of :func:`read_documents` — a file-source stream
    over a drop directory of JSONL/CSV/Parquet corpus files, with the
    same explicit schema and corrupt-record policy. Compose with
    ``hoard_spark.streaming.neardup.NearDupIndex.sink`` for online
    dedup-on-ingest, or ``writeStream.foreachBatch`` + ``split_corrupt``
    for a quarantining loader (a streaming frame cannot be persisted, so
    the two-output split happens inside each micro-batch).
    """
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {sorted(_MODES)}: {mode!r}")
    if fmt == "jsonl":
        df = (
            spark.readStream.schema(_schema_with_corrupt())
            .option("mode", _MODES[mode])
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path)
        )
    elif fmt == "csv":
        df = (
            spark.readStream.schema(_schema_with_corrupt())
            .option("header", "true")
            .option("mode", _MODES[mode])
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .option("multiLine", "true")
            .option("escape", '"')
            .csv(path)
        )
    elif fmt == "parquet":
        df = (
            spark.readStream.schema(DOCUMENTS_SCHEMA)
            .parquet(path)
            .withColumn("_corrupt_record", F.lit(None).cast("string"))
        )
    else:
        raise ValueError(f"unknown format: {fmt!r}")
    return df.withColumn(
        "n_chars",
        F.when(
            F.col("_corrupt_record").isNull(),
            F.coalesce(F.col("n_chars"), F.length("text").cast("long")),
        ),
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): good rows in canonical schema, bad rows as
    (doc_id, raw ``_corrupt_record``) for audit/replay. Quarantining
    instead of dropping keeps ingest loss measurable.

    Persists ``df``: a two-output split re-reads the parse either way
    (Spark batch has no single-pass multi-sink), and Spark refuses raw
    JSON/CSV scans whose pruned column set is only the internal
    corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    RECORD_COLUMN) — the persist is the documented answer to both.
    Caller unpersists ``df`` after writing both outputs; MEMORY_AND_DISK
    spills rather than evicting, so corpus-scale splits degrade to disk
    instead of recomputing the parse.
    """
    from pyspark import StorageLevel

    df.persist(StorageLevel.MEMORY_AND_DISK)
    good = df.where(F.col("_corrupt_record").isNull()).select(
        *[f.name for f in DOCUMENTS_SCHEMA.fields]
    )
    bad = df.where(F.col("_corrupt_record").isNotNull()).select(
        "doc_id", "_corrupt_record"
    )
    return good, bad


def write_documents(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: str | None = "lang",
) -> None:
    """Persist a corpus. Parquet+zstd partitioned by ``partition_by``
    (lang by default — the stratum every sampler/QA pass prunes on);
    JSONL/CSV for interchange."""
    cols = [f.name for f in DOCUMENTS_SCHEMA.fields]
    out = df.select(*[c for c in cols if c in df.columns])
    if fmt == "parquet":
        w = out.write.mode("overwrite").option("compression", "zstd")
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(path)
    elif fmt == "jsonl":
        out.write.mode("overwrite").json(path)
    elif fmt == "csv":
        out.write.mode("overwrite").option("header", "true").option(
            "escape", '"'
        ).csv(path)
    else:
        raise ValueError(f"unknown format: {fmt!r}")
