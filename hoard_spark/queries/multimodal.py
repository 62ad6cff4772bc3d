"""Q44-Q46 — multimodal binary-column conformance queries.

The payloads are deterministic (UTF-8 bytes of ``documents.text``, which
is pure ASCII in the testdata), so the DuckDB oracles can mirror the
byte-level Spark/pandas computations with character-level SQL: for ASCII,
``substring``/``length``/``md5`` over VARCHAR equal their byte-wise
counterparts over the payload, making even the mapInPandas stages
hash-checkable. No reference analog (SURVEY.md §2B: no binary columns);
part of the training-data-pipeline extension (VERDICT r1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hoard_spark.multimodal import (
    attach_payload,
    attach_ppm_payload,
    decode_resize_stats,
    extract_features,
    sample_frames,
)
from hoard_spark.queries import load, ordered, query


@query(
    "q44_mm_metadata",
    "binary payload metadata scan: per-source counts, bytes, distinct hashes",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS uniq_payloads,
           CAST(MAX(CAST(length(text) % 64 + 1 AS INT)) AS INT) AS max_w
    FROM documents GROUP BY source ORDER BY source
    """,
    "training-data pipeline: multimodal metadata (binary columns)",
)
def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_payload(load(spark, sf_dir, "documents"), kind="image")
    return (
        media.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.octet_length("payload")).alias("total_bytes"),
            F.countDistinct(F.md5("payload")).alias("uniq_payloads"),
            F.max("media.width").alias("max_w"),
        )
        .orderBy("source")
    )


@query(
    "q45_mm_features",
    "payload feature extraction (byte entropy, distinct bytes) via "
    "Arrow-batched mapInPandas",
    """
    WITH chars AS (
        SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
    ),
    freq AS (SELECT doc_id, c, COUNT(*) AS n FROM chars GROUP BY 1, 2),
    tot AS (SELECT doc_id, SUM(n) AS t FROM freq GROUP BY 1),
    ent AS (
        SELECT f.doc_id,
               CAST(MAX(t.t) AS BIGINT) AS n_bytes,
               CAST(COUNT(*) AS INT) AS n_unique,
               ROUND(-SUM((f.n * 1.0 / t.t) * log2(f.n * 1.0 / t.t)), 3)
                   AS entropy
        FROM freq f JOIN tot t USING (doc_id) GROUP BY f.doc_id
    )
    SELECT e.doc_id, e.n_bytes, e.n_unique, e.entropy, md5(d.text) AS head_md5
    FROM ent e JOIN documents d ON d.doc_id = e.doc_id
    ORDER BY e.doc_id
    """,
    "training-data pipeline: multimodal feature extraction (mapInPandas)",
)
def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_payload(load(spark, sf_dir, "documents"), kind="image")
    feats = extract_features(media)
    return feats.select(
        "doc_id",
        "n_bytes",
        "n_unique",
        F.round("entropy", 3).alias("entropy"),
        "head_md5",
    ).transform(ordered, "doc_id")


@query(
    "q46_frame_sample",
    "video-style frame sampling: 64-byte frames, every 2nd, via mapInPandas",
    """
    WITH m AS (
        SELECT doc_id,
               CAST(CEIL(length(text) / 64.0) AS INT) AS n_frames,
               text
        FROM documents
    )
    SELECT doc_id,
           CAST((n_frames + 1) // 2 AS BIGINT) AS n_sampled,
           md5(substring(text, 1, 64)) AS first_md5,
           md5(substring(text, ((n_frames - 1) // 2) * 2 * 64 + 1, 64))
               AS last_md5
    FROM m ORDER BY doc_id
    """,
    "training-data pipeline: multimodal frame sampling (mapInPandas)",
)
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_payload(load(spark, sf_dir, "documents"), kind="video")
    frames = sample_frames(media, frame_size=64, every=2)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sampled"),
            F.md5(F.min_by("frame", "frame_idx")).alias("first_md5"),
            F.md5(F.max_by("frame", "frame_idx")).alias("last_md5"),
        )
        .transform(ordered, "doc_id")
    )


@query(
    "q49_decode_resize",
    "real codec path: encode PPM -> decode -> nearest-neighbor resize -> "
    "exact pixel sums, all via mapInPandas",
    # Oracle: the payload construction is documented (pixels = ASCII bytes
    # of text cycled to 8*8*3) and the resize index map is deterministic
    # (src = floor(dst * src_dim / dst_dim): 8->4 keeps rows/cols 0,2,4,6),
    # so SQL recomputes both sums from `text` alone while Spark runs the
    # genuine encode -> decode -> resize -> re-decode byte path.
    """
    WITH d AS (
        SELECT doc_id, text, len(text) AS L
        FROM documents WHERE len(text) > 0
    ),
    full_px AS (
        SELECT d.doc_id,
               SUM(ord(substring(d.text, CAST(r.i % d.L AS INT) + 1, 1)))
                   AS sum_px
        FROM d, range(192) r(i) GROUP BY d.doc_id
    ),
    rs_px AS (
        SELECT d.doc_id,
               SUM(ord(substring(d.text,
                   CAST(((2 * (r.j // 12)) * 8 + 2 * ((r.j % 12) // 3)) * 3
                        + (r.j % 3) AS INT) % CAST(d.L AS INT) + 1, 1)))
                   AS rs_sum
        FROM d, range(48) r(j) GROUP BY d.doc_id
    )
    SELECT f.doc_id, CAST(8 AS INT) AS w, CAST(8 AS INT) AS h,
           CAST(f.sum_px AS BIGINT) AS sum_px,
           CAST(r.rs_sum AS BIGINT) AS rs_sum
    FROM full_px f JOIN rs_px r USING (doc_id)
    ORDER BY doc_id
    """,
    "training-data pipeline: executable media decode (VERDICT r2 missing #1)",
)
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_ppm_payload(load(spark, sf_dir, "documents"), 8, 8)
    return decode_resize_stats(media, 4, 4).transform(ordered, "doc_id")
