"""Raw media ingestion — ``binaryFile`` directory scans → payload rows.

The multimodal plumbing (``hoard_spark.multimodal``) carries media as
opaque ``binary`` payloads with a typed metadata struct; this connector
produces those rows from a directory tree of real files, the way a lake
ingests scraped images/audio:

- ``spark.read.format("binaryFile")`` scans distribute over executors
  (one task per file group) and prune the ``content`` column when a
  query reads only metadata — a listing-only pass never touches bytes.
- ``doc_id`` is ``xxhash64(path)``: stable across re-ingests, so
  downstream dedup/joins key on it without a driver-side id assignment
  (a sequence would serialize ingestion at 100 TB).
- Header parsing (width/height/frames) is opt-in and runs through the
  pluggable codec registry in Arrow-batched ``mapInPandas`` — the same
  declared Python stage as feature extraction; off by default so the
  metadata-only path stays JVM-side.

No reference analog (the reference reads only its own ring files,
src/hoard.coffee:399-424); declared round-3 source extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hoard_spark.multimodal import MEDIA_META_SCHEMA, decode_media

_EXT_KIND = {"ppm": "image", "wav": "audio"}


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str = "*",
    parse_headers: bool = False,
) -> DataFrame:
    """Directory of media files → (doc_id, path, payload, media).

    ``media`` follows ``MEDIA_META_SCHEMA``; kind comes from the file
    extension, ``n_bytes`` from the file length (no content read
    needed). With ``parse_headers=True`` the registered codec decodes
    each payload to fill width/height/n_frames.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    ext = F.lower(F.element_at(F.split("path", "\\."), -1))
    kind_expr = F.coalesce(
        *[
            F.when(ext == e, F.lit(k))
            for e, k in _EXT_KIND.items()
        ],
        F.lit("unknown"),
    )
    base = raw.select(
        F.xxhash64("path").alias("doc_id"),
        "path",
        F.col("content").alias("payload"),
        F.struct(
            kind_expr.alias("kind"),
            F.col("length").cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("media"),
    )
    if not parse_headers:
        return base
    out_schema = (
        "doc_id long, path string, payload binary, media struct<"
        "kind: string, n_bytes: bigint, width: int, height: int, "
        "n_frames: int>"
    )
    assert [f.name for f in MEDIA_META_SCHEMA.fields] == [
        "kind", "n_bytes", "width", "height", "n_frames",
    ]

    def parse(batches):
        for pdf in batches:
            metas = []
            for m, payload in zip(pdf["media"], pdf["payload"]):
                m = dict(m)
                try:
                    decoded = decode_media(bytes(payload), m["kind"])
                except Exception:
                    metas.append(m)
                    continue
                if m["kind"] == "image":
                    # decoded: (h, w, 3) uint8 array
                    m["height"], m["width"] = (
                        int(decoded.shape[0]),
                        int(decoded.shape[1]),
                    )
                    m["n_frames"] = 1
                elif m["kind"] == "audio":
                    # decoded: (samples, rate)
                    m["n_frames"] = int(len(decoded[0]))
                metas.append(m)
            pdf = pdf.assign(media=metas)
            yield pdf

    return base.mapInPandas(parse, out_schema)
