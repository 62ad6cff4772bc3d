"""JSONL/CSV corpus connector (hoard_spark/sources/documents).

Round-trip each wire format against the canonical parquet testdata,
and pin the corrupt-record policy: permissive quarantines (no silent
row loss), failfast raises.
"""

import os

import pytest
from pyspark.sql import functions as F

from hoard_spark.sources.documents import (
    read_documents,
    split_corrupt,
    write_documents,
)

SF_SMOKE = os.environ.get(
    "SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001"
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def _canon(df):
    return sorted(
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in df.collect()
    )


@pytest.mark.parametrize("fmt", ["jsonl", "csv", "parquet"])
def test_round_trip(spark, docs, tmp_path, fmt):
    path = str(tmp_path / f"corpus_{fmt}")
    write_documents(docs, path, fmt=fmt, partition_by=None)
    good, bad = split_corrupt(read_documents(spark, path, fmt=fmt))
    assert bad.count() == 0
    assert _canon(good) == _canon(docs)


def test_jsonl_missing_n_chars_is_derived(spark, tmp_path):
    path = str(tmp_path / "nochars")
    spark.createDataFrame(
        [(1, "hello world", "en", "web")],
        "doc_id long, text string, lang string, source string",
    ).write.json(path)
    good, _ = split_corrupt(read_documents(spark, path, fmt="jsonl"))
    assert good.first()["n_chars"] == 11


def test_permissive_quarantines_corrupt_lines(spark, tmp_path):
    path = tmp_path / "mixed"
    path.mkdir()
    (path / "part-0.jsonl").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "web"}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "also ok", "lang": "de", "source": "web"}\n'
    )
    good, bad = split_corrupt(read_documents(spark, str(path), fmt="jsonl"))
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
    assert bad.count() == 1
    assert "not json" in bad.first()["_corrupt_record"]


def test_failfast_raises_on_corrupt(spark, tmp_path):
    path = tmp_path / "bad"
    path.mkdir()
    (path / "part-0.jsonl").write_text("definitely not json\n")
    with pytest.raises(Exception):
        read_documents(spark, str(path), fmt="jsonl", mode="failfast").collect()


def test_partitioned_write_prunes_on_lang(spark, docs, tmp_path):
    path = str(tmp_path / "by_lang")
    write_documents(docs, path, fmt="parquet", partition_by="lang")
    one = spark.read.parquet(path).where(F.col("lang") == "en")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0], plan


def _jsonl_doc(doc_id, text):
    return (
        f'{{"doc_id": {doc_id}, "text": "{text}", '
        f'"lang": "en", "source": "web"}}\n'
    )


def test_stream_documents_jsonl(spark, tmp_path):
    """Streaming twin: same schema, n_chars derivation, corrupt rows
    carried (not dropped) — driven through a real availableNow stream."""
    from hoard_spark.sources.documents import stream_documents

    src = tmp_path / "drop"
    src.mkdir()
    (src / "a.jsonl").write_text(
        _jsonl_doc(1, "hello world") + "garbage line\n" + _jsonl_doc(2, "x y")
    )
    out = str(tmp_path / "out")
    q = (
        stream_documents(spark, str(src), fmt="jsonl")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 3
    rows = {r["doc_id"]: r for r in got.collect()}
    assert rows[1]["n_chars"] == 11 and rows[2]["n_chars"] == 3
    bad = [r for r in rows.values() if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and "garbage" in bad[0]["_corrupt_record"]


def test_stream_documents_feeds_neardup_index(spark, tmp_path):
    """Connector + streaming near-dup compose: a JSONL drop directory
    streams through the index and the planted clone is caught online."""
    from hoard_spark.sources.documents import stream_documents
    from hoard_spark.streaming.neardup import NearDupIndex

    def words(seed):
        return " ".join(f"{seed}w{i}" for i in range(60))

    src = tmp_path / "drop"
    src.mkdir()
    (src / "a.jsonl").write_text(
        "".join(_jsonl_doc(i, words(f"s{i}")) for i in range(1, 6))
    )
    index = NearDupIndex(spark, str(tmp_path / "nd"), threshold=0.7)
    stream = lambda: stream_documents(spark, str(src), fmt="jsonl").select(
        "doc_id", "text"
    )
    q = index.sink(stream(), str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert index.matches().count() == 0

    (src / "b.jsonl").write_text(_jsonl_doc(6, words("s2")))
    q = index.sink(stream(), str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = {
        (r["new_id"], r["matched_id"]) for r in index.matches().collect()
    }
    assert got == {(6, 2)}
