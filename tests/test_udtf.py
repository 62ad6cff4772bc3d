"""UDTF escape hatch (hoard_spark/functions/udtf.py).

The Python chunker must agree exactly with q63's codegen chunker on
the shared spec — the UDTF is the semantic reference, the codegen form
is the production path.
"""

import os

from hoard_spark.functions.udtf import register_udtfs
from hoard_spark.queries import all_queries

SF = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")


def test_udtf_matches_codegen_chunker(spark):
    register_udtfs(spark)
    spark.read.parquet(f"{SF}/documents.parquet").createOrReplaceTempView(
        "udtf_docs"
    )
    got = {
        (r["doc_id"], r["chunk_idx"], r["n_words"], r["chunk_md5"])
        for r in spark.sql(
            """
            SELECT d.doc_id,
                   c.chunk_idx,
                   size(split(c.chunk_text, ' ')) AS n_words,
                   md5(c.chunk_text) AS chunk_md5
            FROM udtf_docs d, LATERAL chunk_words(d.text, 100, 80) c
            """
        ).collect()
    }
    want = {
        (r["doc_id"], r["chunk_idx"], r["n_words"], r["chunk_md5"])
        for r in all_queries()["q63_chunking"].spark_fn(spark, SF).collect()
    }
    assert got == want and got


def test_udtf_handles_null_and_empty(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, None), (2, ""), (3, "  "), (4, "one two")],
        "doc_id long, text string",
    ).createOrReplaceTempView("udtf_edge")
    rows = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_text
        FROM udtf_edge d, LATERAL chunk_words(d.text, 3, 2) c
        """
    ).collect()
    assert {(r["doc_id"], r["chunk_text"]) for r in rows} == {(4, "one two")}
