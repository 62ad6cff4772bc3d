"""Python UDTF surface — the declared table-function escape hatch.

SURVEY §2B's UDF/UDAF/UDTF row maps to Spark as: scalar/batch UDF =
Arrow-batched ``mapInPandas`` (multimodal stages), UDAF = aggregate
expressions / ``applyInPandasWithState`` (streaming LWW changelog),
UDTF = this module. A UDTF runs row-at-a-time in Python workers — the
SLOW path (no codegen, no vectorization) — so every production operator
prefers a built-in composition: ``q63`` chunks with
``sequence + posexplode + slice`` at codegen speed. The UDTF exists for
semantics Spark genuinely cannot express relationally (e.g. a
tokenizer with carry-over state across a doc's chunks); the test suite
pins its output equal to the codegen path on the shared case.

Usage::

    from hoard_spark.functions.udtf import register_udtfs
    register_udtfs(spark)
    spark.sql('''
        SELECT d.doc_id, c.chunk_idx, c.chunk_text
        FROM documents d, LATERAL chunk_words(d.text, 100, 80) c
    ''')
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk_text string")
class ChunkWords:
    """Sliding word-window chunker: window ``size`` words every
    ``stride`` words (same spec as q63: windows start at 0, stride
    apart, while a window's start is within the doc)."""

    def eval(self, text: str, size: int, stride: int):
        if text is None:
            return
        words = [w for w in text.strip().split() if w]
        if not words:
            return
        idx = 0
        for start in range(0, len(words), stride):
            yield idx, " ".join(words[start : start + size])
            idx += 1


def register_udtfs(spark) -> None:
    """Register every library UDTF on this session (idempotent)."""
    spark.udtf.register("chunk_words", ChunkWords)
