"""Streaming incremental containment dedup (persistent posting store).

The batch q98 finds directed pairs with |A∩B| / |A| >= t — truncations,
quoted excerpts, docs embedded in compilations — over a fixed corpus; a
training-data ingest pipeline needs the online twin: *as documents
stream in, which already-ingested docs contain (or are contained in)
the new arrivals?* This operator maintains a persistent posting store
and, per micro-batch:

1. builds per-doc DISTINCT word-3-gram rows hashed to one long per gram
   (the novelty/neardup discipline — the store never keeps gram text; a
   hash collision can only add a candidate, and the verify is exact
   over the hashed sets),
2. ranks each doc's grams under a FIXED universal total order (the gram
   hash itself, ascending — unlike the batch family's df order, a
   streaming order must never change as the corpus grows; the prefix
   bound is exact under ANY shared total order, df is only a pruning
   heuristic),
3. generates candidates with three prefix-bounded equi-joins on the
   gram hash — new-A x store-B, store-A x new-B, new-A x new-B — with
   the SSJoin length filter riding each meeting,
4. verifies exactly (candidate-pruned collect_set + array_intersect:
   the store is the whole corpus, so this is precisely the
   candidate-sparse regime where pruning the verify pays; cf. the
   measured default in simjoin._candidate_sets), and
5. emits (a_id, b_id, inter, na, nb, containment, batch) pairs and
   admits the batch's posting rows (g, doc_id, r, n).

Each qualifying pair is emitted exactly once — in the batch where its
later member arrives (containment between two fixed docs never changes,
and batches only add docs — ENFORCED: a doc_id re-ingested with a
different gram set than the store holds is rejected with an error;
byte-identical replays pass), so the union of all emitted pairs equals
the batch ``containment_join`` over the full corpus (pinned in
tests/test_streaming_containment.py). Replays are idempotent: a
replayed batch excludes store rows its own earlier attempt admitted
(posting rows carry the admitting doc_id) and pairs dedupe by
(a_id, b_id) at read — the novelty/neardup store discipline.

Scale: the store is the corpus posting table (24 bytes/row, linear),
the same artifact the batch family materializes per corpus; per batch
the work is prefix-bounded posting meetings against the store plus a
candidate-proportional verify — never a corpus rescan.

No reference analog (src/hoard.coffee has no text surface); declared as
the round-9 streaming extension (VERDICT r8 item 9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hoard_spark.streaming.novelty import gram_hashes

_POST_SCHEMA = T.StructType(
    [
        T.StructField("g", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("r", T.IntegerType()),
        T.StructField("n", T.LongType()),
    ]
)

_PAIR_SCHEMA = (
    "a_id long, b_id long, inter long, na long, nb long, "
    "containment double, batch long"
)


def ranked_gram_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, text, …) → (g, doc_id, r, n): distinct hashed grams per
    doc, ranked under the fixed universal order (g ascending)."""
    from pyspark.sql import Window

    # distinct AFTER hashing: two grams colliding to one long must count
    # once, so n/r/inter all speak the same hashed-set algebra (a
    # collision can merge grams — a conservative, verify-checked effect —
    # but never double-count one)
    rows = gram_hashes(docs).distinct()
    w = Window.partitionBy("doc_id").orderBy("g")
    return rows.select(
        "g",
        "doc_id",
        F.row_number().over(w).cast("int").alias("r"),
        F.count("*").over(Window.partitionBy("doc_id")).alias("n"),
    )


class ContainmentIndex:
    """Persistent posting store + per-batch directed containment joiner.

    ``process_batch(docs)`` is directly usable as a ``foreachBatch``
    body; ``sink(stream)`` wires it to a streaming query.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        threshold: float = 0.9,
        min_size: int = 5,
    ):
        if not 0.0 < threshold <= 1.0:
            raise ValueError(f"threshold must be in (0, 1]: {threshold}")
        self.spark = spark
        self.threshold = threshold
        self.min_size = min_size
        self.path = path.rstrip("/")
        self.post_path = f"{self.path}/postings"
        self.pair_path = f"{self.path}/pairs"

    # -- store ------------------------------------------------------------
    def _read_or_empty(self, path: str, schema) -> DataFrame:
        from pyspark.errors import AnalysisException

        try:
            return self.spark.read.schema(schema).parquet(path)
        except AnalysisException as e:
            if "PATH_NOT_FOUND" in str(
                getattr(e, "errorClass", "") or str(e)
            ):
                return self.spark.createDataFrame([], schema)
            raise

    def postings(self) -> DataFrame:
        """The corpus posting store (g, doc_id, r, n). Replayed appends
        duplicate whole-doc row groups; any copy per (doc_id, g) is
        correct, so dedupe on the pair."""
        return self._read_or_empty(
            self.post_path, _POST_SCHEMA
        ).dropDuplicates(["doc_id", "g"])

    def pairs(self) -> DataFrame:
        """Emitted directed containment pairs (deduped under replays)."""
        return self._read_or_empty(
            self.pair_path, _PAIR_SCHEMA
        ).dropDuplicates(["a_id", "b_id"])

    # -- per-batch joiner ---------------------------------------------------
    def _prefix(self, posts: DataFrame) -> DataFrame:
        """A-side rows: the first n - ceil(t*n) + 1 grams of each doc
        (epsilon-slacked like simjoin._prefix_bound), min_size applied."""
        bound = (
            F.col("n")
            - F.ceil(F.lit(self.threshold) * F.col("n") - F.lit(1e-9))
            + 1
        )
        return posts.where(
            (F.col("r") <= bound) & (F.col("n") >= self.min_size)
        )

    def _meet(self, a: DataFrame, b: DataFrame) -> DataFrame:
        """Prefix(A) x full(B) posting meetings with the length filter
        riding the join; returns candidate (a_id, b_id) pairs."""
        la = a.select(
            F.col("doc_id").alias("a_id"),
            "g",
            F.col("n").alias("_na"),
        )
        lb = b.select(F.col("doc_id").alias("b_id"), "g", F.col("n").alias("_nb"))
        return (
            la.join(lb, "g")
            .where(
                (F.col("a_id") != F.col("b_id"))
                & (
                    F.col("_nb")
                    >= F.lit(self.threshold) * F.col("_na") - F.lit(1e-9)
                )
            )
            .select("a_id", "b_id")
        )

    def process_batch(self, docs: DataFrame, batch_id: int = 0) -> None:
        """Join ``docs`` (doc_id, text) against the store and within the
        batch, persist qualifying directed pairs, then admit the batch's
        posting rows."""
        rows = ranked_gram_rows(docs).persist()
        try:
            # Guard the append-only store invariant (ADVICE r9): a doc_id
            # already in the store may only be re-ingested byte-identically
            # (a replay). A DIFFERENT gram set would append alongside the
            # old rows and postings() would silently serve the union of
            # both versions. Fingerprint the overlap (count + bit_xor +
            # sum of the gram hashes — order-free, any single-gram change
            # moves at least one component) and reject on mismatch; the
            # check joins only the re-ingested ids, so a normal
            # only-adds-docs batch aggregates an empty frame.
            def _fp(df: DataFrame, tag: str) -> DataFrame:
                # decimal sum: g spans the full long range, a plain long
                # SUM overflows under ANSI mode
                return df.groupBy("doc_id").agg(
                    F.count("*").alias(f"_c{tag}"),
                    F.expr("bit_xor(g)").alias(f"_x{tag}"),
                    F.sum(F.col("g").cast("decimal(38,0)")).alias(
                        f"_s{tag}"
                    ),
                )

            prev = self.postings().join(
                rows.select("doc_id").distinct(), "doc_id", "left_semi"
            )
            conflicts = [
                r["doc_id"]
                for r in _fp(prev, "0")
                .join(_fp(rows, "1"), "doc_id")
                .where(
                    (F.col("_c0") != F.col("_c1"))
                    | (F.col("_x0") != F.col("_x1"))
                    | (F.col("_s0") != F.col("_s1"))
                )
                .select("doc_id")
                .limit(5)
                .collect()
            ]
            if conflicts:
                raise ValueError(
                    "ContainmentIndex: doc_ids re-ingested with a "
                    f"different gram set than the store holds: {conflicts}"
                    " — the posting store is append-only; only "
                    "byte-identical replays of an existing doc_id are "
                    "allowed (re-key changed documents)"
                )
            # replay discipline: drop store rows admitted by this batch's
            # own earlier attempt (posting rows carry the admitting doc)
            store = (
                self.postings()
                .join(
                    rows.select("doc_id").distinct(), "doc_id", "left_anti"
                )
                .persist()
            )
            new_pre, old_pre = self._prefix(rows), self._prefix(store)
            cand = (
                self._meet(new_pre, store)
                .unionByName(self._meet(old_pre, rows))
                .unionByName(self._meet(new_pre, rows))
                .distinct()
                .persist()
            )
            # exact verify over candidate docs only (store = corpus: the
            # candidate-sparse regime where pruning the collect_set pays)
            ids = (
                cand.select(F.col("a_id").alias("doc_id"))
                .unionByName(cand.select(F.col("b_id").alias("doc_id")))
                .distinct()
            )
            sets = (
                rows.unionByName(store)
                .join(ids, "doc_id", "left_semi")
                .groupBy("doc_id")
                .agg(
                    F.collect_set("g").alias("_set"),
                    F.count("*").alias("_n"),
                )
            )
            inter = F.size(F.array_intersect("_sa", "_sb"))
            cont = inter.cast("double") / F.col("na").cast("double")
            out = (
                cand.join(
                    sets.select(
                        F.col("doc_id").alias("a_id"),
                        F.col("_set").alias("_sa"),
                        F.col("_n").alias("na"),
                    ),
                    "a_id",
                )
                .join(
                    sets.select(
                        F.col("doc_id").alias("b_id"),
                        F.col("_set").alias("_sb"),
                        F.col("_n").alias("nb"),
                    ),
                    "b_id",
                )
                .where(cont >= self.threshold)
                .select(
                    "a_id",
                    "b_id",
                    inter.cast("long").alias("inter"),
                    "na",
                    "nb",
                    F.round(cont.cast("decimal(25,10)"), 4)
                    .cast("double")
                    .alias("containment"),
                    F.lit(batch_id).cast("long").alias("batch"),
                )
            )
            out.write.mode("append").parquet(self.pair_path)
            rows.write.mode("append").parquet(self.post_path)
        finally:
            rows.unpersist()
            try:
                store.unpersist()
                cand.unpersist()
            except NameError:
                pass

    # -- streaming wiring -------------------------------------------------
    def sink(self, stream_docs: DataFrame, checkpoint: str):
        """writeStream.foreachBatch over ``process_batch``."""
        return (
            stream_docs.writeStream.foreachBatch(
                lambda b, bid: self.process_batch(b, bid)
            )
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
