"""Exact thresholded set-similarity join with prefix filtering.

The scale path for EXACT near-duplicate detection at a declared
threshold: the q37-style inverted-index join meets a doc pair once per
shared shingle, so its work is Σ_s df(s)² over ALL shingles. Prefix
filtering (Chaudhuri et al. SSJoin; Bayardo et al. "Scaling Up All
Pairs Similarity Search", WWW'07 — public literature) bounds that by
the threshold: order every doc's shingle set by a global frequency
order (rarest first) and emit only its first

    prefix(|s|) = |s| − ⌈t·|s|⌉ + 1

shingles as join keys. Two sets with Jaccard ≥ t must overlap in ≥
⌈t·max(|a|,|b|)⌉ elements, so under a SHARED total order their prefixes
must share at least one element — no qualifying pair is lost. Candidate
generation therefore costs Σ_s df_prefix(s)², which at t=0.8 touches
~1/5 of each posting list and kills the Zipf head (frequent shingles
sort LAST and rarely make a prefix).

Verification is exact and pair-local: candidates fetch both docs'
shingle arrays (two hash joins on doc_id; arrays are doc-sized, i.e.
KB) and compute |a∩b| with ``array_intersect`` JVM-side — no second
pass over posting lists, no driver involvement.

Why q37 itself cannot use this: its contract is GLOBAL top-10 with no
threshold, and the corpus's 10th-best Jaccard is noise-level (~0.02 at
sf0.01), so any prefix length that prunes would also prune members of
the answer. Prefix filtering is a thresholded-join tool; the top-k twin
keeps the full posting join + AQE skew handling.

No reference analog (src/hoard.coffee has no similarity surface); this
is part of the training-data curation family (SURVEY.md §2C).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def jaccard_similarity_join(
    shingles: DataFrame,
    threshold: float,
    doc_col: str = "doc_id",
    set_col: str = "s",
    block: list[str] | None = None,
) -> DataFrame:
    """All pairs of docs with exact Jaccard(shingle sets) >= threshold.

    ``shingles``: one row per DISTINCT (doc, shingle), e.g.
    ``shingle_rows_of`` output. ``block``: optional equality columns
    (e.g. lang/source) that qualifying pairs must share — they join the
    candidate key, so df ranks are computed per block too.

    Output: ``a_id, b_id (a<b), inter, na, nb, jaccard`` — exact, every
    pair ≥ threshold, no false negatives (prefix-filter guarantee).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    block = list(block or [])
    sh = shingles.select(doc_col, *block, set_col)

    # Global (per-block) frequency order, rarest first; ties broken by
    # the shingle value so the order is total and identical for all docs.
    df_rank = sh.groupBy(*block, set_col).agg(F.count("*").alias("_df"))
    ordered = sh.join(df_rank, [*block, set_col])
    w_doc = Window.partitionBy(doc_col).orderBy("_df", set_col)
    ranked = ordered.select(
        doc_col,
        *block,
        set_col,
        F.row_number().over(w_doc).alias("_r"),
        F.count("*").over(Window.partitionBy(doc_col)).alias("_n"),
    )
    # prefix(|s|) = |s| - ceil(t*|s|) + 1
    prefix = ranked.where(
        F.col("_r")
        <= F.col("_n") - F.ceil(F.lit(threshold) * F.col("_n")) + 1
    )

    a = prefix.select(
        F.col(doc_col).alias("a_id"), *block, set_col
    )
    b = prefix.select(
        F.col(doc_col).alias("b_id"), *block, set_col
    )
    cand = (
        a.join(b, [*block, set_col])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )

    # Exact verify: doc-sized shingle arrays, JVM array_intersect.
    sets = sh.groupBy(doc_col).agg(
        F.collect_set(set_col).alias("_set"), F.count("*").alias("_n")
    )
    sa = sets.select(
        F.col(doc_col).alias("a_id"),
        F.col("_set").alias("_sa"),
        F.col("_n").alias("na"),
    )
    sb = sets.select(
        F.col(doc_col).alias("b_id"),
        F.col("_set").alias("_sb"),
        F.col("_n").alias("nb"),
    )
    inter = F.size(F.array_intersect("_sa", "_sb"))
    jac = inter.cast("double") / (
        (F.col("na") + F.col("nb")).cast("double") - inter.cast("double")
    )
    return (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .where(jac >= threshold)  # unrounded — matches the SQL twin
        .select(
            "a_id",
            "b_id",
            inter.alias("inter"),
            "na",
            "nb",
            F.round(jac, 4).alias("jaccard"),
        )
    )


def prefix_length(set_size: int, threshold: float) -> int:
    """The prefix-filter bound, exposed for tests/diagnostics."""
    return set_size - math.ceil(threshold * set_size) + 1
