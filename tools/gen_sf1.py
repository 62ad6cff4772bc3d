"""Generate a GENUINE-cardinality sf1 corpus (10x sf0.1) into /tmp.

VERDICT r7 item 8 asks for the heavy-family scaling run on real 10x
data, not the replicated-corpus stress: replication keeps the distinct
shingle/user/vector cardinalities of sf0.1, which understates shuffle
and posting-list growth. This generator draws FRESH samples from the
same distributions as the driver's testdata (measured: 31-word uniform
vocabulary, uniform 10-100 words/doc, lang mix en~40%/4x15%, 20
sources, 5 event types over 30 days, 64-dim float embeddings), so every
cardinality grows the way an organically 10x corpus would. ~1% of docs
are near-duplicate mutations (3 token edits) so the near-dup family has
genuine positives at scale, mirroring the testdata's own dup density.

Deterministic (seed 421). Writes /tmp/hoard_sf1/{documents,events,
embeddings}.parquet. Read-only testdata is untouched.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hoard_sf1"
N_DOCS = 50_000
N_EVENTS = 1_000_000
N_VECS = 20_000
DIM = 64

VOCAB = np.array(
    """spark window merge table column vector stream value batch part line
    order small sort fast scan hash slow group agg filter query big key row
    data a code node disk plan""".split()
)
assert len(VOCAB) == 31
LANGS = np.array(["en", "de", "es", "fr", "zh"])
LANG_P = np.array([0.40, 0.15, 0.15, 0.15, 0.15])


def gen_documents(rng: np.random.Generator) -> pa.Table:
    lens = rng.integers(10, 101, size=N_DOCS)
    texts = [
        " ".join(VOCAB[rng.integers(0, len(VOCAB), size=n)]) for n in lens
    ]
    # ~1% near-duplicate mutations of an earlier doc (3 token edits)
    n_dup = N_DOCS // 100
    for i in rng.choice(np.arange(N_DOCS // 2, N_DOCS), n_dup, replace=False):
        src = int(rng.integers(0, N_DOCS // 2))
        toks = texts[src].split()
        for _ in range(3):
            toks[int(rng.integers(0, len(toks)))] = str(
                VOCAB[int(rng.integers(0, len(VOCAB)))]
            )
        texts[int(i)] = " ".join(toks)
    langs = rng.choice(LANGS, size=N_DOCS, p=LANG_P)
    sources = np.char.add("src", rng.integers(0, 20, size=N_DOCS).astype(str))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(N_DOCS), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(sources),
            "n_chars": pa.array(
                np.array([len(t) for t in texts]), pa.int64()
            ),
        }
    )


def gen_events(rng: np.random.Generator) -> pa.Table:
    base = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 30 * 86400 * 1_000_000
    ts = base + rng.integers(0, span_us, size=N_EVENTS).astype(
        "timedelta64[us]"
    )
    ts.sort()
    types = np.char.add(
        "evt_", rng.integers(0, 5, size=N_EVENTS).astype(str)
    )
    return pa.table(
        {
            "event_id": pa.array(np.arange(N_EVENTS), pa.int64()),
            "ts": pa.array(ts),
            "user_id": pa.array(
                rng.integers(0, 15_000, size=N_EVENTS), pa.int64()
            ),
            "event_type": pa.array(types),
            "value": pa.array(rng.uniform(0, 100, size=N_EVENTS)),
            "props": pa.array(["{}"] * N_EVENTS),
        }
    )


def gen_embeddings(rng: np.random.Generator) -> pa.Table:
    vecs = rng.standard_normal((N_VECS, DIM)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(N_VECS), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(
                rng.integers(0, 10, size=N_VECS), pa.int32()
            ),
        }
    )


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(421)
    pq.write_table(gen_documents(rng), f"{OUT}/documents.parquet")
    pq.write_table(gen_events(rng), f"{OUT}/events.parquet")
    pq.write_table(gen_embeddings(rng), f"{OUT}/embeddings.parquet")
    print(f"wrote {OUT}: {N_DOCS} docs, {N_EVENTS} events, {N_VECS} vecs")


if __name__ == "__main__":
    main()
