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
# SCALE multiplies every cardinality (VERDICT r10 stretch 8: the sf10
# decade is SCALE=10 of this generator — same distributions, 100x the
# driver's sf0.1). --no-relational skips the TPC-H-ish tables (the
# heavy dedup/ANN/ingest family reads only documents/events/embeddings,
# and 60M lineitem rows would dominate generation time for nothing).
SCALE = int(sys.argv[2]) if len(sys.argv) > 2 else 1
SKIP_RELATIONAL = "--no-relational" in sys.argv
N_DOCS = 50_000 * SCALE
N_EVENTS = 1_000_000 * SCALE
N_VECS = 20_000 * SCALE
N_USERS = 15_000 * SCALE
DIM = 64

# Relational (TPC-H-ish) tables at 10x sf0.1 — VERDICT r8 item 6 wants
# the WHOLE suite timed at sf1, and the relational/window family had no
# off-sf0.1 measurement. Cardinalities and value distributions mirror
# the measured testdata (uniform thirds for o_orderstatus/l_returnflag,
# halves for l_linestatus, 0.01-step discounts, integer quantities
# 1-50, uniform dates over the same spans, keys uniform over the parent
# domain); region/nation are fixed dimension tables copied verbatim.
N_CUST = 150_000 * SCALE
N_SUPP = 10_000 * SCALE
N_PART = 200_000 * SCALE
N_ORDERS = 1_500_000 * SCALE
N_LINES = 6_000_000 * SCALE

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
                rng.integers(0, N_USERS, size=N_EVENTS), pa.int64()
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


_SEGMENTS = np.array(
    ["AUTOMOBILE", "BUILDING", "HOUSEHOLD", "MACHINERY", "FURNITURE"]
)
_PRIORITIES = np.array(
    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
)
_P_TYPES = np.array(
    ["ECONOMY", "MEDIUM", "SMALL", "PROMO", "LARGE", "STANDARD"]
)
_ADJ = "large hot blue red green small cold dim shiny matte".split()
_NOUN = "ring bolt nut gear cog pin rod cap disk plate".split()


def _days(rng, lo: str, hi: str, size: int) -> np.ndarray:
    a = np.datetime64(lo, "D")
    span = (np.datetime64(hi, "D") - a) // np.timedelta64(1, "D") + 1
    return (a + rng.integers(0, int(span), size=size)).astype(
        "datetime64[us]"
    )


def gen_relational(rng: np.random.Generator) -> dict[str, pa.Table]:
    cust = pa.table({
        "c_custkey": pa.array(np.arange(N_CUST), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(N_CUST)]),
        "c_nationkey": pa.array(
            rng.integers(0, 25, size=N_CUST), pa.int32()
        ),
        "c_acctbal": pa.array(
            np.round(rng.uniform(-1000, 10000, size=N_CUST), 2)
        ),
        "c_mktsegment": pa.array(rng.choice(_SEGMENTS, size=N_CUST)),
    })
    supp = pa.table({
        "s_suppkey": pa.array(np.arange(N_SUPP), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(N_SUPP)]),
        "s_nationkey": pa.array(
            rng.integers(0, 25, size=N_SUPP), pa.int32()
        ),
        "s_acctbal": pa.array(
            np.round(rng.uniform(-1000, 10000, size=N_SUPP), 2)
        ),
    })
    part = pa.table({
        "p_partkey": pa.array(np.arange(N_PART), pa.int64()),
        "p_name": pa.array([
            f"{_ADJ[int(a)]} {_NOUN[int(b)]}"
            for a, b in zip(
                rng.integers(0, 10, size=N_PART),
                rng.integers(0, 10, size=N_PART),
            )
        ]),
        "p_brand": pa.array(
            np.char.add("Brand#", rng.integers(0, 25, size=N_PART).astype(str))
        ),
        "p_type": pa.array(rng.choice(_P_TYPES, size=N_PART)),
        "p_size": pa.array(rng.integers(1, 51, size=N_PART), pa.int32()),
        "p_retailprice": pa.array(
            np.round(rng.uniform(900, 1000, size=N_PART), 2)
        ),
    })
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(N_ORDERS), pa.int64()),
        "o_custkey": pa.array(
            rng.integers(0, N_CUST, size=N_ORDERS), pa.int64()
        ),
        "o_orderstatus": pa.array(
            rng.choice(np.array(["O", "P", "F"]), size=N_ORDERS)
        ),
        "o_totalprice": pa.array(
            np.round(rng.uniform(1000, 500000, size=N_ORDERS), 2)
        ),
        "o_orderdate": pa.array(
            _days(rng, "1995-01-01", "2001-08-01", N_ORDERS)
        ),
        "o_orderpriority": pa.array(
            rng.choice(_PRIORITIES, size=N_ORDERS)
        ),
    })
    line = pa.table({
        "l_orderkey": pa.array(
            rng.integers(0, N_ORDERS, size=N_LINES), pa.int64()
        ),
        "l_partkey": pa.array(
            rng.integers(0, N_PART, size=N_LINES), pa.int64()
        ),
        "l_suppkey": pa.array(
            rng.integers(0, N_SUPP, size=N_LINES), pa.int64()
        ),
        "l_linenumber": pa.array(
            rng.integers(1, 8, size=N_LINES), pa.int32()
        ),
        "l_quantity": pa.array(
            rng.integers(1, 51, size=N_LINES).astype(np.float64)
        ),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(900, 105000, size=N_LINES), 2)
        ),
        "l_discount": pa.array(
            np.round(rng.integers(0, 11, size=N_LINES) * 0.01, 2)
        ),
        "l_tax": pa.array(
            np.round(rng.integers(0, 9, size=N_LINES) * 0.01, 2)
        ),
        "l_returnflag": pa.array(
            rng.choice(np.array(["R", "N", "A"]), size=N_LINES)
        ),
        "l_linestatus": pa.array(
            rng.choice(np.array(["O", "F"]), size=N_LINES)
        ),
        "l_shipdate": pa.array(
            _days(rng, "1995-01-02", "2001-11-04", N_LINES)
        ),
    })
    return {
        "customer": cust, "supplier": supp, "part": part,
        "orders": orders, "lineitem": line,
    }


SPLITS = int(os.environ.get("HOARD_GEN_SPLITS", "32"))


def write_split(tbl: pa.Table, path: str, splits: int = SPLITS) -> None:
    """Write a table as a DIRECTORY of ``splits`` contiguous row-slice
    files (part-00000.parquet ... in row order) instead of one file/one
    row group: the single-file layout started every sf1/sf10 scan on
    ONE core until the first shuffle, which both set an artificial
    per-doc floor (q53: 15-20 s serial fan-in) and forced ``spread()``
    workarounds into the measurement path (VERDICT r12 item 5). Same
    rows, same order — only the file layout changes."""
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.exists(path):
        os.remove(path)
    os.makedirs(path)
    n = tbl.num_rows
    k = max(1, min(splits, n))  # never write empty part files
    bounds = [n * i // k for i in range(k + 1)]
    for i in range(k):
        pq.write_table(
            tbl.slice(bounds[i], bounds[i + 1] - bounds[i]),
            f"{path}/part-{i:05d}.parquet",
        )


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(421)
    write_split(gen_documents(rng), f"{OUT}/documents.parquet")
    write_split(gen_events(rng), f"{OUT}/events.parquet")
    write_split(gen_embeddings(rng), f"{OUT}/embeddings.parquet")
    if not SKIP_RELATIONAL:
        for name, tbl in gen_relational(rng).items():
            write_split(tbl, f"{OUT}/{name}.parquet")
        # fixed dimension tables: identical at every SF — copy verbatim
        # (25/5 rows; splitting them would only add file-listing cost)
        for name in ("region", "nation"):
            pq.write_table(
                pq.read_table(f"/root/testdata/sf0.1/{name}.parquet"),
                f"{OUT}/{name}.parquet",
            )
    print(
        f"wrote {OUT}: {N_DOCS} docs, {N_EVENTS} events, {N_VECS} vecs, "
        f"{N_CUST} cust, {N_SUPP} supp, {N_PART} part, {N_ORDERS} orders, "
        f"{N_LINES} lineitem"
    )


if __name__ == "__main__":
    main()
