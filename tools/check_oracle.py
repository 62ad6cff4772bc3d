"""Local differential harness — approximates the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, schema (column names sorted), and an
order-insensitive value comparison (columns sorted by name, rows sorted).

Usage:  python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize: floats rounded defensively, everything to str for stable sort
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            s = s.round(4)
        out[c] = s.astype(str)
    return out.sort_values(list(out.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    import __spark_entry__ as entrymod
    from hoard_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check", extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duck_con(sf_dir)

    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        sdf = fn(spark, sf_dir)
        spark_pd = sdf.toPandas()
        t1 = time.time()
        if name not in oracles:
            print(f"  {name}: rows={len(spark_pd)} (engine-only, no oracle) "
                  f"[{t1 - t0:.1f}s]")
            if len(spark_pd) == 0:
                failures.append((name, "engine-only query returned 0 rows"))
            continue
        duck_pd = con.execute(oracles[name]).fetchdf()
        problems = []
        if len(spark_pd) != len(duck_pd):
            problems.append(f"rows {len(spark_pd)} vs {len(duck_pd)}")
        if sorted(spark_pd.columns) != sorted(duck_pd.columns):
            problems.append(
                f"cols {sorted(spark_pd.columns)} vs {sorted(duck_pd.columns)}"
            )
        if not problems:
            a, b = canon(spark_pd), canon(duck_pd)
            if not a.equals(b):
                diff = (a != b).any(axis=1)
                idx = diff[diff].index[:3].tolist()
                detail = [
                    (i, a.loc[i].to_dict(), b.loc[i].to_dict()) for i in idx
                ]
                problems.append(f"values differ at rows {idx}: {detail}")
        status = "OK" if not problems else "FAIL " + "; ".join(str(p)[:400] for p in problems)
        print(f"  {name}: {status} [{t1 - t0:.1f}s]")
        if problems:
            failures.append((name, problems))

    print(f"\n{len(qs) - len(failures)}/{len(qs)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
