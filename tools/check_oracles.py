"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, column names, and an
order-insensitive value digest. Use while iterating so oracle drift is caught
before the round's CORRECTNESS_r{N}.json does.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def digest(df: pd.DataFrame) -> tuple:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)
    body = pd.util.hash_pandas_object(df.astype(str), index=False).sum()
    return len(df), tuple(df.columns), int(body)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from sql_etl_pipeline_spark.session import build_session

    spark = build_session("check-oracles", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"ok?   {name}: rows={len(got)} (rows-only, no oracle) [{t1-t0:.1f}s]")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        dg, de = digest(got), digest(exp)
        if dg == de:
            print(f"PASS  {name}: rows={dg[0]} [{t1-t0:.1f}s]")
        else:
            failures.append(name)
            print(f"FAIL  {name}: spark(rows={dg[0]}, cols={dg[1]}, h={dg[2]})")
            print(f"      vs duck(rows={de[0]}, cols={de[1]}, h={de[2]})")
            if dg[0] == de[0] and dg[1] == de[1]:
                g = got[sorted(got.columns)].sort_values(by=sorted(got.columns)).reset_index(drop=True)
                e = exp[sorted(exp.columns)].sort_values(by=sorted(exp.columns)).reset_index(drop=True)
                for c in g.columns:
                    if not g[c].astype(str).equals(e[c].astype(str)):
                        diff = (g[c].astype(str) != e[c].astype(str))
                        i = diff.idxmax()
                        print(f"      first diff col={c} row={i}: spark={g[c][i]!r} duck={e[c][i]!r} (n_diff={int(diff.sum())})")
    print(f"\n{'ALL PASS' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
