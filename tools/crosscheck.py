#!/usr/bin/env python
"""Driver-style correctness cross-check: run each __spark_entry__ query on
Spark and its oracle_sql on DuckDB over the same sf dir, compare row count,
column names/dtypes, and a sorted value hash — the same three gates the
round driver records in CORRECTNESS_r{N}.json.

Usage: python tools/crosscheck.py [sf_dir] [query ...]
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = [
        tuple(None if pd.isna(v) else v for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    rows.sort(key=repr)
    return hashlib.md5(repr(rows).encode()).hexdigest()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        if out[c].dtype == object:
            pass
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from crawlspark.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=8, driver_mem="8g",
                      app="crosscheck")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    fails = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles:
            print(f"{name}: NO ORACLE (rows-only)")
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            fails += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name}: DUCKDB ERROR {type(e).__name__}: {str(e)[:300]}")
            fails += 1
            continue
        rows = len(sdf) == len(odf)
        cols = sorted(sdf.columns) == sorted(odf.columns)
        dtypes_s = {c: str(sdf[c].dtype) for c in sdf.columns}
        dtypes_o = {c: str(odf[c].dtype) for c in odf.columns}
        schema = cols and dtypes_s == dtypes_o
        h = value_hash(norm(sdf)) == value_hash(norm(odf)) if cols else False
        status = "OK" if (rows and schema and h) else "FAIL"
        if status == "FAIL":
            fails += 1
        print(
            f"{name}: {status} rows={len(sdf)}/{len(odf)} "
            f"cols_match={cols} dtypes_match={dtypes_s == dtypes_o} "
            f"hash={h}"
        )
        if not schema and cols:
            diff = {
                c: (dtypes_s[c], dtypes_o[c])
                for c in dtypes_s
                if dtypes_s[c] != dtypes_o.get(c)
            }
            print(f"    dtype diff: {diff}")
        if cols and not h and len(sdf) == len(odf) and len(sdf) > 0:
            sc = sorted(sdf.columns)
            s1 = sdf[sc].sort_values(sc).reset_index(drop=True)
            s2 = odf[sc].sort_values(sc).reset_index(drop=True)
            neq = (s1 != s2) & ~(s1.isna() & s2.isna())
            bad = neq.any(axis=1)
            print(f"    first diffs:\n{s1[bad].head(3)}\n    vs\n{s2[bad].head(3)}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
