"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` in DuckDB over the
same parquet tables, compare row count + column names + order-insensitive
values.  Usage: ``python tools/parity.py [sf_dir] [query ...]``.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon(df: pd.DataFrame) -> list:
    cols = sorted(df.columns)
    out = []
    for _, row in df[cols].iterrows():
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(f"{v + 0.0:.6g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> str:
    if sorted(sdf.columns) != sorted(odf.columns):
        return f"SCHEMA: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    if len(sdf) != len(odf):
        return f"ROWS: spark={len(sdf)} oracle={len(odf)}"
    a, b = canon(sdf), canon(odf)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return f"VALUES: first diffs {diffs}"
    return ""


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from jena_spark.session import get_spark

    spark = get_spark(master="local[8]")
    con = duck_con(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"weak {name}: rows={len(sdf)} (no oracle)")
            n_weak += 1
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        msg = compare(name, sdf, odf)
        if msg:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
