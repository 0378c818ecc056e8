"""Local mimic of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row-count,
column names, and order-insensitive values (floats rounded).

Usage: python tools/check_gate.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif np.issubdtype(pdf[c].dtype, np.floating):
            pdf[c] = pdf[c].round(6)
        elif str(pdf[c].dtype).startswith("datetime"):
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from lucille_spark.session import get_spark

    spark = get_spark("gate-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"OK?   {name}: rows-only check, {len(got)} rows")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            failures.append((name, f"schema {list(g.columns)} vs {list(w.columns)}"))
            print(f"FAIL  {name}: schema {list(g.columns)} vs {list(w.columns)}")
            continue
        if len(g) != len(w):
            failures.append((name, f"rows {len(g)} vs {len(w)}"))
            print(f"FAIL  {name}: rows {len(g)} vs {len(w)}")
            continue
        if not g.equals(w):
            diff = (g != w) & ~(g.isna() & w.isna())
            ndiff = int(diff.to_numpy().sum())
            failures.append((name, f"{ndiff} differing cells"))
            print(f"FAIL  {name}: {ndiff} differing cells")
            for col in g.columns:
                if diff[col].any():
                    i = diff[col].idxmax()
                    print(f"      first diff col={col} row={i}: "
                          f"spark={g[col][i]!r} duckdb={w[col][i]!r}")
            continue
        print(f"PASS  {name}: {len(g)} rows")

    print(f"\n{len(failures)} failures / {len(queries)} entries")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
