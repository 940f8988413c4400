"""Replicates the driver's correctness gate locally: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet views,
compare row count, schema width, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows — mirrors an
    order-insensitive value-hash comparison."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        else:
            out[c] = s.astype("string")
    df = pd.DataFrame(out)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]

    from pgspark_index.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app="check_oracles", cores=8, shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-spark] {name}: {str(e)[:300]}")
            continue
        if name not in sqls:
            print(f"[rows-only] {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(sqls[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL-duck] {name}: {str(e)[:300]}")
            continue
        a, b = normalize_frame(sdf), normalize_frame(odf)
        status = "OK"
        if len(a) != len(b):
            status = f"ROWCOUNT {len(a)} vs {len(b)}"
        elif list(a.columns) != list(b.columns):
            status = f"SCHEMA {list(a.columns)} vs {list(b.columns)}"
        elif not a.equals(b):
            neq = (a != b).any(axis=1)
            status = f"VALUES ({int(neq.sum())} differing rows)"
            ex = pd.concat([a[neq].head(3), b[neq].head(3)], axis=1)
            print(ex)
        if status != "OK":
            failures.append((name, status))
            print(f"[FAIL] {name}: {status} ({time.time()-t0:.1f}s)")
        else:
            print(f"[ok] {name}: {len(a)} rows ({time.time()-t0:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, s in failures:
            print(f"  {n}: {s[:200]}")
        sys.exit(1)
    print("all oracle comparisons passed")


if __name__ == "__main__":
    main()
