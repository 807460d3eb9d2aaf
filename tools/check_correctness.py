#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

For each query in __spark_entry__.queries(): run the Spark DataFrame at
sf0.01 and the matching oracle_sql() in DuckDB, then compare row count,
sorted column-name set, and exact cell values after canonicalization
(columns sorted by name, rows sorted by all columns). Stricter than the
driver's value hash — if this passes, the hash matches.

Usage: python tools/check_correctness.py [--sf DIR] [--names a,b,c]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cells_equal(a, b) -> bool:
    try:
        a_na, b_na = bool(pd.isna(a)), bool(pd.isna(b))
    except (TypeError, ValueError):
        a_na = b_na = False
    if a_na or b_na:
        return a_na and b_na
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = canon(spark_pdf), canon(duck_pdf)
    n = min(len(a), len(b))
    mism = 0
    for col in a.columns:
        av, bv = a[col].tolist()[:n], b[col].tolist()[:n]
        for i in range(n):
            if not cells_equal(av[i], bv[i]):
                if mism < 3:
                    problems.append(f"cell [{i}][{col}]: spark={av[i]!r} duck={bv[i]!r}")
                mism += 1
    if mism:
        problems.append(f"total mismatched cells: {mism}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--names", default=None)
    args = ap.parse_args()

    # lazy oracles (e.g. IVF centroid literals) must derive from the
    # SAME corpus dir the Spark queries run against
    os.environ["BEAR_SPARK_ORACLE_SF"] = args.sf

    import __spark_entry__ as e
    from bear_spark.session import get_spark

    qs, oracles = e.queries(), e.oracle_sql()
    names = args.names.split(",") if args.names else list(qs)

    spark = get_spark(app_name="check_correctness", cores=8, shuffle_partitions=8, driver_memory="8g")
    con = duckdb.connect()
    for tname in TABLES:
        con.sql(f"CREATE VIEW {tname} AS SELECT * FROM '{args.sf}/{tname}.parquet'")

    failed, weak = [], []
    for name in names:
        t0 = time.time()
        try:
            spdf = qs[name](spark, args.sf).toPandas()
        except Exception as ex:
            failed.append(name)
            print(f"FAIL {name}: spark raised {type(ex).__name__}: {str(ex)[:300]}")
            continue
        if name not in oracles:
            weak.append(name)
            print(f"weak {name}: rows-only ({len(spdf)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            dpdf = con.sql(oracles[name]).df()
        except Exception as ex:
            failed.append(name)
            print(f"FAIL {name}: duckdb raised {type(ex).__name__}: {str(ex)[:300]}")
            continue
        problems = compare(name, spdf, dpdf)
        if problems:
            failed.append(name)
            print(f"FAIL {name} ({len(spdf)} vs {len(dpdf)} rows) [{time.time()-t0:.1f}s]")
            for p in problems[:6]:
                print(f"   - {p}")
        else:
            print(f"ok   {name}: {len(spdf)} rows match [{time.time()-t0:.1f}s]")

    print(f"\n{len(names) - len(failed)}/{len(names)} pass ({len(weak)} rows-only)")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
