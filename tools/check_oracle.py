"""Local replica of the driver's oracle gate: run named queries() entries on
Spark and the matching oracle_sql() on DuckDB, compare rows / schema / values.

Usage: python tools/check_oracle.py [query ...]   (default: all oracle-backed)
Env:   SF_DIR (default /root/testdata/sf0.01)
"""
from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    import __spark_entry__ as entry
    from linked_maps_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    qs, oracles = entry.queries(), entry.oracle_sql()
    names = sys.argv[1:] or [n for n in qs if n in oracles]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    fails = 0
    for name in names:
        if name not in oracles:
            print(f"{name}: no oracle (rows-only), spark_rows={qs[name](spark, sf_dir).count()}")
            continue
        sdf = qs[name](spark, sf_dir).toPandas()
        odf = con.sql(oracles[name]).df()
        rows = len(sdf) == len(odf)
        schema = sorted(sdf.columns) == sorted(odf.columns)
        val = False
        if rows and schema:
            a, b = canon(sdf), canon(odf.astype({c: sdf[c].dtype for c in sdf.columns if c in odf.columns}, errors="ignore"))
            try:
                val = True
                for c in a.columns:
                    av, bv = a[c].to_numpy(), b[c].to_numpy()
                    if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
                        ok = np.array_equal(av.astype("float64"), bv.astype("float64"), equal_nan=True)
                    else:
                        ok = (pd.Series(av).astype(str) == pd.Series(bv).astype(str)).all()
                    if not ok:
                        val = False
                        print(f"  col {c} mismatch: {av[:5]} vs {bv[:5]}")
            except Exception as e:  # noqa: BLE001
                val = False
                print(f"  compare error: {e}")
        status = "OK" if (rows and schema and val) else "FAIL"
        if status == "FAIL":
            fails += 1
        print(f"{name}: {status} rows={len(sdf)}/{len(odf)} schema={schema} values={val}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
