#!/usr/bin/env python
"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry at the given sf dir, runs the matching
``oracle_sql()`` in DuckDB over the same parquet files, and compares
row count, column names, and values (order-insensitive: columns sorted
by name, rows sorted by all columns).  Floats are compared exactly
first, then with a 1e-9 relative tolerance fallback so near-misses are
reported as WEAK rather than FAIL.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize cell values, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                pass
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(_canon_cell)
    df = df.sort_values(by=list(df.columns), key=lambda s: s.map(_sort_key)) \
           .reset_index(drop=True)
    return df


def _canon_cell(v):
    import datetime
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, (list, np.ndarray)):
        return tuple(np.asarray(v).tolist())
    return v


def _sort_key(v):
    return str(v)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> str:
    if len(spark_df) != len(oracle_df):
        return f"FAIL rows {len(spark_df)} vs {len(oracle_df)}"
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"FAIL cols {list(a.columns)} vs {list(b.columns)}"
    weak = []
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            avn = av.astype(float).to_numpy()
            bvn = bv.astype(float).to_numpy()
            both_nan = np.isnan(avn) & np.isnan(bvn)
            exact = (avn == bvn) | both_nan
            if exact.all():
                continue
            close = np.isclose(avn, bvn, rtol=1e-9, atol=1e-12) | both_nan
            if close.all():
                worst = np.nanmax(np.abs(avn - bvn))
                weak.append(f"{c} (max abs diff {worst:.3g})")
                continue
            i = int(np.argmax(~close))
            return f"FAIL col {c} row {i}: {avn[i]!r} vs {bvn[i]!r}"
        else:
            eq = (av.astype(str) == bv.astype(str)) | (av.isna() & bv.isna())
            if not eq.all():
                i = int(np.argmax(~eq.to_numpy()))
                return f"FAIL col {c} row {i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}"
    if weak:
        return "WEAK(float-tolerance): " + ", ".join(weak)
    return "OK"


def main() -> int:
    import __spark_entry__ as e
    from star_schema_etl_airflow_spark.session import get_spark

    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    n_ok = n_weak = n_fail = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception:
            print(f"{name:40s} SPARK-ERROR")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            status = f"ROWS-ONLY ({len(sdf)} rows)"
            n_ok += 1
        else:
            try:
                odf = con.execute(oracles[name]).df()
            except Exception:
                print(f"{name:40s} ORACLE-ERROR")
                traceback.print_exc()
                n_fail += 1
                continue
            status = compare(name, sdf, odf)
            if status == "OK":
                n_ok += 1
            elif status.startswith("WEAK"):
                n_weak += 1
            else:
                n_fail += 1
        print(f"{name:40s} {status}  [{time.time()-t0:.1f}s, {len(sdf)} rows]")
    print(f"\n{n_ok} ok, {n_weak} weak, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
