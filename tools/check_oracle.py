"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 on Spark AND its
oracle_sql() on DuckDB, then compares row count, column names, and an
order-insensitive value comparison (exact string repr after canonical
sort). Reports per-query PASS/FAIL with the first mismatching rows.

Usage: python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_ORACLE", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [str(c) for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v))
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    errs = []
    if len(spark_pdf) != len(duck_pdf):
        errs.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(map(str, duck_pdf.columns))
    if sc != dc:
        errs.append(f"columns spark={sc} duck={dc}")
        return errs
    if errs:
        return errs
    a, b = canon(spark_pdf), canon(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            eq = (av.isna() & bv.isna()) | (av == bv)
            if not eq.all():
                bad = (~eq).idxmax()
                close = np.isclose(av.fillna(0), bv.fillna(0), rtol=1e-9, atol=1e-12)
                errs.append(
                    f"float col {c}: {(~eq).sum()} exact mismatches "
                    f"(allclose={bool(close.all())}); e.g. row {bad}: "
                    f"spark={av[bad]!r} duck={bv[bad]!r}"
                )
        else:
            eq = (av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str))
            if not eq.all():
                bad = (~eq).idxmax()
                errs.append(
                    f"col {c}: {(~eq).sum()} mismatches; e.g. row {bad}: "
                    f"spark={av[bad]!r} duck={bv[bad]!r}"
                )
    return errs


def main() -> int:
    import __spark_entry__ as entry_mod
    from feature_extractor_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("oracle-check", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            ok = len(sdf) >= 0
            print(f"ROWS  {name}: rows={len(sdf)} cols={list(sdf.columns)} ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        errs = compare(name, sdf, ddf)
        if errs:
            print(f"FAIL  {name} ({time.time()-t0:.1f}s):")
            for e in errs[:6]:
                print(f"      - {e}")
            n_fail += 1
        else:
            print(f"PASS  {name}: rows={len(sdf)} ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
