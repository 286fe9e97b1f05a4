"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the same sf, then compares row count,
schema (column names), and an order-insensitive value hash (columns
sorted by name, rows sorted by all values, floats rounded).

Usage: python tools/check_oracle.py [query_name ...] [--sf DIR] [--legacy]
  --legacy: also include legacy_queries() (consolidation-retired paths,
            checked against legacy_oracle_sql()).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# one source of truth for the fixture tables — a second copy here would
# silently leave a newly-added table's DuckDB view uncreated
from dashing_spark.sources.tables import TABLES  # noqa: E402


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(str)
            except Exception:
                pass
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(7)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"schema mismatch: spark={sorted(spark_pdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if a[c].dtype.kind == "f":
                # STRICT: the driver hashes rounded values, so any post-round
                # difference — even one ulp straddling a rounding boundary —
                # is a hash mismatch. Require bit-exact equality post-round.
                af, bf = av.astype(float), bv.astype(float)
                eq = ((af == bf) | (np.isnan(af) & np.isnan(bf))).all()
            else:
                eq = (av == bv).all()
            if not eq:
                bad = (
                    np.flatnonzero(av.astype(float) != bv.astype(float))
                    if a[c].dtype.kind == "f"
                    else np.flatnonzero(av != bv)
                )[:5]
                problems.append(
                    f"value mismatch in '{c}' at rows {bad.tolist()}: "
                    f"spark={av[bad].tolist()} oracle={bv[bad].tolist()}"
                )
    return problems


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    args: list[str] = []
    include_legacy = False
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--legacy":
            include_legacy = True
        elif a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a == "--sf":
            # the space-separated form the usage line documents — without
            # this branch the DIR would be treated as a query name and
            # every query would silently run at the default sf
            if i + 1 >= len(argv):
                raise SystemExit("--sf requires a directory argument")
            i += 1
            sf_dir = argv[i]
        elif a.startswith("--"):
            raise SystemExit(f"unknown flag: {a}")
        else:
            args.append(a)
        i += 1

    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("check_oracle")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    if include_legacy:
        qs = {**qs, **entry.legacy_queries()}
        oracles = {**oracles, **entry.legacy_oracle_sql()}
    names = args or list(qs)
    n_fail = 0
    n_rows_only = 0
    for name in names:
        t0 = time.time()
        try:
            spdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:400]}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "rows-only"
            n_rows_only += 1
            print(f"ok?  {name}: {len(spdf)} rows ({status}, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            opdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = compare(spdf, opdf)
        if problems:
            n_fail += 1
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"PASS {name}: {len(spdf)} rows [{time.time()-t0:.1f}s]")
    spark.stop()
    n_green = len(names) - n_fail - n_rows_only
    print(
        f"SUMMARY: {n_green}/{len(names)} oracle-green"
        + (f", {n_rows_only} rows-only" if n_rows_only else "")
        + (f" — {n_fail} FAILED" if n_fail else "")
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
