"""Local replica of the driver's correctness gate: run each queries()
entry on Spark at sf0.01 and its oracle_sql() on DuckDB over the same
parquet, compare row count + column names + order-insensitive values.

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import numpy as np
import pandas as pd

SF_DIR = os.environ.get("PBS_GATE_SF_DIR", "/root/testdata/sf0.01")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # floats: round to 9 significant-ish decimals to absorb engine ulp noise
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
        elif df[c].dtype == bool:
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    only = set(sys.argv[1:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    from presto_bloomfilter_spark.sources.tables import TABLES

    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entrymod.queries()
    # raw registry, NOT entrymod.oracle_sql(): a few oracles are lazy
    # callables whose resolution is expensive (the BPE one trains and
    # reference-encodes in pure Python) — resolve per checked name so a
    # targeted run never pays for oracles it doesn't use
    from presto_bloomfilter_spark.plans.queries import ORACLES as oracles
    failures = []
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows  [{dt:.1f}s]")
            if len(sdf) == 0:
                failures.append(name)
            continue
        try:
            sql = oracles[name]
            odf = con.execute(sql() if callable(sql) else sql).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle error {e}")
            continue
        a, b = canon(sdf), canon(odf)
        if list(a.columns) != list(b.columns):
            failures.append(name)
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append(name)
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            continue
        if not a.equals(b):
            neq = (a != b).any(axis=1)
            failures.append(name)
            print(f"FAIL {name}: value mismatch on {int(neq.sum())}/{len(a)} rows")
            print("  spark:", a[neq].head(3).to_dict("records"))
            print("  oracle:", b[neq].head(3).to_dict("records"))
            continue
        print(f"OK   {name}: {len(a)} rows  [{dt:.1f}s]")
    checked = [n for n in qs if not only or n in only]
    # registry↔driver parity: make a partial sweep (or a driver file
    # that covers only a subset of the registry) visible at a glance
    print(f"REGISTERED: {len(qs)} queries ({len(oracles)} with SQL oracles); "
          f"CHECKED: {len(checked)}"
          + ("" if len(checked) == len(qs) else " — PARTIAL RUN"))
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
