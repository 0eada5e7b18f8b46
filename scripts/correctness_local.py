"""Local mirror of the driver's correctness gate: run every
__spark_entry__.queries() entry AND its oracle_sql() twin at a small
scale factor, sort columns by name / rows by value, and compare shapes,
schemas, and values (exact for ints/strings, tiny-rel-tol for floats —
the driver hashes exact values, so treat any float diff as a flag to
investigate).

Usage: python scripts/correctness_local.py [sf_dir] [only_prefix]
"""

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as entry

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    return df.sort_values(list(df.columns), ignore_index=True)


def values_match(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if a.shape != b.shape:
        return False
    for c in a.columns:
        x, y = a[c], b[c]
        if pd.api.types.is_float_dtype(x) or pd.api.types.is_float_dtype(y):
            xv = x.astype(float).to_numpy()
            yv = y.astype(float).to_numpy()
            both_nan = np.isnan(xv) & np.isnan(yv)
            if not np.all(
                both_nan | np.isclose(xv, yv, rtol=1e-9, atol=1e-12)
            ):
                return False
        else:
            if not x.astype(object).equals(y.astype(object)):
                return False
    return True


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else ""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("correctness-local")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"create view {t} as select * from parquet_scan('{p}')"
            )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failed = []
    for name in sorted(qs):
        if only and not name.startswith(only):
            continue
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            if name not in oracles:
                print(f"{name} ROWS_ONLY rows={len(sdf)}", flush=True)
                continue
            odf = con.execute(oracles[name]).df()
            a, b = norm(sdf), norm(odf)
            schema_ok = list(a.columns) == list(b.columns)
            rows_ok = len(a) == len(b)
            val_ok = schema_ok and rows_ok and values_match(a, b)
            status = "OK" if (schema_ok and rows_ok and val_ok) else (
                f"FAIL rows={len(a)}/{len(b)} schema={schema_ok} val={val_ok}"
            )
            if "FAIL" in status:
                failed.append(name)
            print(f"{name} {status}", flush=True)
        except Exception as ex:  # noqa: BLE001 — report and continue
            failed.append(name)
            print(f"{name} ERR {type(ex).__name__}: {ex}", flush=True)
    print(json.dumps({"failed": failed, "n": len(qs)}), flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
