"""Driver-mimic: run every __spark_entry__ queries() entry and its
oracle_sql() through DuckDB at a given SF and compare row count, sorted
column names, and exact values (order-insensitive) — the same contract
the driver's CORRECTNESS gate applies.

Usage: python tools/check_entries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from data_prepper_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif str(pdf[c].dtype).startswith("datetime"):
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )


def _dtype_class(dt) -> str:
    s = str(dt)
    if s.startswith("datetime"):
        return "datetime"
    if s in ("object", "string"):
        return "str"
    if "float" in s:
        return "float"
    if "int" in s.lower():  # int64 / Int64 / uint32 ...
        return "int"
    if s == "bool":
        return "bool"
    return s


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(got.columns) != sorted(want.columns):
        errs.append(f"columns: spark={sorted(got.columns)} duck={sorted(want.columns)}")
        return errs
    if len(got) != len(want):
        errs.append(f"rowcount: spark={len(got)} duck={len(want)}")
        return errs
    # The driver hashes raw values per dtype; an int64-vs-float64 (or
    # HUGEINT->object) divergence hash-mismatches even when every value
    # compares equal. Flag dtype-class differences as hard failures.
    for c in got.columns:
        gc, wc = _dtype_class(got[c].dtype), _dtype_class(want[c].dtype)
        if gc != wc:
            errs.append(
                f"dtype col {c}: spark={got[c].dtype} duck={want[c].dtype} "
                f"(class {gc} vs {wc}) — driver hash would differ"
            )
    g, w = normalize(got), normalize(want)
    for c in g.columns:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(
            wv.dtype, np.floating
        ):
            gf = gv.astype(np.float64)
            wf = wv.astype(np.float64)
            both_nan = np.isnan(gf) & np.isnan(wf)
            eq = (gf == wf) | both_nan
        else:
            eq = gv == wv
        if not np.asarray(eq).all():
            bad = np.flatnonzero(~np.asarray(eq))[:3]
            errs.append(
                f"col {c}: {len(np.flatnonzero(~np.asarray(eq)))} mismatches, "
                f"e.g. rows {bad.tolist()}: spark={gv[bad].tolist()} duck={wv[bad].tolist()}"
            )
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check_entries", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(got)} rows, cols={sorted(got.columns)}")
            n_rows_only += 1
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        errs = compare(name, got, want)
        if errs:
            print(f"FAIL {name}:")
            for e in errs:
                print(f"   {e}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
