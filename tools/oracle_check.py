#!/usr/bin/env python3
"""Local pre-check replicating the driver's DuckDB-oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
over the parquet tables in <sfDir>, load the Spark result parquet, sort
columns by name, sort rows, and compare cell-by-cell (exact for
ints/strings, tiny-ulp report for floats). Not the driver itself — just
the same shape of comparison, so mismatches surface before the round gate.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify timestamps so ns-vs-us precision noise is visible, not fatal
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cmp(a: pd.DataFrame, b: pd.DataFrame):
    """Return (status, detail). a=spark, b=duckdb."""
    if list(a.columns) != list(b.columns):
        return "SCHEMA", f"spark={list(a.columns)} duckdb={list(b.columns)}"
    if len(a) != len(b):
        return "ROWS", f"spark={len(a)} duckdb={len(b)}"
    worst = 0.0
    for c in a.columns:
        av, bv = a[c], b[c]
        # driver hashes exact values: an int column on one side and a
        # float on the other (e.g. DuckDB HUGEINT -> pandas float64)
        # stringifies differently even when numerically equal
        if {av.dtype.kind, bv.dtype.kind} == {"i", "f"} or {av.dtype.kind, bv.dtype.kind} == {"u", "f"}:
            return "DTYPE", f"col {c}: spark={av.dtype} duckdb={bv.dtype} (driver hash would FAIL)"
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            aa = av.astype(float).to_numpy()
            bb = bv.astype(float).to_numpy()
            for x, y in zip(aa, bb):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    rel = abs(x - y) / max(abs(x), abs(y), 1e-300)
                    worst = max(worst, rel)
                    if rel > 1e-12:
                        return "VALUES", f"col {c}: {x!r} != {y!r} (rel {rel:.2e})"
        else:
            if not av.equals(bv):
                ne = (av != bv)
                i = int(ne.idxmax())
                return "VALUES", f"col {c} row {i}: {av[i]!r} != {bv[i]!r}"
    if worst > 0:
        return "FLOAT_ULP", f"worst rel diff {worst:.2e} (exact hash would FAIL)"
    return "OK", ""


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            ddf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"{name:28s} DUCKDB_ERR {e}")
            continue
        try:
            sdf = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"{name:28s} SPARK_MISSING {e}")
            continue
        status, detail = cmp(norm(sdf), norm(ddf))
        if status == "OK":
            n_ok += 1
        print(f"{name:28s} {status} {detail}")
    print(f"\n{n_ok}/{len(oracle)} OK")


if __name__ == "__main__":
    main()
