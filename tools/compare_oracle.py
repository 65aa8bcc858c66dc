#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB over
the sfDir parquet tables, load the engine's parquet result, sort columns by
name, canonicalize values, and diff. Prints per-query PASS/FAIL.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame, name: str = "") -> pd.DataFrame:
    import numpy as np
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(9)
        elif s.dtype == object:
            # the DRIVER's canonicalizer cannot sort/hash array cells
            # (pandas factorize dies on ndarray) — a declared query must
            # serialize arrays itself; warn loudly if one slips through
            if s.map(lambda v: isinstance(v, (list, np.ndarray))).any():
                print(f"WARN {name}: array cells in column '{c}' — the "
                      "driver gate would ERR; serialize in the declared query")
                df[c] = s.map(lambda v: " ".join(map(str, v))
                              if isinstance(v, (list, np.ndarray)) else v)
            df[c] = df[c].astype(str)
    # row-sort on all columns: the driver sorts before hashing, so the
    # local gate must not depend on each side's ORDER BY alone
    if len(df.columns) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"MISS {name}: no engine output")
            n_fail += 1
            continue
        try:
            eng = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]),
                        name)
            ora = canon(con.sql(oracle[name]).df(), name)
        except Exception as e:
            print(f"ERR  {name}: {e}")
            n_fail += 1
            continue
        if list(eng.columns) != list(ora.columns):
            print(f"FAIL {name}: columns {list(eng.columns)} vs {list(ora.columns)}")
            n_fail += 1
        elif len(eng) != len(ora):
            print(f"FAIL {name}: rows {len(eng)} vs {len(ora)}")
            n_fail += 1
        elif not eng.equals(ora):
            neq = (eng != ora).any(axis=0)
            bad = [c for c in eng.columns if neq[c]]
            print(f"FAIL {name}: value diff in {bad}")
            for c in bad[:2]:
                mask = eng[c] != ora[c]
                print("  engine:", eng[mask][c].head(3).tolist())
                print("  oracle:", ora[mask][c].head(3).tolist())
            n_fail += 1
        else:
            print(f"PASS {name} ({len(eng)} rows)")
            n_pass += 1
    # the approximate twins (q12b HLL, q60b percentile sketch) carry a
    # measured-error bound instead of a SQL oracle
    for bound_file in sorted(glob.glob(f"{out_dir}/*_bound.json")):
        b = json.load(open(bound_file))
        if b.get("pass"):
            print(f"PASS {b['query']} (rel_err {b['rel_err']:.4f} <= {b['bound']})")
            n_pass += 1
        else:
            print(f"FAIL {b['query']}: rel_err {b['rel_err']:.4f} > {b['bound']}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
