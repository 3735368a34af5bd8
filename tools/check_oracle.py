#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each parquet table of
<sfDir> as a DuckDB view, runs each oracle SQL, and compares against the
Spark result parquet at <verifyOutDir>/<name>/ — columns sorted by name,
rows sorted by all columns, exact value compare (floats to 1e-9 rel).

This is a DEV TOOL ONLY (driver-side python); not part of the library.
"""
import json
import sys
import glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:  # list/array cells are unhashable: tuple-ize
        if df[c].dtype == object and len(df) and \
                isinstance(df[c].iloc[0], (list, tuple)) or \
                str(df[c].dtype) == "object" and len(df) and \
                hasattr(df[c].iloc[0], "__len__") and \
                not isinstance(df[c].iloc[0], str):
            df[c] = df[c].map(lambda v: tuple(v) if hasattr(v, "__iter__")
                              and not isinstance(v, str) else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    # spill to /tmp, never into the repo cwd (a heavy unrolled oracle
    # once filled the disk via ./.tmp); bound the spill so a runaway
    # plan fails fast instead of exhausting the disk
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET max_temp_directory_size='40GiB'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            oracle = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            failures += 1
            continue
        spark = pd.concat([pd.read_parquet(p) for p in sorted(files)],
                          ignore_index=True)
        o, s = canon(oracle), canon(spark)
        if list(o.columns) != list(s.columns):
            print(f"FAIL {name}: columns differ oracle={list(o.columns)} spark={list(s.columns)}")
            failures += 1
            continue
        if len(o) != len(s):
            print(f"FAIL {name}: rows differ oracle={len(o)} spark={len(s)}")
            failures += 1
            continue
        mismatch = []
        for c in o.columns:
            oc, sc = o[c], s[c]
            if oc.dtype.kind == "f" or sc.dtype.kind == "f":
                import numpy as np
                ocv = oc.astype(float).to_numpy()
                scv = sc.astype(float).to_numpy()
                bad = ~np.isclose(ocv, scv, rtol=1e-9, atol=1e-12, equal_nan=True)
                if bad.any():
                    i = int(bad.argmax())
                    mismatch.append(f"col {c} row {i}: oracle={ocv[i]!r} spark={scv[i]!r}")
            else:
                try:
                    eq = oc.astype(object).eq(sc.astype(object))
                except Exception:
                    eq = pd.Series([str(a) == str(b) for a, b in zip(oc, sc)])
                if not eq.all():
                    i = int((~eq).to_numpy().argmax())
                    mismatch.append(f"col {c} row {i}: oracle={oc.iloc[i]!r} spark={sc.iloc[i]!r}")
        # dtype note (schema-compare hint)
        dtype_note = ""
        dt = [(c, str(o[c].dtype), str(s[c].dtype)) for c in o.columns
              if str(o[c].dtype) != str(s[c].dtype)]
        if dt:
            dtype_note = f"  [dtype diff: {dt}]"
        if mismatch:
            print(f"FAIL {name}: {mismatch[:3]}{dtype_note}")
            failures += 1
        else:
            print(f"OK   {name}: {len(o)} rows{dtype_note}")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
