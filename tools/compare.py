#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: tools/compare.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
against views over <sfDir>/*.parquet, read the Spark result parquet from
<verifyOutDir>/<name>/, sort columns by name, sort rows, compare exactly.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    tables = ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]
    for t in tables:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(os.path.join(out, name, "*.parquet"))
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            rel = con.sql(sql)
            # Type-lint: the driver hashes the oracle result, and DuckDB-only
            # types (HUGEINT from bare integer SUM, UBIGINT, DECIMAL) render
            # differently from Spark's BIGINT/DOUBLE under the driver's
            # canonicalization even when pandas value-compare passes (this is
            # exactly how t11 stayed red for three rounds). Reject them here.
            bad_types = [
                f"{c}:{t}" for c, t in zip(rel.columns, map(str, rel.types))
                if ("HUGEINT" in str(t).upper() or "UBIGINT" in str(t).upper()
                    or "DECIMAL" in str(t).upper())
            ]
            if bad_types:
                print(f"FAIL {name}: oracle type-lint (cast to BIGINT/DOUBLE): "
                      + ", ".join(bad_types))
                n_fail += 1
                continue
            o = rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        s = con.sql(f"SELECT * FROM read_parquet({spark_files!r})").df()
        o, s = canon(o), canon(s)
        if list(o.columns) != list(s.columns):
            print(f"FAIL {name}: columns oracle={list(o.columns)} spark={list(s.columns)}")
            n_fail += 1
            continue
        if len(o) != len(s):
            print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}")
            n_fail += 1
            continue
        bad = []
        for c in o.columns:
            oc, sc = o[c].values, s[c].values
            if oc.dtype.kind == 'f' or sc.dtype.kind == 'f':
                eq = (oc == sc) | (pd.isna(oc) & pd.isna(sc))
            else:
                eq = pd.Series(oc).eq(pd.Series(sc)) | (pd.isna(oc) & pd.isna(sc))
            eq = np.asarray(eq)
            if not eq.all():
                i = int(np.argmin(eq))
                bad.append(f"{c}[{i}]: oracle={oc[i]!r} spark={sc[i]!r} (dtype o={oc.dtype} s={sc.dtype})")
        if bad:
            print(f"FAIL {name}: value mismatch " + "; ".join(bad[:3]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(o)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
