#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<query>/ parquet (written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, registers every <sfDir>/*.parquet as a DuckDB
view named after the file, runs each oracle SQL, and compares: columns sorted
by name, rows sorted, values hashed (floats rounded to 9 significant digits
to absorb fp-order noise). Queries without oracle SQL get a rows>0 check.
"""
import sys, os, json, glob, math

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NULL"
            if v == 0:
                return "0"
            return f"{v:.9g}"
        return str(v)

    out = df.applymap(norm)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]

    def connect():
        # fresh connection per oracle query: a fatal DuckDB error (e.g. a
        # binder INTERNAL error) invalidates the connection and would cascade
        # into every later query
        con = duckdb.connect()
        for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
            name = os.path.basename(p)[:-len(".parquet")]
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
        return con

    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

    n_pass = n_fail = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        try:
            got = pd.read_parquet(qdir)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            ok = len(got) > 0
            print(f"{'pass' if ok else 'FAIL'} {name}: rows-only check ({len(got)} rows)")
            n_pass += ok
            n_fail += not ok
            continue
        try:
            con = connect()
            want = con.execute(oracle[name]).df()
            con.close()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs oracle {list(w.columns)}")
            n_fail += 1
        elif len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs oracle {len(w)}")
            n_fail += 1
        elif not g.equals(w):
            diff = (g != w).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: value mismatch at rows {list(idx)}")
            for i in idx:
                print(f"  spark : {g.loc[i].to_dict()}")
                print(f"  oracle: {w.loc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"pass {name}: {len(g)} rows, {len(g.columns)} cols")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
