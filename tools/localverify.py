#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/localverify.py <sfDir> <outDir>
Reads <outDir>/<name>/ parquet (written by `sbt "runMain graft.Verify ..."`)
plus <outDir>/oracle_sql.json, runs each oracle in DuckDB over the sfDir
tables, canonicalizes both sides (columns sorted by name, rows sorted,
doubles rounded) and reports match/mismatch per query.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

STRICT = os.environ.get('STRICT', '') == '1'  # exact doubles, like the driver

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == 'f' and not STRICT:
            df[c] = df[c].round(4)
        # normalize timestamps to strings
        if str(df[c].dtype).startswith('datetime'):
            df[c] = df[c].astype('datetime64[us]').astype(str)
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind='mergesort').reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = n_err = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"  ERR  {name}: no parquet output"); n_err += 1; continue
        got = pd.read_parquet(qdir)
        if name not in oracle:
            print(f" rows  {name}: {len(got)} rows (no oracle)"); continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"  ERR  {name}: oracle failed: {e}"); n_err += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"  BAD  {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_bad += 1; continue
        if len(g) != len(e):
            print(f"  BAD  {name}: rows {len(g)} vs {len(e)}"); n_bad += 1; continue
        if not g.equals(e):
            neq = (g != e).any(axis=1)
            print(f"  BAD  {name}: {int(neq.sum())}/{len(g)} differing rows")
            print("    got:", g[neq].head(3).to_dict('records'))
            print("    exp:", e[neq].head(3).to_dict('records'))
            n_bad += 1; continue
        print(f"   OK  {name}: {len(g)} rows")
        n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad, {n_err} err")
    return 1 if (n_bad or n_err) else 0

if __name__ == '__main__':
    sys.exit(main(sys.argv[1], sys.argv[2]))
