#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 scripts/compare.py [--strict] <sfDir> <verifyOutDir>

For each query dumped by graft.Verify (<out>/<name>/*.parquet) with an entry
in <out>/oracle_sql.json: run the oracle SQL in DuckDB against views over the
same fixture tables, then compare as sorted multisets with columns sorted by
name. Exit nonzero on any mismatch. Dev-only tool (driver-side python is
available in the container); the Scala library has no python dependency.

--strict: floats compare by full repr (bit-exact after both engines' own
rounding), not the driver's 6-decimal canonicalization — catches latent
summation-order divergence the normal gate would mask.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
STRICT = False

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize cell values to strings for robust multiset compare
    def cell(v):
        if isinstance(v, float):
            return repr(v) if STRICT else f"{v:.6f}"
        if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    out = df.map(cell)
    return out.sort_values(by=list(out.columns), ignore_index=True)

def main():
    global STRICT
    args = [a for a in sys.argv[1:] if a != "--strict"]
    STRICT = "--strict" in sys.argv
    sf_dir, out_dir = args[0], args[1]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = []
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for missing in sorted(set(oracles) - set(names)):
        failures.append((missing, "declared in oracle_sql.json but no spark output dir (query failed?)"))
    for name in names:
        marker = os.path.join(out_dir, name, "_GRAFT_ERROR.txt")
        if os.path.exists(marker):
            failures.append((name, "spark query FAILED: " + open(marker).read().strip()))
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            failures.append((name, "no spark output files")); continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(got)} rows (no oracle)")
            if len(got) == 0:
                failures.append((name, "0 rows"))
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}")); continue
        g, e = canon(got), canon(exp)
        if sorted(g.columns) != sorted(e.columns):
            failures.append((name, f"schema mismatch: spark={sorted(g.columns)} oracle={sorted(e.columns)}"))
            continue
        if len(g) != len(e):
            failures.append((name, f"row count: spark={len(g)} oracle={len(e)}"))
            continue
        if not g.equals(e):
            diff_mask = (g != e).any(axis=1)
            idx = diff_mask.idxmax()
            failures.append((name, f"value mismatch at sorted row {idx}:\n  spark:  {g.iloc[idx].to_dict()}\n  oracle: {e.iloc[idx].to_dict()}"))
            continue
        print(f"  [OK] {name}: {len(g)} rows")
    print()
    if failures:
        for n, msg in failures:
            print(f"FAIL {n}: {msg}")
        sys.exit(1)
    print(f"ALL PASS ({len(names)} queries)")

if __name__ == "__main__":
    main()
