#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: run Verify's
parquet dumps against the oracle SQL in DuckDB over the same testdata,
compare row counts, schemas (loosely), and a canonical hash of sorted
values. Usage: check_oracle.py <sfDir> <verifyOutDir>"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for tbl in ["region","nation","customer","supplier","part","orders",
            "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{sfdir}/{tbl}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        cells = []
        for v in row:
            if isinstance(v, float):
                cells.append(repr(v))
            else:
                cells.append(str(v))
        rows.append("\x01".join(cells))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()

ok = fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fail += 1; continue
    try:
        got = pd.read_parquet(f"{outdir}/{name}")
    except Exception as e:
        print(f"FAIL {name}: no spark result {e}"); fail += 1; continue
    if sorted(got.columns) != sorted(exp.columns):
        print(f"FAIL {name}: cols {sorted(got.columns)} vs {sorted(exp.columns)}")
        fail += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fail += 1; continue
    hg, he = canon(got), canon(exp)
    if hg != he:
        print(f"FAIL {name}: hash mismatch ({len(got)} rows)")
        # show a diff sample
        g = got.reindex(sorted(got.columns), axis=1).sort_values(sorted(got.columns)).reset_index(drop=True)
        e = exp.reindex(sorted(exp.columns), axis=1).sort_values(sorted(exp.columns)).reset_index(drop=True)
        diff = (g.astype(str) != e.astype(str)).any(axis=1)
        print("  spark:", g[diff].head(3).to_dict("records"))
        print("  duck :", e[diff].head(3).to_dict("records"))
        fail += 1; continue
    ok += 1
    print(f"OK   {name} ({len(got)} rows)")

# rows-only checks for queries without oracle
import os
allq = [os.path.basename(p) for p in glob.glob(f"{outdir}/q*") if os.path.isdir(p)]
for name in sorted(set(allq) - set(oracle)):
    try:
        got = pd.read_parquet(f"{outdir}/{name}")
        print(f"ROWS {name}: {len(got)} rows")
    except Exception as e:
        print(f"FAIL {name}: unreadable {e}"); fail += 1

print(f"\n{ok} ok / {fail} fail of {len(oracle)} oracled")
sys.exit(1 if fail else 0)
