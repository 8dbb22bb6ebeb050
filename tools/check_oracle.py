#!/usr/bin/env python3
"""Dev-side oracle checker mirroring the driver's DuckDB compare:
run graft.Verify first (writes <out>/<query>/ parquet + oracle_sql.json),
then this script runs each oracle SQL in DuckDB over the same sf tables and
compares values column-by-column (columns sorted by name, rows as-written).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
# a query that crashed inside Verify writes no directory at all — that is
# a failure, not a silent absence. queries.txt (the full inventory, incl.
# rows-only queries) is authoritative when present.
manifest_path = os.path.join(out, "queries.txt")
expected = set(oracle)
if os.path.exists(manifest_path):
    expected |= {q for q in open(manifest_path).read().split() if q}
for q in sorted(expected):
    if not os.path.isdir(os.path.join(out, q)):
        print(f"{q:28s} FAIL no output written (query crashed in Verify)")
        fails += 1
for q in sorted(os.listdir(out)):
    qdir = os.path.join(out, q)
    if not os.path.isdir(qdir):
        continue
    ours = con.execute(f"SELECT * FROM '{qdir}/*.parquet'").fetchdf()
    if q not in oracle:
        print(f"{q:28s} rows-only: {len(ours)} rows")
        continue
    theirs = con.execute(oracle[q]).fetchdf()
    ours = ours[sorted(ours.columns)]
    theirs = theirs[sorted(theirs.columns)]
    ok = True
    msgs = []
    if list(ours.columns) != list(theirs.columns):
        ok = False; msgs.append(f"cols {list(ours.columns)} != {list(theirs.columns)}")
    elif len(ours) != len(theirs):
        ok = False; msgs.append(f"rows {len(ours)} != {len(theirs)}")
    else:
        for c in ours.columns:
            a, b = ours[c], theirs[c]
            if str(a.dtype) != str(b.dtype):
                # dtype drift is a FAILURE, not a note: round 9 proved a
                # silent dtype pass lets corpus-encoding changes slip by
                ok = False
                msgs.append(f"dtype[{c}] {a.dtype} vs {b.dtype}")
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                ok = False
                i = (~eq).idxmax()
                msg = f"val[{c}] row {i}: {a[i]!r} != {b[i]!r} ({int((~eq).sum())} rows differ"
                # for numeric columns report the magnitude, so an
                # FP-equivalence flake is distinguishable from a real bug
                if (pd.api.types.is_numeric_dtype(a) and pd.api.types.is_numeric_dtype(b)
                        and a.dtype != bool and b.dtype != bool):
                    msg += f", max|diff|={ (a - b).abs().max() !r}"
                msgs.append(msg + ")")
    status = "OK " if ok else "FAIL"
    if not ok:
        fails += 1
    print(f"{q:28s} {status} {len(ours)} rows  {'; '.join(msgs)}")
print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
