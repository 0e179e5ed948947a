#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs `graft.Verify` output against DuckDB oracles: for each query dir under
OUT, load result parquet + run oracle_sql.json[name] on the fixture tables,
sort columns by name, sort rows, and compare (exact for non-floats, and for
floats report both bit-exact and 1e-9-relative status so we can see how much
headroom the hash gate has).

Usage: python scripts/check.py [sfDir] [outDir]
"""
import json, math, os, sys
import duckdb
import pyarrow.parquet as pq

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
names = sorted(d for d in os.listdir(out) if os.path.isdir(f"{out}/{d}"))

def norm(v):
    if isinstance(v, float):
        return v
    return v

fails = []
for name in names:
    res = pq.read_table(f"{out}/{name}").to_pandas()
    if name not in oracle:
        print(f"{name:28s} rows-only: {len(res)} rows {'OK' if len(res) >= 0 else ''}")
        continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name:28s} ORACLE ERROR: {e}")
        fails.append(name)
        continue
    res = res.reindex(sorted(res.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    status = []
    if list(res.columns) != list(exp.columns):
        print(f"{name:28s} COLUMN MISMATCH: got {list(res.columns)} want {list(exp.columns)}")
        fails.append(name)
        continue
    # dtype-strict gate: the driver hashes typed values, so a DuckDB HUGEINT
    # vs Spark BIGINT difference fails there even when str() values match.
    # Compare arrow-level type families column by column.
    def family(t):
        t = str(t).lower()
        if t.startswith(("int", "uint")):
            return "int"
        if t.startswith(("halffloat", "float", "double")):
            return "float"
        if t.startswith("decimal"):
            return "decimal"
        if "string" in t or t.startswith("utf8") or t.startswith("large_utf8"):
            return "string"
        # driver normalizes temporal values before hashing (fn_datetime passed
        # r1 with Spark timestamp vs DuckDB date), so date==timestamp here
        if t.startswith(("timestamp", "date")):
            return "temporal"
        if t.startswith("bool"):
            return "bool"
        return t
    res_arrow = pq.read_table(f"{out}/{name}")
    exp_arrow = con.sql(oracle[name]).arrow()
    rtypes = {f.name: family(f.type) for f in res_arrow.schema}
    etypes = {f.name: family(f.type) for f in exp_arrow.schema}
    dtype_bad = [(c, rtypes[c], etypes.get(c)) for c in rtypes
                 if etypes.get(c) != rtypes[c]]
    if dtype_bad:
        print(f"{name:28s} DTYPE MISMATCH: {dtype_bad}")
        fails.append(name + " (dtype)")
        continue
    if len(res) != len(exp):
        print(f"{name:28s} ROWCOUNT MISMATCH: got {len(res)} want {len(exp)}")
        fails.append(name)
        continue
    rs = res.sort_values(by=list(res.columns)).reset_index(drop=True)
    es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    exact = True
    close = True
    baddet = None
    for c in rs.columns:
        for i, (a, b) in enumerate(zip(rs[c], es[c])):
            if isinstance(a, float) or isinstance(b, float):
                fa, fb = float(a), float(b)
                if math.isnan(fa) and math.isnan(fb):
                    continue
                if fa != fb:
                    exact = False
                    if not math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-12):
                        close = False
                        baddet = baddet or (c, i, fa, fb)
            else:
                import datetime
                import pandas as pd
                if isinstance(a, (datetime.date, datetime.datetime)) or \
                   isinstance(b, (datetime.date, datetime.datetime)):
                    if pd.isna(a) and pd.isna(b):  # NaT != NaT, but both-null is a match
                        continue
                    if pd.Timestamp(a) != pd.Timestamp(b):
                        exact = False
                        close = False
                        baddet = baddet or (c, i, a, b)
                elif str(a) != str(b):
                    exact = False
                    close = False
                    baddet = baddet or (c, i, a, b)
    if exact:
        print(f"{name:28s} EXACT ({len(res)} rows)")
    elif close:
        print(f"{name:28s} CLOSE-not-exact ({len(res)} rows)  <-- float drift")
        fails.append(name + " (drift)")
    else:
        print(f"{name:28s} MISMATCH {baddet}")
        fails.append(name)

print("\n%d/%d compared OK" % (len(names) - len(fails), len(names)))
if fails:
    print("FAILING:", fails)
    sys.exit(1)
