#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify at a
scale factor, then execute each oracle SQL in DuckDB over the same parquet
tables and compare (rows / schema / values). Usage:
    python3 tools/selfcheck.py [sfdir] [outdir] [--skip-verify] [query...]
"""
import json, math, subprocess, sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
flags = [a for a in sys.argv[3:]]
SKIP = "--skip-verify" in flags
ONLY = [a for a in flags if not a.startswith("--")]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if not SKIP:
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=3600)
    tail = "\n".join((r.stdout + r.stderr).splitlines()[-30:])
    print(tail)
    if r.returncode != 0:
        print("VERIFY RUN FAILED"); sys.exit(1)

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(df):
    import numpy as np
    df = df.reindex(sorted(df.columns), axis=1)
    def is_plain(c):
        return not df[c].map(lambda v: isinstance(v, (list, dict, bytes, np.ndarray))).any()
    sortable = [c for c in df.columns if is_plain(c)]
    if sortable:
        df = df.sort_values(by=sortable, ignore_index=True)
    return df

def cmp_cell(a, b):
    import numpy as np
    if isinstance(a, np.ndarray): a = a.tolist()
    if isinstance(b, np.ndarray): b = b.tolist()
    if a is None and b is None: return True
    try:
        if a is not None and b is not None and pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            if (isinstance(a, float) and math.isnan(a)) and \
               (isinstance(b, float) and math.isnan(b)): return True
            return abs(float(a) - float(b)) <= 1e-9 * max(1.0, abs(float(a)))
        except (TypeError, ValueError): return False
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a2, b2 = list(a or []), list(b or [])
        return len(a2) == len(b2) and all(cmp_cell(x, y) for x, y in zip(a2, b2))
    return a == b

fails, passes, skips, zero_rows = [], [], [], []
names = ONLY if ONLY else sorted(oracle.keys())
for name in names:
    sql = oracle.get(name)
    try:
        got = pd.read_parquet(f"{OUT}/{name}")
    except Exception as e:
        fails.append((name, f"spark output missing: {e}")); continue
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}")); continue
    # normalize timestamps to naive ns
    for df in (got, exp):
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime64"):
                df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    g, e = norm(got), norm(exp)
    if list(g.columns) != list(e.columns):
        fails.append((name, f"cols {list(g.columns)} vs {list(e.columns)}")); continue
    if len(g) != len(e):
        fails.append((name, f"rows {len(g)} vs {len(e)}")); continue
    bad = None
    for c in g.columns:
        gv, ev = g[c].tolist(), e[c].tolist()
        for i, (x, y) in enumerate(zip(gv, ev)):
            if not cmp_cell(x, y):
                bad = f"col {c} row {i}: {x!r} vs {y!r}"; break
        if bad: break
    if bad: fails.append((name, bad))
    else:
        passes.append(name)
        if len(g) == 0:
            zero_rows.append(name)

no_oracle = sorted(set(json.load(open(f"{OUT}/oracle_sql.json")).keys()))
print(f"\nPASS {len(passes)}: {' '.join(passes)}")
print(f"\nFAIL {len(fails)}:")
for n, why in fails:
    print(f"  {n}: {why}")

# Zero-row tripwire (r12 verdict task #2): a "pass" where BOTH engines
# return 0 rows proves nothing — the q_sparql_bgp (r11) / q_ldbc_ic3+ic11
# (r12) defect class. Any zero-row green not pinned in the allowlist
# fails the gate so a fixture change can't silently vacate a query.
import os
allow_path = os.path.join(os.path.dirname(__file__), "zero_row_allowlist.txt")
allowed = set()
if os.path.exists(allow_path):
    allowed = {l.strip() for l in open(allow_path) if l.strip() and not l.startswith("#")}
new_zero = [n for n in zero_rows if n not in allowed]
if zero_rows:
    print(f"\nZERO-ROW greens {len(zero_rows)}: {' '.join(zero_rows)}")
if new_zero:
    print(f"TRIPWIRE: {len(new_zero)} zero-row green(s) NOT in {allow_path}: {' '.join(new_zero)}")
sys.exit(0 if not fails and not new_zero else 2)
