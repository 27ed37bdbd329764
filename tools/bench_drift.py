#!/usr/bin/env python3
"""Per-query bench drift tripwire (r12 verdict task #5): compare two bench
JSON lines and name every query that regressed by BOTH >30% and >0.3s —
the threshold below which container noise dominates. Usage:
    python3 tools/bench_drift.py <prior.json> <current.json>
Exit 0 always (this is an attribution aid, not a gate); the named rows go
into the round's bench note so the judge can attribute each one to drift
(re-run the prior round's CODE on today's machine — see docs/bench/
PROTOCOL.md) or to a real change.
"""
import json, sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
qa, qb = a["queries"], b["queries"]
common = sorted(set(qa) & set(qb))
print(f"common queries: {len(common)}  "
      f"prior total {a['value']:.1f}s  current total {b['value']:.1f}s  "
      f"prior load {a.get('loadavg_before', '?')}  current load {b.get('loadavg_before', '?')}")
reg = [(n, qa[n], qb[n]) for n in common
       if qa[n] > 0 and qb[n] > qa[n] * 1.3 and qb[n] - qa[n] > 0.3]
imp = [(n, qa[n], qb[n]) for n in common
       if qb[n] > 0 and qa[n] > qb[n] * 1.3 and qa[n] - qb[n] > 0.3]
print(f"\nREGRESSED >30% and >0.3s ({len(reg)}):")
for n, x, y in sorted(reg, key=lambda t: t[1] - t[2]):
    print(f"  {n}: {x:.2f} -> {y:.2f}  (+{y - x:.2f}s, {y / x:.2f}x)")
print(f"\nimproved >30% and >0.3s ({len(imp)}):")
for n, x, y in sorted(imp, key=lambda t: t[2] - t[1]):
    print(f"  {n}: {x:.2f} -> {y:.2f}  (-{x - y:.2f}s)")
