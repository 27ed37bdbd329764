#!/usr/bin/env python3
"""Compare two graft.Bench JSON outputs (baseline vs scaled) and print a
per-query ratio table for the full-catalog soak.

Usage: tools/soak_compare.py <bench_base.json> <bench_scaled.json> [scale=10]

A query is flagged:
  SUPERLINEAR  ratio > scale * 1.3   (worse than linear in data size)
  FIXED        ratio < 1.5           (dominated by fixed overhead — fine)
Everything in between is linear-or-better at `scale`x data.

The bench JSON line is the LAST line of the file that parses as JSON with a
"queries" key (sbt logging may precede it).
"""
import json, sys


def load(path):
    last = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "queries" in d:
                last = d
    if last is None:
        raise SystemExit(f"no bench JSON found in {path}")
    return last


def main():
    base, scaled = load(sys.argv[1]), load(sys.argv[2])
    scale = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qb, qs = base["queries"], scaled["queries"]
    rows = []
    for q in sorted(set(qb) & set(qs)):
        b, s = qb[q], qs[q]
        if b <= 0 or s <= 0:  # -1 = errored run
            rows.append((q, b, s, None, "ERROR"))
            continue
        r = s / b
        flag = ("SUPERLINEAR" if r > scale * 1.3 else
                "FIXED" if r < 1.5 else "")
        rows.append((q, b, s, r, flag))
    missing = sorted(set(qb) ^ set(qs))
    rows.sort(key=lambda t: -(t[3] or 1e9))
    print(f"{'query':<34}{'base_s':>9}{'scaled_s':>10}{'ratio':>8}  flag")
    for q, b, s, r, flag in rows:
        rs = f"{r:7.2f}" if r is not None else "      -"
        print(f"{q:<34}{b:9.2f}{s:10.2f} {rs}  {flag}")
    n_super = sum(1 for t in rows if t[4] == "SUPERLINEAR")
    tot_b = sum(t[1] for t in rows if t[1] > 0)
    tot_s = sum(t[2] for t in rows if t[2] > 0)
    print(f"\ntotals: base {tot_b:.1f}s scaled {tot_s:.1f}s "
          f"ratio {tot_s / tot_b:.2f} at {scale}x data; "
          f"{n_super} superlinear, {len(missing)} unmatched keys")
    if missing:
        print("unmatched:", " ".join(missing))


if __name__ == "__main__":
    main()
