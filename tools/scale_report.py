#!/usr/bin/env python3
"""Join two graft.Soak dumps (sf0.1 and the 10x scale-up) into
SCALE_r{N}.json: per-query cold/warm ratios, normalized by the 10x data
growth, with a superlinear flag. Dev tooling, like tools/check.py.

Usage: python3 tools/scale_report.py soak_sf01.json soak_sf1.json out.json
"""
import json
import sys

GROWTH = 10.0

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
rows = {}
for name, xa in a["samples"].items():
    xb = b["samples"].get(name)
    if xb is None or -1.0 in xa or -1.0 in xb:
        rows[name] = {"err": "missing or failed"}
        continue
    cold = round(xb[0] / xa[0], 2) if xa[0] > 0 else None
    warm = round(xb[-1] / xa[-1], 2) if xa[-1] > 0 else None
    # best-pass ratio is the contention-resistant comparison
    best = round(min(xb) / min(xa), 2) if min(xa) > 0 else None
    rows[name] = {
        "sf01_s": [round(x, 2) for x in xa],
        "sf1_s": [round(x, 2) for x in xb],
        "ratio_cold": cold,
        "ratio_warm": warm,
        "ratio_best": best,
        "superlinear": best is not None and best > GROWTH,
    }
out = {
    "growth": GROWTH,
    "load_1m_sf01": a.get("load_1m"),
    "load_1m_sf1": b.get("load_1m"),
    "n_superlinear": sum(1 for r in rows.values() if r.get("superlinear")),
    "queries": rows,
}
json.dump(out, open(sys.argv[3], "w"), indent=1)
print(f"wrote {sys.argv[3]}: {out['n_superlinear']} superlinear of {len(rows)}")
