#!/usr/bin/env python3
"""Format a graft.Bench JSON line as the BASELINE.md measured table
(two query columns side by side). Usage: baseline_table.py <bench.json>
where the file holds the single JSON line Bench prints."""
import json, math, re, sys

d = json.load(open(sys.argv[1]))
# numeric query order: q11b sorts with q11, not into the q1xx block
q = sorted(d["queries"].items(),
           key=lambda kv: (int(re.match(r"q(\d+)", kv[0]).group(1)),
                           kv[0]))
half = math.ceil(len(q) / 2)
left, right = q[:half], q[half:]
print("| query | sec | | query | sec |")
print("|---|---|---|---|---|")
for i in range(half):
    l = f"| {left[i][0]} | {left[i][1]:.2f} |"
    r = (f" | {right[i][0]} | {right[i][1]:.2f} |"
         if i < len(right) else " |  |  |")
    print(l + r)
print()
print(f"total: {d['value']:.1f} s over {len(q)} queries")
