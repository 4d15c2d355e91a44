"""Summarize the Hanabi-Full paper-config training trajectory across
all paper_r3 runs (watchdog-resumed segments share one lineage):
average_score at true-step milestones, for the step-matched comparison
against the paper's published endpoints (RESULTS.md round 4).

Usage: python scripts/hanabi_trajectory.py [runroot]
"""
import json
import sys
from pathlib import Path

root = Path(sys.argv[1] if len(sys.argv) > 1 else
            "results/Hanabi/Hanabi-Full/mappo/paper_r3")
rows = []
for run in sorted(root.glob("run*/metrics.jsonl")):
    for line in run.read_text().splitlines():
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "true_steps" in r and "average_score" in r:
            rows.append((int(r["true_steps"]), int(r["episode"]),
                         float(r["average_score"])))
rows.sort()
if not rows:
    sys.exit("no metrics found")

milestones = [int(b * 1e9) for b in
              (0.25, 0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0, 4.5, 5.0,
               5.5, 6.0, 6.5, 7.0, 7.5, 8.0, 8.5, 9.0, 9.5, 10.0)]
print("| true steps | episode | train average_score |")
print("|---|---|---|")
i = 0
for m in milestones:
    while i < len(rows) and rows[i][0] < m:
        i += 1
    if i >= len(rows):
        break
    ts, ep, sc = rows[i]
    print(f"| {ts/1e9:.2f}B | {ep} | {sc:.2f} |")
ts, ep, sc = rows[-1]
print(f"| **{ts/1e9:.2f}B (last)** | {ep} | **{sc:.2f}** |")
