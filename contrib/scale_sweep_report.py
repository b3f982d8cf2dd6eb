"""Turn a `scale_proof_docs.py --all` JSON into the SCALE.md distribution
table: per-query sf1/sf0.1 wall ratio (10x input), sorted worst-first,
with output-row growth alongside so output-bound queries (pair emitters
on the dup-saturated offset corpus) are distinguishable from plan
regressions.

Usage:
    python contrib/scale_sweep_report.py /tmp/scale_sweep_all.json [N]
Prints a markdown table of the N worst ratios (default 15) plus summary
percentiles of the full distribution.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    data = json.load(open(sys.argv[1]))
    n_worst = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    names = sorted({k.split(":", 1)[1] for k in data})
    rows = []
    for name in names:
        a = data.get(f"sf0.1:{name}")
        b = data.get(f"sf1:{name}")
        if not a or not b:
            continue
        if a["sec"] < 0 or b["sec"] < 0:
            rows.append((float("inf"), name, a, b))
            continue
        # floor tiny sf0.1 walls: ratio over a 0.05s base is scheduling
        # noise, not scaling signal
        ratio = b["sec"] / max(a["sec"], 0.05)
        rows.append((ratio, name, a, b))
    rows.sort(reverse=True)

    finite = sorted(r[0] for r in rows if r[0] != float("inf"))

    def pct(p: float) -> float:
        return round(finite[min(len(finite) - 1, int(p * len(finite)))], 2)

    print(f"queries: {len(rows)}  failed: {sum(1 for r in rows if r[0] == float('inf'))}")
    if finite:
        print(
            f"wall-ratio distribution (sf1/sf0.1, 10x input): "
            f"p50={pct(0.5)} p75={pct(0.75)} p90={pct(0.9)} p95={pct(0.95)} max={round(finite[-1], 2)}"
        )
    else:
        print("wall-ratio distribution: no successful pairs (all FAIL)")
    print()
    print("| query | sf0.1 s | sf1 s | wall ratio | rows sf0.1 | rows sf1 | row ratio |")
    print("|---|---|---|---|---|---|---|")
    for ratio, name, a, b in rows[:n_worst]:
        rr = (
            round(b["rows"] / max(a["rows"], 1), 1)
            if a["rows"] >= 0 and b["rows"] >= 0
            else "-"
        )
        r = "FAIL" if ratio == float("inf") else round(ratio, 2)
        print(
            f"| {name} | {a['sec']} | {b['sec']} | {r} | {a['rows']} | {b['rows']} | {rr} |"
        )


if __name__ == "__main__":
    main()
