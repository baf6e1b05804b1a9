"""Compare two bench JSONs (bench_out/*.json) and report per-query
deltas that exceed measurement noise.

Usage: python bench_diff.py OLD.json NEW.json [--threshold-pct 25]

A delta counts as a regression/improvement only when it exceeds BOTH
the recorded per-query spread (max-min across the best-of-N runs of
whichever file carries one) AND the relative threshold — deltas inside
the spread are unfalsifiable on a shared box and are not reported.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold-pct", type=float, default=25.0)
    args = ap.parse_args()

    old = json.load(open(args.old))
    new = json.load(open(args.new))
    qo, qn = old["queries"], new["queries"]
    so, sn = old.get("spread", {}), new.get("spread", {})
    common = sorted(set(qo) & set(qn))

    reg, imp = [], []
    for q in common:
        a, b = qo[q], qn[q]
        noise = max(so.get(q, 0.0), sn.get(q, 0.0))
        delta = b - a
        if abs(delta) <= noise:
            continue
        if abs(delta) < a * args.threshold_pct / 100.0:
            continue
        (reg if delta > 0 else imp).append((q, a, b, noise))

    tot_o = sum(qo[q] for q in common)
    tot_n = sum(qn[q] for q in common)
    print(
        f"common queries: {len(common)}  total {tot_o:.1f}s -> {tot_n:.1f}s  "
        f"(only {len(set(qn) - set(qo))} new / {len(set(qo) - set(qn))} "
        f"removed queries excluded)"
    )
    print(
        f"loadavg_1m: {old.get('loadavg_1m')} -> {new.get('loadavg_1m')}  "
        f"(high load inflates everything; min-of-N partially compensates)"
    )
    for title, rows in (("REGRESSIONS", reg), ("improvements", imp)):
        print(f"\n{title}: {len(rows)}")
        for q, a, b, noise in sorted(rows, key=lambda r: -(abs(r[2] - r[1]))):
            print(f"  {q:36s} {a:7.2f}s -> {b:7.2f}s  (spread {noise:.2f}s)")
    return 1 if reg else 0


if __name__ == "__main__":
    sys.exit(main())
