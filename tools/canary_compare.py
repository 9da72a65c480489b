"""Canary-vs-canary round comparison (VERDICT r8 #2): compare the
current BENCH.json canary tier against a prior round's BENCH_r{N}
artifact query-by-query. The canary tier is the only surface whose
environment is pinned across rounds (fresh JVM, warmup, bounded
pinned prefix), so these deltas are attributable: anything outside
the measured noise band (±10% per query, 2% total; SCALING.md r8/r9
-- sub-second rows can jitter up to ~1.3x, so trust the TOTAL and
treat sub-second per-query swings as noise) needs a code diff to
explain.

Usage: python tools/canary_compare.py [BENCH_r08.json] [BENCH.json]
Prints the markdown table for SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOISE = 1.1  # per-query ±10% noise band (r8 A/B probe, r9 refinement)


def main() -> None:
    old_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "BENCH_r08.json")
    new_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "BENCH.json")
    with open(old_path) as fh:
        old = json.load(fh)
    with open(new_path) as fh:
        new = json.load(fh)
    co, cn = old["canary_queries"], new["canary_queries"]
    shared = [q for q in co if q in cn]
    print(f"| canary query | {os.path.basename(old_path)} | {os.path.basename(new_path)} | ratio |")
    print("|---|---|---|---|")
    flagged = []
    for q in sorted(shared, key=lambda q: -(cn[q] / co[q])):
        ratio = cn[q] / co[q]
        mark = " **(> noise)**" if ratio > NOISE or ratio < 1 / NOISE else ""
        if mark:
            flagged.append((q, ratio))
        print(f"| {q} | {co[q]} | {cn[q]} | {ratio:.2f}{mark} |")
    to, tn = sum(co[q] for q in shared), sum(cn[q] for q in shared)
    print(
        f"| **total (shared {len(shared)})** | {to:.3f} | {tn:.3f} "
        f"| {tn / to:.3f} |"
    )
    only_new = [q for q in cn if q not in co]
    if only_new:
        print(f"\nnew canaries this round: "
              + ", ".join(f"{q}={cn[q]}s" for q in only_new))
    if flagged:
        print(f"\noutside ±{(NOISE-1)*100:.0f}% noise: "
              + ", ".join(f"{q} ({r:.2f}x)" for q, r in flagged))


if __name__ == "__main__":
    main()
