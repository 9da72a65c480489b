"""Compare two same-code bench documents (the r11 round-start pair):
per-query ratios, geomean, and the spread distribution -- quantifies
run-to-run noise on THIS host so code-change deltas can be read
against it (VERDICT r10 #1).

Usage: python tools/bench_pair_compare.py A.json B.json
"""

from __future__ import annotations

import json
import math
import sys


def main() -> None:
    a_doc = json.load(open(sys.argv[1]))
    b_doc = json.load(open(sys.argv[2]))
    sections = ("queries", "eager_queries", "extended_queries")
    ratios: dict[str, float] = {}
    for sec in sections:
        for name, ta in a_doc.get(sec, {}).items():
            tb = b_doc.get(sec, {}).get(name)
            if tb and ta:
                ratios[name] = tb / ta
    vals = sorted(ratios.values())
    n = len(vals)
    geo = math.exp(sum(math.log(v) for v in vals) / n)
    print(f"n={n} geomean(B/A)={geo:.3f} median={vals[n // 2]:.3f} "
          f"p10={vals[n // 10]:.3f} p90={vals[9 * n // 10]:.3f}")
    over = {k: round(v, 2) for k, v in ratios.items() if v > 1.10 or v < 0.90}
    print(f"outside +-10%: {len(over)}/{n}")
    for k, v in sorted(over.items(), key=lambda kv: kv[1]):
        print(f"  {k:40s} {v}")
    for tot in ("value", "canary_total_sec", "eager_total_sec",
                "extended_total_sec"):
        print(f"{tot}: A={a_doc[tot]} B={b_doc[tot]} "
              f"ratio={b_doc[tot] / a_doc[tot]:.3f}")


if __name__ == "__main__":
    main()
