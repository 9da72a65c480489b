"""Accumulation A/B: measure how much a long-lived single JVM inflates
query wall times versus a fresh one (VERDICT r7 #1).

The r6->r7 canonical bench showed shared-query walls drifting 1.33x on
plans whose source did not change (purchase_pagerank 3.58 -> 6.82 s)
-- attributed to sequential-JVM accumulation as the registry grew, but
never MEASURED. This probe makes the claim testable:

  A (control):     fresh JVM -> warmup -> time each CANARY query once
  B (accumulated): fresh JVM -> warmup -> execute N other headline
                   plans untimed -> time each CANARY query once

Both conditions reuse bench.py's worker (same session config, same
noop-sink timing), so the ONLY difference is the accumulated plans.
Output: per-query A/B walls + ratio, plus the geometric-mean ratio.
Results are recorded in SCALING.md; bench.py's fresh-JVM-per-tier
layout exists because B/A > 1.

Usage: python tools/bench_ab_probe.py [sf_dir] [n_accumulate]
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mapreduce_implementation_grpc_spark import registry


def run_condition(tag: str, sf_dir: str, preload: list[str],
                  workdir: str) -> dict[str, float]:
    spec_path = os.path.join(workdir, f"{tag}.spec.json")
    out_path = os.path.join(workdir, f"{tag}.out.json")
    with open(spec_path, "w") as fh:
        json.dump(
            {
                "tier": f"ab-{tag}",
                "names": list(registry.CANARY_QUERIES),
                "runs": 1,
                "sf_dir": sf_dir,
                "out": out_path,
                "preload": preload,
            },
            fh,
        )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--worker",
         spec_path],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=os.environ,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-3000:] + "\n")
        raise SystemExit(1)
    with open(out_path) as fh:
        return json.load(fh)["timings"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_acc = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    pool = [
        q for q in registry.BENCH_QUERIES
        if q not in set(registry.CANARY_QUERIES)
    ]
    # n_accumulate may exceed the pool: cycle it, so the probe can
    # reproduce the depth of a full canonical run (270 queries x
    # median-of-3 = 800+ plan executions in one JVM)
    acc = (pool * (n_acc // len(pool) + 1))[:n_acc]

    with tempfile.TemporaryDirectory(prefix="bench_ab_") as workdir:
        a = run_condition("control", sf_dir, [], workdir)
        b = run_condition("accumulated", sf_dir, acc, workdir)

    rows = []
    for q in registry.CANARY_QUERIES:
        ratio = b[q] / a[q] if a[q] > 0 else float("nan")
        rows.append((q, a[q], b[q], ratio))
        print(f"{q:38s} A={a[q]:7.3f}s  B={b[q]:7.3f}s  B/A={ratio:5.2f}")
    ratios = [r for _, _, _, r in rows if r == r and r > 0]
    gmean = math.exp(sum(math.log(r) for r in ratios) / len(ratios))
    doc = {
        "sf_dir": sf_dir,
        "n_accumulated_plans": len(acc),
        "control_total_sec": round(sum(a.values()), 3),
        "accumulated_total_sec": round(sum(b.values()), 3),
        "geomean_ratio": round(gmean, 3),
        "per_query": {
            q: {"control": av, "accumulated": bv, "ratio": round(r, 3)}
            for q, av, bv, r in rows
        },
    }
    print(json.dumps({k: doc[k] for k in
                      ("n_accumulated_plans", "control_total_sec",
                       "accumulated_total_sec", "geomean_ratio")}))
    out = os.path.join(REPO, "tools", "bench_ab_probe.json")
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    main()
