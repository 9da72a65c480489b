"""10x scale probe runner (round 10, VERDICT r9 #2): times a pinned
set of data-proportional queries at sf0.1 and at the builder-generated
sf1-equivalent dataset (tools/scale_probe_data.py, 10x disjoint
replicas), in FRESH JVMs via bench.py's worker mode (same warmup,
same median-of-N methodology as the canary tier).

The quantity of interest is ratio10x = t(10x) / t(sf0.1) per query:
- ratio ~= 1   -> still constant-dominated (JVM/Catalyst overhead)
- ratio ~= 10  -> fully data-proportional (ideal linear scaling)
- ratio >> 10  -> superlinear: a stage that will not survive 100 TB
  (driver collect, broadcast past its fit, quadratic fan-out) --
  the failure class this probe exists to catch.
Writes tools/scale_probe.json; tests/test_scale_probe_ledger.py pins
the committed ratios under per-query ceilings.

Usage: python tools/scale_probe.py [probe_dir] [runs]
(generates the probe dataset first if absent)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")
SF01 = "/root/testdata/sf0.1"

# data-proportional probe set: the canaries with the largest measured
# sf<=0.1 slopes (tools/canary_slope.json) + market_share (the r9
# advisory's unexplained one-run spike -- re-measured here at both
# volumes) + wordcount/dedup as near-constant controls
PROBE_QUERIES = [
    "cosupply_triangles",
    "purchase_pagerank",
    "events_hopping",
    "events_sessionize",
    "orders_running_total",
    "pricing_summary",
    "top_customers",
    "market_share",
    "minhash_near_dup",
    "simhash",
    "wordcount",
    "dedup_exact",
    # r11 (VERDICT r10 #8): the rewritten paths -- confirm the removed
    # exchanges/scans grow the win with data, not just at sf0.1
    "cosupply_clustering",
    "copurchase_butterflies",
    "cosupply_link_prediction_capped",
    "event_conversion_absorption",
    "dq_audit",
    "events_acf",
    "embedding_mutual_nn_lsh",
    "cms_screened_wordcount",
]


def _run_worker(sf_dir: str, runs: int, workdir: str, tag: str) -> dict:
    spec_path = os.path.join(workdir, f"probe_{tag}.spec.json")
    out_path = os.path.join(workdir, f"probe_{tag}.out.json")
    with open(spec_path, "w") as fh:
        json.dump(
            {"tier": f"scaleprobe-{tag}", "names": PROBE_QUERIES,
             "runs": runs, "sf_dir": sf_dir, "out": out_path},
            fh,
        )
    proc = subprocess.run(
        [sys.executable, BENCH, "--worker", spec_path],
        capture_output=True, text=True, cwd=REPO, env=os.environ,
    )
    if proc.returncode != 0 or not os.path.exists(out_path):
        sys.stderr.write(proc.stderr[-3000:] + "\n")
        raise SystemExit(f"probe worker {tag} failed")
    with open(out_path) as fh:
        return json.load(fh)["timings"]


def main() -> None:
    probe_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale10"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    if not os.path.exists(os.path.join(probe_dir, "lineitem.parquet")):
        from scale_probe_data import build  # noqa: PLC0415

        build(probe_dir, 10)
    with tempfile.TemporaryDirectory(prefix="scaleprobe_") as workdir:
        base = _run_worker(SF01, runs, workdir, "sf01")
        big = _run_worker(probe_dir, runs, workdir, "x10")
    doc = {
        "probe_dir": probe_dir,
        "k": 10,
        "runs": runs,
        "queries": {
            q: {
                "sf0.1_sec": base[q],
                "x10_sec": big[q],
                "ratio10x": round(big[q] / base[q], 2) if base[q] else None,
            }
            for q in PROBE_QUERIES
        },
    }
    out = os.path.join(REPO, "tools", "scale_probe.json")
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(doc["queries"], indent=1, sort_keys=True))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
