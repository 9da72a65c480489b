"""Per-canary scale-slope probe (VERDICT r8 #4): time the pinned
CANARY_QUERIES at sf0.001 / sf0.01 / sf0.1 -- one fresh JVM per SF
via bench.py's worker mode, median-of-3, identical warmup -- and fit
the log-log slope of wall time against scale factor.

Why: the per-round bench is a single sf0.1 point; a superlinear plan
hiding under a small constant is invisible there. Three decades of SF
expose it: slope ~1 = linear in data, <1 = overhead/constant-
dominated at these sizes, >SLOPE_CEILING = superlinear -- must be a
documented quadratic-by-design query or it's a scale bug.

Caveats the numbers carry: (a) sf scales the TPC-H fact tables ~100x
across the range, but documents/embeddings/events grow slower (e.g.
embeddings 500 -> 2000 rows), so a slope on an embeddings-only query
understates its data exponent; (b) at sf<=0.01 most queries are
planning/startup-dominated, pulling slopes toward 0 -- the probe is a
regression tripwire, not a complexity proof.

Writes tools/canary_slope.json (committed; tests/test_canary_slope.py
lints that every query above the ceiling is allowlisted-with-reason)
and prints the SCALING.md markdown table.

Usage: python tools/canary_slope.py  (quiet machine; ~4 min)
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

from mapreduce_implementation_grpc_spark import registry  # noqa: E402

SFS = ["0.001", "0.01", "0.1"]
RUNS = 3
SLOPE_CEILING = 1.3
OUT = os.path.join(REPO, "tools", "canary_slope.json")


def time_canary(sf: str, workdir: str) -> dict[str, float]:
    spec_path = os.path.join(workdir, f"canary_{sf}.spec.json")
    out_path = os.path.join(workdir, f"canary_{sf}.out.json")
    with open(spec_path, "w") as fh:
        json.dump(
            {
                "tier": f"canary_slope_{sf}",
                "names": list(registry.CANARY_QUERIES),
                "runs": RUNS,
                "sf_dir": f"/root/testdata/sf{sf}",
                "out": out_path,
            },
            fh,
        )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--worker", spec_path],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=os.environ,
    )
    if proc.returncode != 0 or not os.path.exists(out_path):
        raise SystemExit(
            f"canary worker at sf{sf} failed (rc={proc.returncode}):\n"
            + proc.stderr[-2000:]
        )
    with open(out_path) as fh:
        return json.load(fh)["timings"]


def fit_slope(times: list[float]) -> float:
    """Least-squares slope of log10(t) on log10(sf) over the 3 points."""
    xs = [math.log10(float(sf)) for sf in SFS]
    ys = [math.log10(max(t, 1e-3)) for t in times]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return num / den


def main() -> None:
    per_sf: dict[str, dict[str, float]] = {}
    with tempfile.TemporaryDirectory(prefix="canary_slope_") as workdir:
        for sf in SFS:
            per_sf[sf] = time_canary(sf, workdir)
            print(f"sf{sf}: total {sum(per_sf[sf].values()):.1f}s", file=sys.stderr)

    doc = {"runs": RUNS, "sfs": SFS, "slope_ceiling": SLOPE_CEILING, "queries": {}}
    for name in registry.CANARY_QUERIES:
        times = [per_sf[sf][name] for sf in SFS]
        doc["queries"][name] = {
            **{f"sf{sf}_sec": t for sf, t in zip(SFS, times)},
            "slope": round(fit_slope(times), 3),
        }
    with open(OUT, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
        fh.write("\n")

    print("| canary query | sf0.001 | sf0.01 | sf0.1 | log-log slope |")
    print("|---|---|---|---|---|")
    for name, row in sorted(
        doc["queries"].items(), key=lambda kv: -kv[1]["slope"]
    ):
        flag = " **(> ceiling)**" if row["slope"] > SLOPE_CEILING else ""
        print(
            f"| {name} | {row['sf0.001_sec']} | {row['sf0.01_sec']} "
            f"| {row['sf0.1_sec']} | {row['slope']}{flag} |"
        )


if __name__ == "__main__":
    main()
