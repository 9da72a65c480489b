"""Driver-rotation staleness report (VERDICT r5 #6): with 190+
registry queries and ~50 driver CORRECTNESS slots per round, the
oldest green check ages several rounds between rotations. This
report reads every CORRECTNESS_r*.json and prints, per registry
query, the LAST round it was driver-green (all three gates) -- so
the end-of-round battery can provably target the stalest queries
first, and a query that has NEVER had a driver row is loud.

Usage:
  python tools/staleness_report.py            # full report
  python tools/staleness_report.py --stalest N  # N stalest query names only
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gather() -> tuple[dict[str, int], dict[str, int], list[str]]:
    """Returns (last_green_round, last_checked_round, never_checked).

    green = rows_match and schema_match and hash_match and no err.
    The two documented rows-only sketches (no DuckDB oracle) record
    err='no_oracle' with a row count: that is their strongest
    possible driver check, so it counts as green for staleness."""
    from mapreduce_implementation_grpc_spark import registry

    last_green: dict[str, int] = {}
    last_checked: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            doc = json.load(fh)
        for name, row in doc.items():
            last_checked[name] = max(last_checked.get(name, 0), rnd)
            ok = isinstance(row, dict) and (
                (
                    row.get("rows_match") is True
                    and row.get("schema_match", True) is True
                    and row.get("hash_match", True) is True
                    and not row.get("err")
                )
                or (
                    row.get("err") == "no_oracle"
                    and row.get("spark_rows") is not None
                )
            )
            if ok:
                last_green[name] = max(last_green.get(name, 0), rnd)
    never = sorted(set(registry.QUERIES) - set(last_checked))
    return last_green, last_checked, never


def new_this_round() -> set[str]:
    """Queries added since the last driver round: absent from the
    newest BENCH_r*.json artifact's three sections (that artifact is
    written from the full registry at round end, so anything missing
    was registered after it). These legitimately have no driver
    CORRECTNESS row yet -- and because __spark_entry__ orders its
    queries least-verified-first, they are guaranteed front slots in
    the NEXT driver rotation."""
    # the driver also commits side artifacts like BENCH_r10_c8.json
    # (the low-core scaling run) -- only plain BENCH_r<N>.json names
    # are round artifacts
    paths = sorted(
        (
            p
            for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
            if re.search(r"BENCH_r(\d+)\.json$", p)
        ),
        key=lambda p: int(re.search(r"BENCH_r(\d+)\.json$", p).group(1)),
    )
    if not paths:
        return set()
    with open(paths[-1]) as fh:
        doc = json.load(fh)
    benched: set[str] = set()
    for sec in ("queries", "eager_queries", "extended_queries"):
        benched |= set(doc.get(sec) or {})
    from mapreduce_implementation_grpc_spark import registry

    return set(registry.QUERIES) - benched


def main() -> None:
    from mapreduce_implementation_grpc_spark import registry

    last_green, last_checked, never = gather()
    latest = max(last_checked.values(), default=0)

    def staleness(name: str) -> int:
        return latest - last_green.get(name, -10)

    ranked = sorted(registry.QUERIES, key=lambda n: (-staleness(n), n))

    if len(sys.argv) >= 3 and sys.argv[1] == "--stalest":
        for name in ranked[: int(sys.argv[2])]:
            print(name)
        return

    print(f"latest driver round: r{latest:02d}")
    if never:
        fresh = new_this_round()
        stale_never = sorted(set(never) - fresh)
        if stale_never:
            print(
                f"NEVER driver-checked ({len(stale_never)}): "
                f"{', '.join(stale_never)}"
            )
        added = sorted(set(never) & fresh)
        if added:
            print(
                f"new this round, first driver check pending "
                f"({len(added)}): {', '.join(added)}"
            )
    red = sorted(
        n for n in last_checked
        if n in registry.QUERIES and last_green.get(n, 0) < last_checked[n]
    )
    if red:
        print(f"checked-but-not-green at last check ({len(red)}): {', '.join(red)}")
    buckets: dict[int, list[str]] = {}
    for name in registry.QUERIES:
        if name in last_green:
            buckets.setdefault(latest - last_green[name], []).append(name)
    for age in sorted(buckets, reverse=True):
        names = sorted(buckets[age])
        print(f"\nlast green {age} round(s) ago ({len(names)}):")
        for name in names:
            print(f"  {name}")


def write_ledger() -> None:
    """--write: emit STALENESS.json, the committed per-query freshness
    ledger (VERDICT r7 #7): last driver-green round, last
    driver-checked round, and last LOCAL replica-battery
    green/checked round (from LOCAL_BATTERY.json, maintained by
    tools/check_correctness.py). Every registry query appears
    (contract-tested), so freshness is auditable from one artifact
    instead of re-deriving it from every CORRECTNESS_r*.json."""
    from mapreduce_implementation_grpc_spark import registry

    last_green, last_checked, _never = gather()
    latest = max(last_checked.values(), default=0)
    local: dict = {}
    lb_path = os.path.join(REPO, "LOCAL_BATTERY.json")
    if os.path.exists(lb_path):
        with open(lb_path) as fh:
            local = json.load(fh).get("queries", {})
    fresh = new_this_round()
    queries = {}
    for name in sorted(registry.QUERIES):
        lrow = local.get(name, {})
        queries[name] = {
            "last_driver_green": last_green.get(name),
            "last_driver_checked": last_checked.get(name),
            "last_local_green": lrow.get("last_green_round"),
            "last_local_checked": lrow.get("last_checked_round"),
            "new_this_round": name in fresh,
        }
    doc = {
        "latest_driver_round": latest,
        "n_queries": len(queries),
        "n_driver_green_ever": sum(
            1 for q in queries.values() if q["last_driver_green"]
        ),
        "queries": queries,
    }
    out = os.path.join(REPO, "STALENESS.json")
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"wrote {out}: {doc['n_queries']} queries, "
        f"{doc['n_driver_green_ever']} ever driver-green, "
        f"latest driver round r{latest:02d}"
    )


if __name__ == "__main__":
    if "--write" in sys.argv:
        write_ledger()
    else:
        main()
