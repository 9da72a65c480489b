"""Local replica of the driver's t2 correctness gate.

Usage: python tools/check_correctness.py [sf_dir] [name ...]
Runs every registry query (or the named subset) against its DuckDB
oracle and prints per-query row-count/schema/value-hash status.
"""

from __future__ import annotations

import hashlib
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from mapreduce_implementation_grpc_spark import registry
from mapreduce_implementation_grpc_spark.session import get_spark
from mapreduce_implementation_grpc_spark.sources.catalog import TABLES


def value_hash(rows, cols) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(repr(tuple(r[i] for i in order)) for r in rows)
    return hashlib.md5("\n".join(canon).encode()).hexdigest()[:12]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(registry.QUERIES)
    spark = get_spark(app_name="check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name in names:
        try:
            sdf = registry.QUERIES[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            if name not in registry.ORACLES:
                print(f"  {name}: rows-only rows={len(srows)} (no oracle)")
                continue
            orc = con.execute(registry.ORACLES[name])
            orows = orc.fetchall()
            ocols = [d[0] for d in orc.description]
            schema_ok = sorted(sdf.columns) == sorted(ocols)
            hash_ok = value_hash(srows, sdf.columns) == value_hash(orows, ocols)
            ok = schema_ok and len(srows) == len(orows) and hash_ok
            status = "OK " if ok else "FAIL"
            failures += 0 if ok else 1
            print(
                f"  {name}: {status} rows={len(srows)}/{len(orows)} "
                f"schema={'ok' if schema_ok else f'{sorted(sdf.columns)} vs {sorted(ocols)}'} "
                f"hash={'ok' if hash_ok else 'MISMATCH'}"
            )
        except Exception:
            failures += 1
            print(f"  {name}: ERROR\n{traceback.format_exc()}")
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'} on {sf_dir}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
