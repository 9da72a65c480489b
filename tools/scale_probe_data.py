"""Builder-generated 10x scale-probe dataset (round 10, VERDICT r9
#2): the slope ledger's own finding is that every canary is
constant-dominated at sf<=0.1 (max slope 0.48), so the bench mostly
measures JVM+Catalyst overhead and the data-proportional behavior of
the heavy operators is unobserved. The driver's testdata tops out at
sf0.1 (read-only), so this tool derives an sf1-EQUIVALENT dataset
from it: K=10 disjoint replicas of every SF-scaling table with all
primary/foreign keys offset per replica (the driver's own scaling
law multiplies customer/supplier/part/orders/lineitem/events by 10
per SF step; region/nation stay fixed and are copied verbatim).

Replication semantics -- what the probe does and does not measure:
- Keys are offset consistently (replica i adds i*offset to every
  key column of a family), so referential integrity holds and each
  replica is a disjoint copy: the co-supply graph becomes 10
  disjoint copies of the sf0.1 graph, joins match only within a
  replica. Ideal data-proportional runtime is therefore ~10x the
  data-bound part of the sf0.1 runtime; anything wildly superlinear
  indicates a non-scalable stage (driver collect, broadcast that
  stopped fitting, partition-count ceiling), which is exactly what
  the probe hunts.
- Per-node/degree DENSITY is held fixed (true TPC-H SF growth also
  densifies some graphs); the probe isolates volume scaling.
- documents/embeddings replicas duplicate content verbatim; dedup
  operators see a 90%-duplicate corpus (still a valid throughput
  probe -- fingerprint/groupBy work scales with rows -- but the
  result SHAPE differs from a real corpus).

Deterministic: pure DuckDB SQL over the read-only source parquet;
same inputs -> byte-identical outputs. ~170 MB at K=10, written
OUTSIDE the repo (default /tmp/spark_graft_scale10) -- the durable
artifacts are the committed measurements (tools/scale_probe.json,
SCALING.md r10) plus this regenerator.

Usage: python tools/scale_probe_data.py [out_dir] [K]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# key families: every column in any table that carries the family's
# id gets the same per-replica offset, chosen as a power of ten
# comfortably above the family's max id at sf0.1
KEY_OFFSETS = {
    "custkey": 100_000,
    "suppkey": 10_000,
    "partkey": 100_000,
    "orderkey": 1_000_000,
    "event_id": 1_000_000,
    "user_id": 100_000,
    "doc_id": 100_000,
    "vec_id": 100_000,
}

# table -> list of (column, key family); all other columns copy as-is
SCALED_TABLES = {
    "customer": [("c_custkey", "custkey")],
    "supplier": [("s_suppkey", "suppkey")],
    "part": [("p_partkey", "partkey")],
    "orders": [("o_orderkey", "orderkey"), ("o_custkey", "custkey")],
    "lineitem": [
        ("l_orderkey", "orderkey"),
        ("l_partkey", "partkey"),
        ("l_suppkey", "suppkey"),
    ],
    "events": [("event_id", "event_id"), ("user_id", "user_id")],
    "documents": [("doc_id", "doc_id")],
    "embeddings": [("vec_id", "vec_id")],
}

STATIC_TABLES = ["region", "nation"]


def build(out_dir: str, k: int = 10) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in STATIC_TABLES:
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, keys in SCALED_TABLES.items():
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        keyed = dict(keys)
        select = ", ".join(
            f"CAST(t.{c} + i.k * {KEY_OFFSETS[keyed[c]]} AS BIGINT) AS {c}"
            if c in keyed
            else f"t.{c}"
            for c in cols
        )
        con.sql(
            f"COPY (SELECT {select} FROM '{SRC}/{t}.parquet' t, "
            f"range({k}) i(k)) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    sizes = {
        t: con.sql(f"SELECT count(*) FROM '{out_dir}/{t}.parquet'").fetchone()[0]
        for t in list(STATIC_TABLES) + list(SCALED_TABLES)
    }
    print({"out_dir": out_dir, "k": k, "rows": sizes})


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale10"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    build(out, k)
