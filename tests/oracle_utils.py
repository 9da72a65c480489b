"""Local replica of the driver's correctness gate: run a Spark query
and its DuckDB oracle SQL on the same parquet dir, compare row count,
schema (column names), and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from mapreduce_implementation_grpc_spark.sources.catalog import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = []
    for row in pdf.itertuples(index=False):
        canon_row = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                canon_row.append(None)
            elif isinstance(v, float):
                canon_row.append(round(v, 9))
            elif hasattr(v, "item"):  # numpy scalar
                item = v.item()
                canon_row.append(round(item, 9) if isinstance(item, float) else item)
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                canon_row.append(tuple(v))
            else:
                canon_row.append(v)
        rows.append(tuple(canon_row))
    return sorted(rows, key=repr)


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    got = spark_df.toPandas()
    want = run_oracle(oracle_sql, sf_dir)
    assert sorted(got.columns) == sorted(want.columns), (
        f"schema mismatch: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    g, w = _canon(got), _canon(want)
    mism = [(a, b) for a, b in zip(g, w) if a != b]
    assert not mism, f"{len(mism)} mismatching rows; first 3: {mism[:3]}"
