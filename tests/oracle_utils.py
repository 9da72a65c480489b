"""Local replica of the driver's correctness gate: run a Spark query
and its DuckDB oracle SQL on the same parquet dir, compare row count,
schema (column names), and order-insensitive values.

DTYPE-STRICT by design (round-7 fix): the driver hashes the pandas
rendering of both result sets, so `7` (int64) vs `7.0` (float64) vs
`Decimal('7')` are three DIFFERENT values to it even though Python's
`==` says they're equal. The r6 reds (`score_auc`,
`user_wallet_balance`) passed the old repr/`==`-based replica while
failing the driver for exactly this reason: DuckDB pandas-ifies
HUGEINT and DECIMAL columns as float64 while Spark ships long /
Decimal. `_canon` therefore tags every scalar with a dtype class —
int-like / float-like / Decimal / bool / str / bytes / temporal /
array — so the replica reproduces the driver's verdict instead of
silently canonicalizing the divergence away. Temporal values are
normalized to ISO strings (pandas may materialize dates as
datetime64[ns] or object-of-date depending on the Arrow path; the
calendar instant is what both engines mean).
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import pandas as pd

from mapreduce_implementation_grpc_spark.sources.catalog import TABLES


# Strict float lens (VERDICT r7 #2): _canon compares raw IEEE bits
# via float.hex() instead of round(v, 9). STRICT IS THE DEFAULT as of
# round 8 -- the full 271-oracle battery passes bit-exact at sf0.001
# AND sf0.01 (the repo's convention is bit-identical cross-engine
# arithmetic: exact-integer state, 9/12dp-decimal routed sums), and
# the driver's pandas-repr hash is itself bit-sensitive, so the
# lenient lens could hide exactly the class of gap r6 shipped.
# SPARK_GRAFT_CANON_BITEXACT=0 restores the 9dp lens for debugging a
# divergence (seeing WHICH digits move), never for making a red row
# green.
BITEXACT_FLOATS = os.environ.get("SPARK_GRAFT_CANON_BITEXACT", "1") == "1"


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _canon_value(v):
    """Dtype-tagged canonical form of one cell: equal iff a
    dtype-sensitive driver hash would call them equal."""
    if v is None:
        return None
    # bool before int: Python bool subclasses int
    if isinstance(v, bool):
        return ("b", v)
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        if type(v).__name__ == "bool_":
            return ("b", bool(v))
        v = v.item()  # numpy scalar -> python scalar, then fall through
        if isinstance(v, bool):
            return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return None
        if BITEXACT_FLOATS:
            # strict mode (VERDICT r7 #2): the driver's hash is the
            # pandas repr of the raw double, so 9dp rounding here is
            # MORE LENIENT than the driver -- a query that is only
            # 9dp-close would pass this replica and fail the gate.
            # float.hex() is lossless: equal hex == equal IEEE bits,
            # and -0.0 stays distinct from 0.0, exactly like the
            # driver's string rendering.
            return ("f", v.hex())
        return ("f", round(v, 9))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, decimal.Decimal):
        return ("d", str(v))
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        if v != v:  # NaT
            return None
        return ("t", v.isoformat())
    if isinstance(v, datetime.date):
        return ("t", v.isoformat())
    if isinstance(v, bytes):
        return ("y", v)
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return ("a", tuple(_canon_value(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, _canon_value(x)) for k, x in v.items())))
    if v != v:  # pandas NaT / other NaN-like
        return None
    return ("o", repr(v))


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = [
        tuple(_canon_value(v) for v in row)
        for row in pdf.itertuples(index=False)
    ]
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
