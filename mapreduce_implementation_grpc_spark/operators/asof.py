"""As-of (point-in-time) join: for each left row, attach the latest
right row with right_ts <= left_ts for the same key -- the
feature-store operation of a training pipeline (join each example to
the freshest feature snapshot that existed at example time, never a
future one: leakage-free by construction).

Spark has no native ASOF JOIN (DuckDB/pandas do). A naive range
join (l JOIN r ON key AND r.ts <= l.ts, then max) explodes to every
(left, earlier-right) pair -- quadratic per key. The scale-safe shape
used here is the union + ordered-window trick:

  1. tag left rows side=1, right rows side=0, union them;
  2. one window per key ordered by (ts, side): running
     last(value, ignoreNulls) carries the newest right payload
     forward;
  3. keep only left rows.

Cost: ONE shuffle on the key (the window), linear rows, no pair
blow-up -- at 100 TB this is the same price as any keyed window.
Right rows sort before left rows at equal ts, so matching is
inclusive (right_ts == left_ts matches).

Requirement: the right side must be unique per (key, ts) -- callers
pre-aggregate (a feature snapshot table is). The whole right payload
is carried as ONE struct, so the attached values are always an
atomic snapshot from a single right row, never a column-wise mix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join. Returns every left row plus, for each name in
    value_cols, the value from the latest right row whose right_ts <=
    the left row's left_ts (same `by` key); NULL when no such row."""
    value_cols = value_cols or [
        c for c in right.columns if c not in (by, right_ts)
    ]
    left_payload = [c for c in left.columns if c not in (by, left_ts)]
    snap_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in value_cols]
    )

    l_side = left.select(
        F.col(by),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(snap_type).alias("_snap"),
    )
    r_side = right.select(
        F.col(by),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        F.struct(*[F.col(c) for c in value_cols]).alias("_snap"),
    )
    u = l_side.unionByName(r_side)
    w = (
        Window.partitionBy(by)
        .orderBy(F.asc("_t"), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        by,
        "_t",
        "_side",
        *left_payload,
        F.last("_snap", ignorenulls=True).over(w).alias("_snap"),
    )
    return carried.filter(F.col("_side") == 1).select(
        by,
        F.col("_t").alias(left_ts),
        *left_payload,
        *[F.col(f"_snap.{c}").alias(c) for c in value_cols],
    )
