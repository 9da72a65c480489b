"""Z-order layout: Morton-code properties, the measured skipping
advantage, and the z-ordered parquet writer's file-level locality.

Oracle parity for zorder_cells / zorder_skipping_summary runs in the
registry-wide sweep (test_oracle_coverage); these tests pin the
properties the hash can't express: the interleave is a bijection, the
layout actually bounds BOTH dimensions, and written files carry the
bounded footer ranges the whole design exists to produce.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_implementation_grpc_spark import registry
from mapreduce_implementation_grpc_spark.operators.zorder import (
    BITS,
    morton_col,
    morton_sql,
    write_zordered,
)
from mapreduce_implementation_grpc_spark.sources.catalog import load_table


def _deinterleave(z: int, bits: int = BITS) -> tuple[int, int]:
    x = y = 0
    for i in range(bits):
        x |= ((z >> (2 * i)) & 1) << i
        y |= ((z >> (2 * i + 1)) & 1) << i
    return x, y


def test_morton_col_is_exact_interleave(spark):
    pairs = [(x, y) for x in (0, 1, 5, 170, 255) for y in (0, 3, 128, 255)]
    df = spark.createDataFrame(pairs, "bx long, by long")
    rows = df.select("bx", "by", morton_col(F.col("bx"), F.col("by")).alias("z")).collect()
    for r in rows:
        assert _deinterleave(r.z) == (r.bx, r.by)
    # and the generated SQL text computes the identical code JVM-side
    sql_rows = df.selectExpr("bx", "by", morton_sql("bx", "by") + " AS z").collect()
    assert sorted((r.bx, r.by, r.z) for r in rows) == sorted(
        (r.bx, r.by, r.z) for r in sql_rows
    )


def test_zorder_bounds_both_dimensions(spark, sf_smoke):
    rows = {
        r["layout"]: r
        for r in registry.QUERIES["zorder_skipping_summary"](spark, sf_smoke).collect()
    }
    z, lin = rows["zorder"], rows["linear_ts"]
    assert z["rows_total"] == lin["rows_total"]
    # The point of the layout: z-chunks cover far less of the user
    # range than time-sorted chunks (which each span ~all users)...
    assert z["sum_u_span"] * 2 < lin["sum_u_span"]
    # ...while staying bounded in time (well under n_chunks * full
    # range -- each z-chunk is a rectangle, not a random subset).
    ev = load_table(spark, sf_smoke, "events")
    t_range = ev.agg(
        (F.max(F.unix_micros(F.col("ts").cast("timestamp"))) - F.min(F.unix_micros(F.col("ts").cast("timestamp")))).alias("r")
    ).collect()[0]["r"]
    assert z["sum_t_span_us"] < z["n_chunks"] * t_range / 4


def test_write_zordered_files_carry_bounded_ranges(spark, sf_smoke, tmp_path):
    ev = load_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("tus")
    )
    write_zordered(ev, str(tmp_path / "z"), x="user_id", y="tus", n_files=32)
    back = spark.read.parquet(str(tmp_path / "z"))
    assert back.count() == ev.count()
    assert set(back.columns) == {"event_id", "user_id", "tus"}
    spans = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("user_id") - F.min("user_id")).alias("u_span"),
            F.count("*").alias("cnt"),
        )
        .collect()
    )
    full = ev.agg((F.max("user_id") - F.min("user_id")).alias("r")).collect()[0]["r"]
    assert len(spans) > 1
    # every row is in some file
    assert sum(r["cnt"] for r in spans) == ev.count()
    # most files' user-id footer range is a fraction of the table's:
    # a time-sorted layout would put ~the full range in every file
    bounded = [r for r in spans if r["u_span"] * 2 < full]
    assert len(bounded) * 2 >= len(spans), [
        (r["u_span"], full) for r in spans
    ]
