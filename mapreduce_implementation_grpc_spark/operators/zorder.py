"""Z-order (Morton-curve) multi-dimensional data layout.

At 100 TB the dominant cost of a selective query is how many files its
filters let the scan SKIP via parquet footer min/max stats. A layout
sorted on one column skips perfectly on that column and not at all on
any other; interleaving the bits of two (or more) dimension ranks --
the Z-order / Morton curve -- yields a single sort key whose
contiguous ranges cover BOUNDED rectangles in every interleaved
dimension, so range filters on ANY of them prune files. This is the
layout strategy behind Delta/Iceberg `OPTIMIZE ZORDER BY` and the
classic UB-tree literature, rebuilt here from public bit arithmetic.

Reference lineage: the reference engine has a 4-way contiguous range
partitioner as its only layout operator (greeter_client.cc:362-390) --
one-dimensional by construction. This module is the multi-dimensional
generalization its HDFS output never had.

Everything is exact BIGINT arithmetic (bin ranks via integer floor
division, Morton interleave via shift/mask), so even the layout
metrics are DuckDB-hash-checkable:

1. per-dimension bin rank over [min, max]:
   ``bx = ((x - lo) * 2^bits) div (hi - lo + 1)`` -- monotone, exact,
   in [0, 2^bits) for every in-range x (positive operands, so Spark's
   truncating `div` == DuckDB's floor `//`);
2. Morton code ``z = interleave(bx, bt)`` -- bit i of bx lands at
   2i, bit i of bt at 2i+1 (statically unrolled shift/mask sum, the
   same expression text generated for both engines);
3. quadtree cell = high bits of z (``z >> cell_shift``): each cell is
   an axis-aligned rectangle of at most
   2^ceil(cell_shift/2) x 2^floor(cell_shift/2) bins.

Scale: one stats aggregate (4 numbers, broadcast), then a map-only
bin/interleave projection -- no shuffle until the consumer's own
groupBy or the writer's range partitioning. The sort in
`write_zordered` is `repartitionByRange(z)`: Spark's range
partitioner samples z to build balanced contiguous ranges, the
distributed form of the reference's hand-scanned newline splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table

BITS = 8  # bins per dimension = 2^8; z fits in 16 bits
CELL_SHIFT = 6  # cells = z >> 6 -> up to 1024 quadtree cells


def morton_col(bx: Column, by: Column, bits: int = BITS) -> Column:
    """Interleave two `bits`-wide non-negative ints: bit i of `bx` ->
    bit 2i, bit i of `by` -> bit 2i+1. Statically unrolled; every term
    touches disjoint output bits so plain + is a bitwise OR."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(bx, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(by, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def morton_sql(bx: str, by: str, bits: int = BITS) -> str:
    """The identical interleave as SQL text (DuckDB and Spark SQL both
    accept >> << &) -- generated from the same loop so the oracle
    cannot drift from the Spark column expression."""
    terms = []
    for i in range(bits):
        terms.append(f"((({bx} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({by} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def _binned_events(spark: SparkSession, sf_dir: str, bits: int = BITS) -> DataFrame:
    """Events with exact integer bin ranks `bx` (user_id) and `bt`
    (epoch-microsecond ts) plus the Morton code `z`. One stats
    aggregate (4 values, broadcast) + a map-only projection; lazily
    checkpointed because every layout metric reads it twice."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("tus")
    )
    base = ev.localCheckpoint(eager=False)
    stats = base.agg(
        F.min("user_id").alias("lo_u"),
        F.max("user_id").alias("hi_u"),
        F.min("tus").alias("lo_t"),
        F.max("tus").alias("hi_t"),
    )
    bx = F.expr(f"((user_id - lo_u) * {1 << bits}) div (hi_u - lo_u + 1)")
    bt = F.expr(f"((tus - lo_t) * {1 << bits}) div (hi_t - lo_t + 1)")
    return (
        base.crossJoin(F.broadcast(stats))
        .withColumn("bx", bx.cast("long"))
        .withColumn("bt", bt.cast("long"))
        .withColumn("z", morton_col(F.col("bx"), F.col("bt"), bits))
        .drop("lo_u", "hi_u", "lo_t", "hi_t")
    )


def zorder_cells(
    spark: SparkSession,
    sf_dir: str,
    bits: int = BITS,
    cell_shift: int = CELL_SHIFT,
) -> DataFrame:
    """Per-quadtree-cell layout statistics: row count and the raw
    (user_id, epoch-us) spans each contiguous z-range actually covers
    -- exactly the parquet footer min/max a scan would prune with.
    Cells are aggregates of the binned rows: one hash shuffle on the
    cell id, nothing single-partition."""
    return (
        _binned_events(spark, sf_dir, bits)
        .groupBy(F.shiftright(F.col("z"), cell_shift).alias("cell"))
        .agg(
            F.count("*").alias("cnt"),
            (F.max("user_id") - F.min("user_id")).alias("u_span"),
            (F.max("tus") - F.min("tus")).alias("t_span_us"),
        )
        .orderBy("cell")
    )


def zorder_skipping_summary(
    spark: SparkSession, sf_dir: str, bits: int = BITS
) -> DataFrame:
    """The file-skipping tradeoff, measured: chunk the same events two
    ways -- 256 contiguous Z-curve ranges (`z >> bits`) vs 256
    contiguous time bins (`bt`, the single-column layout the
    reference's range partitioner generalizes to) -- and total each
    chunk's per-dimension spans. Z-order bounds BOTH dimensions
    (user-range filters prune files; time filters still prune, one
    resolution coarser); the linear layout leaves every chunk spanning
    the full user range. All-integer output, hash-exact."""
    binned = _binned_events(spark, sf_dir, bits)

    def spans(chunk: Column, layout: str) -> DataFrame:
        per = binned.groupBy(chunk.alias("chunk")).agg(
            F.count("*").alias("cnt"),
            (F.max("user_id") - F.min("user_id")).alias("u_span"),
            (F.max("tus") - F.min("tus")).alias("t_span_us"),
        )
        return per.agg(
            F.lit(layout).alias("layout"),
            F.count("*").alias("n_chunks"),
            F.sum("cnt").alias("rows_total"),
            F.sum("u_span").alias("sum_u_span"),
            F.sum("t_span_us").alias("sum_t_span_us"),
        )

    return spans(F.shiftright(F.col("z"), bits), "zorder").unionByName(
        spans(F.col("bt"), "linear_ts")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    n_files: int = 32,
    bits: int = BITS,
) -> None:
    """Write `df` as parquet laid out along the Z-curve of integer
    columns (`x`, `y`): bin both dimensions, interleave, range-
    partition on the Morton code (contiguous z-ranges -> files whose
    footer min/max cover bounded rectangles in BOTH dimensions), sort
    within partitions so row groups inherit the same locality."""
    stats = df.agg(
        F.min(x).alias("lo_x"),
        F.max(x).alias("hi_x"),
        F.min(y).alias("lo_y"),
        F.max(y).alias("hi_y"),
    )
    bx = F.expr(f"(({x} - lo_x) * {1 << bits}) div (hi_x - lo_x + 1)")
    by = F.expr(f"(({y} - lo_y) * {1 << bits}) div (hi_y - lo_y + 1)")
    (
        df.crossJoin(F.broadcast(stats))
        .withColumn("_z", morton_col(bx.cast("long"), by.cast("long"), bits))
        .drop("lo_x", "hi_x", "lo_y", "hi_y")
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
