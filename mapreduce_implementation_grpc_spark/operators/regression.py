"""Closed-form least-squares trend fitting as a grouped aggregate:
per-group slope / intercept / r-squared from the five OLS sufficient
statistics (n, Sx, Sy, Sxy, Sxx, Syy) -- the textbook normal-equation
solution, not an iterative solver.

This is the scalable way to fit millions of independent per-key
trends (one per nation / product / user) in ONE aggregation pass:
each statistic is an algebraic (commutative, associative) sum, so
Spark computes them with map-side partial aggregation and the final
division work is a per-group scalar expression -- no per-group data
movement beyond the one shuffle every groupBy already pays, and
nothing iterative.

Cross-engine exactness (the driver's hash gate): callers supply
INTEGRAL x and y (epoch-month indices, money in micro-units), so all
six statistics are exact integers accumulated as DECIMAL -- summation
order cannot change them. The slope/intercept numerators and
denominators
    slope_num = n*Sxy - Sx*Sy          den = n*Sxx - Sx^2
    icpt_num  = Sy*Sxx - Sx*Sxy
are likewise exact DECIMAL(38,0) integer expressions; only the final
division runs in IEEE doubles, on operands string-routed from the
exact decimal (decimal -> varchar -> double parses identically in
Spark and DuckDB), so both engines divide the bit-identical doubles.
r^2 = slope_num^2 / (den * (n*Syy - Sy^2)) is computed in doubles
FROM those routed exact components (squaring the decimal would need
precision ~76); IEEE multiply/divide on identical doubles is
identical. Decimal overflow under ANSI raises loudly rather than
wrapping (the basket.py lift lesson): magnitude headroom is ~1e18
for n*Sxy with micro-unit y sums up to ~1e14 and x indices up to
~1e3 -- a 100 TB run with bigger sums must widen the unit (cents
instead of micros), and gets an error, not a wrong slope.

A constant-x group (den = 0) has no defined trend and is excluded
with a filter rather than returning NaN/Inf rows; a perfectly
constant-y group yields slope 0 and r^2 NULL (0/0) which is kept --
"no variance to explain" is a real answer.

Reference scope note: the reference engine (greeter_client.cc:398-416)
computes one fixed word count; regression is SURVEY extension surface
(the metric-trend / Zipf-fit family of a corpus-analytics pipeline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _sdbl(c: Column) -> Column:
    """Exact decimal -> double via the decimal string (both engines
    correctly-round the parse; direct casts differ by 1 ulp)."""
    return c.cast("string").cast("double")


def ols_fit(
    df: DataFrame,
    group_cols: list[str],
    x: str,
    y: str,
) -> DataFrame:
    """Per-group OLS of integral y on integral x. Output columns:
    group_cols + [n_points, slope, intercept, r2]; groups whose x is
    constant (undefined slope) are dropped."""
    xd = F.col(x).cast("decimal(12,0)")
    yd = F.col(y).cast("decimal(25,0)")
    agg = df.groupBy(*group_cols).agg(
        F.count("*").alias("n_points"),
        F.sum(xd).cast("decimal(20,0)").alias("_sx"),
        F.sum(yd).cast("decimal(33,0)").alias("_sy"),
        F.sum(xd.cast("decimal(10,0)") * yd.cast("decimal(27,0)"))
        .cast("decimal(38,0)")
        .alias("_sxy"),
        F.sum(xd.cast("decimal(15,0)") * xd.cast("decimal(15,0)"))
        .cast("decimal(31,0)")
        .alias("_sxx"),
        F.sum(yd.cast("decimal(18,0)") * yd.cast("decimal(18,0)"))
        .cast("decimal(38,0)")
        .alias("_syy"),
    )
    n = F.col("n_points").cast("decimal(10,0)")
    num = _sdbl(
        (n.cast("decimal(7,0)") * F.col("_sxy").cast("decimal(30,0)"))
        - (F.col("_sx").cast("decimal(10,0)") * F.col("_sy").cast("decimal(27,0)"))
    )
    den = _sdbl(
        (n.cast("decimal(7,0)") * F.col("_sxx").cast("decimal(30,0)"))
        - (F.col("_sx").cast("decimal(18,0)") * F.col("_sx").cast("decimal(19,0)"))
    )
    icpt_num = _sdbl(
        (F.col("_sy").cast("decimal(22,0)") * F.col("_sxx").cast("decimal(15,0)"))
        - (F.col("_sx").cast("decimal(10,0)") * F.col("_sxy").cast("decimal(27,0)"))
    )
    y_dev = _sdbl(
        (n.cast("decimal(7,0)") * F.col("_syy").cast("decimal(30,0)"))
        - (F.col("_sy").cast("decimal(18,0)") * F.col("_sy").cast("decimal(19,0)"))
    )
    return (
        agg.withColumn("_num", num)
        .withColumn("_den", den)
        .filter(F.col("_den") != 0)
        .select(
            *group_cols,
            "n_points",
            (F.col("_num") / F.col("_den")).alias("slope"),
            (icpt_num / F.col("_den")).alias("intercept"),
            F.when(
                y_dev != 0,
                F.col("_num") * F.col("_num") / (F.col("_den") * y_dev),
            ).alias("r2"),
        )
    )


def trailing_ols(
    df: DataFrame,
    group_cols: list[str],
    x: str,
    y: str,
    width: int,
) -> DataFrame:
    """Per-row TRAILING-window OLS slope of integral y on integral x:
    for each input row, fit over the rows of its group whose x lies
    in (row.x - width, row.x] -- the rolling-trend detector ("is
    this series accelerating THIS week"), the windowed sibling of
    ols_fit's one-fit-per-group.

    The frame is a RANGE over x, not ROWS: a gap in the series
    SHRINKS the window's n instead of silently stretching it back to
    older points -- a trailing week means a calendar week. Same
    exactness contract as ols_fit: integral x/y accumulate as exact
    DECIMAL inside the window frame (order-free), slope_num/den are
    exact integer expressions string-routed to double, one IEEE
    division; ANSI overflow raises rather than wrapping. A frame
    with constant x (n = 1, or ties only) has no defined slope and
    yields NULL -- per-row reports keep the row (unlike ols_fit's
    filter, dropping it would silently hide the series' warm-up).

    Scale: callers pre-aggregate to (group, x) grain, so the window
    sorts grain rows (days, not facts) per group -- the
    events_dow_seasonality stance. Appends [n_points, slope] to the
    input columns."""
    if int(width) < 1:
        raise ValueError(
            f"trailing_ols: width={width} -- the trailing range must "
            "cover at least the current row (width >= 1)"
        )
    xd = F.col(x).cast("decimal(12,0)")
    yd = F.col(y).cast("decimal(25,0)")
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(x)
        .rangeBetween(-(width - 1), 0)
    )
    t = (
        df.withColumn("_wn", F.count("*").over(w))
        .withColumn("_sx", F.sum(xd).over(w).cast("decimal(20,0)"))
        .withColumn("_sy", F.sum(yd).over(w).cast("decimal(33,0)"))
        .withColumn(
            "_sxy",
            F.sum(xd.cast("decimal(10,0)") * yd.cast("decimal(27,0)"))
            .over(w)
            .cast("decimal(38,0)"),
        )
        .withColumn(
            "_sxx",
            F.sum(xd.cast("decimal(15,0)") * xd.cast("decimal(15,0)"))
            .over(w)
            .cast("decimal(31,0)"),
        )
    )
    n = F.col("_wn").cast("decimal(7,0)")
    num = _sdbl(
        (n * F.col("_sxy").cast("decimal(30,0)"))
        - (
            F.col("_sx").cast("decimal(10,0)")
            * F.col("_sy").cast("decimal(27,0)")
        )
    )
    den = _sdbl(
        (n * F.col("_sxx").cast("decimal(30,0)"))
        - (
            F.col("_sx").cast("decimal(18,0)")
            * F.col("_sx").cast("decimal(19,0)")
        )
    )
    return (
        t.withColumn("_num", num)
        .withColumn("_den", den)
        .withColumn("n_points", F.col("_wn"))
        .withColumn(
            "slope",
            F.when(F.col("_den") != 0, F.col("_num") / F.col("_den")),
        )
        .drop("_wn", "_sx", "_sy", "_sxy", "_sxx", "_num", "_den")
    )
