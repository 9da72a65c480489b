"""Exact sample autocorrelation (ACF) of grouped integer time
series -- the lag-correlogram every seasonality/anomaly pipeline
reads before picking window sizes (Box & Jenkins).

For a complete series y_0..y_{n-1} per group, the sample ACF at lag k
is
    r_k = sum_{t<n-k} (y_t - ybar)(y_{t+k} - ybar)
        / sum_t (y_t - ybar)^2 .

Cross-engine exactness via the mean-clearing trick: ybar = S/n is not
exactly representable, but substituting z_t = n*y_t - S = n(y_t-ybar)
scales numerator and denominator by the same n^2, which cancels in
the ratio -- so r_k = sum(z_t * z_{t+k}) / sum(z_t^2) holds EXACTLY
with every term an integer. Both sums accumulate as DECIMAL(38,0)
(order-independent), ship through the string-routed decimal->double
cast, and the single IEEE division is bit-identical in Spark and
DuckDB. No rounding anywhere.

Distributed shape: the series is an aggregate (e.g. day-grain counts
per event type), so it is tiny relative to the fact table no matter
the fact scale; the lag alignment is ONE equi-join on
(group, t + k = t') after exploding the 1..max_lag lag list --
max_lag copies of a day-grain table, never of facts. Group count x
series length x max_lag bounds all downstream work.

Magnitude headroom: |z| <= n * max|y|; with day counts up to 1e10
and n up to ~4000 days, z^2 sums stay ~1e29 << 1e38, and ANSI
decimal overflow raises loudly rather than wrapping past that.

Contract: the input must be a COMPLETE series per group (every t in
0..n-1 present exactly once -- zero-fill gaps upstream; the registry
query builds a dense day spine). A constant series (z = 0, den = 0)
has no defined autocorrelation and is excluded, mirroring the OLS
constant-x rule in regression.py.

Reference scope note: the reference engine (greeter_client.cc:398-416)
has no time-series surface; ACF extends the temporal family
(EWMA/CUSUM/seasonality) of the SURVEY extension brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def autocorrelation(
    series: DataFrame,
    group_col: str,
    t_col: str,
    y_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """series[group, t (0..n-1 dense), y (integral)] ->
    [group, lag, n_points, acf] for lag 1..max_lag, constant groups
    dropped."""
    stats = series.groupBy(group_col).agg(
        F.count("*").alias("_n"), F.sum(y_col).alias("_s")
    )
    z = series.join(stats, group_col).select(
        group_col,
        F.col(t_col).alias("_t"),
        (F.col("_n") * F.col(y_col) - F.col("_s"))
        .cast("decimal(19,0)")
        .alias("_z"),
        "_n",
    )
    den = z.groupBy(group_col).agg(
        F.sum(F.col("_z").cast("decimal(18,0)") * F.col("_z").cast("decimal(19,0)"))
        .cast("decimal(38,0)")
        .alias("_den"),
        F.max("_n").alias("n_points"),
    )
    lags = z.select(
        group_col,
        "_t",
        "_z",
        F.explode(F.array(*[F.lit(k) for k in range(1, max_lag + 1)])).alias(
            "lag"
        ),
    )
    lead = z.select(
        F.col(group_col).alias("_g2"),
        F.col("_t").alias("_t2"),
        F.col("_z").alias("_z2"),
    )
    num = (
        lags.join(
            lead,
            (F.col(group_col) == F.col("_g2"))
            & (F.col("_t") + F.col("lag") == F.col("_t2")),
        )
        .groupBy(group_col, "lag")
        .agg(
            F.sum(
                F.col("_z").cast("decimal(18,0)") * F.col("_z2").cast("decimal(19,0)")
            )
            .cast("decimal(38,0)")
            .alias("_num")
        )
    )
    return (
        num.join(den, group_col)
        .filter(F.col("_den") != 0)
        .select(
            group_col,
            F.col("lag").cast("long").alias("lag"),
            "n_points",
            (
                F.col("_num").cast("string").cast("double")
                / F.col("_den").cast("string").cast("double")
            ).alias("acf"),
        )
        .orderBy(group_col, "lag")
    )
