"""Market-basket pair mining: support / confidence / lift.

The frequent-itemset primitive (Agrawal-Srikant A-priori, pair
stage) over the order->part bipartite relation: which parts co-occur
in the same order more than independence predicts. The reference has
no relational surface at all; this extends its counting pipeline
(count per key) to counting per key PAIR with the association
metrics every recommender bootstrap uses.

Scale shape:

- baskets = distinct (order, part) -- one shuffle, and the SUPPORT
  FILTER on pair count is applied straight after the pair groupBy,
  before any metric join: at sf0.01 that is 115k pairs -> 3.4k
  surviving, so the joins that attach item counts run on the pruned
  set (A-priori's pruning insight, applied to the plan).
- the pair build self-joins baskets on the ORDER key: fan-out is
  C(basket_size, 2) per order, and basket sizes are bounded by
  business reality (~4 parts/order here) -- this is the safe
  direction, unlike joining on part. A pathological mega-basket
  would need a basket-size cap, the same knob as the butterfly
  counter's max_degree.
- item counts and the total-order count are part-sized / 1-row
  aggregates, attached by broadcast; all ratio math is exact-integer
  inputs into double division, so both engines order identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..materialize import materialize
from ..sources.catalog import load_table


def market_basket_pairs(
    spark: SparkSession,
    sf_dir: str,
    min_pair_orders: int = 2,
    top_n: int = 50,
    reliable: bool | None = None,
) -> DataFrame:
    """Top part pairs by lift: [p1, p2, pair_n, support, confidence,
    lift], lift desc with (p1, p2) tie-break. `confidence` is
    P(p2 in basket | p1 in basket); pairs below `min_pair_orders`
    co-occurrences are pruned before any metric join."""
    b = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    # three consumers: the pair self-join (twice) + item counts + total
    b = materialize(b, reliable=reliable)
    nn = b.agg(F.count_distinct("o").alias("n"))
    item = b.groupBy("p").agg(F.count("*").alias("item_n"))
    a1 = b.select("o", F.col("p").alias("p1"))
    a2 = b.select("o", F.col("p").alias("p2"))
    pairs = (
        a1.join(a2, "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("pair_n"))
        .filter(F.col("pair_n") >= min_pair_orders)
    )
    out = (
        pairs.join(
            item.select(F.col("p").alias("p1"), F.col("item_n").alias("c1")), "p1"
        )
        .join(
            item.select(F.col("p").alias("p2"), F.col("item_n").alias("c2")), "p2"
        )
        .crossJoin(F.broadcast(nn))
    )
    return (
        out.select(
            "p1",
            "p2",
            "pair_n",
            (F.col("pair_n") / F.col("n")).alias("support"),
            (F.col("pair_n") / F.col("c1")).alias("confidence"),
            (
                (F.col("pair_n") * F.col("n")) / (F.col("c1") * F.col("c2"))
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("p1"), F.asc("p2"))
        .limit(top_n)
    )
