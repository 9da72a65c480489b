"""Channel-cardinality ladder for attribution_markov_removal
(VERDICT r7 #5): the registry implementation builds ONE
absorbing-chain value iteration PER channel in a Python loop
(|channels| x 8 unrolled join+agg rounds in a single plan). Channel
cardinality is schema-bounded (event types), so this is not a
data-scale killer -- but plan size grows linearly in |channels| and
the per-channel plans re-walk the same transition matrix.

This probe measures that against the keyed alternative: one
(removed, node)-keyed iteration where the removed channel is a
COLUMN -- 8 rounds total regardless of |channels|, state size
|channels| x |states| (tiny; the iteration stays model-grain).

Synthetic events: U users x L events over C channels + 'purchase',
deterministic hash-driven types. Both shapes are verified to produce
identical 9dp-rounded results at each C before timing is trusted.

Usage: python tools/markov_probe.py [channel_counts...]
Writes tools/markov_probe.json; SCALING.md records the conclusion.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapreduce_implementation_grpc_spark.session import get_spark

STEPS = 8
USERS = 2000
EVENTS_PER_USER = 12


def synth_events(spark, n_channels: int) -> DataFrame:
    """Deterministic synthetic journeys: type = hash-mod over C
    channels, with every ~7th event a 'purchase'."""
    n = USERS * EVENTS_PER_USER
    return (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") / EVENTS_PER_USER).cast("long").alias("user_id"),
            F.col("id").alias("ts"),  # ordering key only
            F.when(
                F.xxhash64(F.col("id")) % 7 == 0, F.lit("purchase")
            )
            .otherwise(
                F.concat(
                    F.lit("ch"),
                    F.lpad(
                        (F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(n_channels)))
                        .cast("string"),
                        3,
                        "0",
                    ),
                )
            )
            .alias("event_type"),
        )
    )


def transitions(ev: DataFrame):
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    nxt = ev.withColumn("next_type", F.lead("event_type").over(w)).filter(
        F.col("next_type").isNotNull()
    )
    c = nxt.groupBy("event_type", "next_type").agg(F.count("*").alias("_n"))
    tot = c.groupBy("event_type").agg(F.sum("_n").alias("_t"))
    tr = c.join(tot, "event_type").select(
        F.col("event_type").alias("_s"),
        F.col("next_type").alias("_t2"),
        (F.col("_n") / F.col("_t")).alias("_T"),
    )
    states = (
        tr.select(F.col("_s").alias("node"))
        .unionByName(tr.select(F.col("_t2").alias("node")))
        .distinct()
    )
    w_first = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    first = (
        ev.withColumn("_rn", F.row_number().over(w_first))
        .filter(F.col("_rn") == 1)
        .groupBy(F.col("event_type").alias("node"))
        .agg(F.count("*").alias("_c"))
    )
    users = first.agg(F.sum("_c").alias("_u"))
    pi = first.crossJoin(F.broadcast(users)).select(
        "node", (F.col("_c") / F.col("_u")).alias("pi")
    )
    return tr, states, pi


def sdbl(col):
    return col.cast("string").cast("double")


def absorb_p(tr, states, steps=STEPS):
    absorb = F.when(F.col("node") == "purchase", F.lit(1.0))
    p = states.select("node", absorb.otherwise(F.lit(0.0)).alias("p"))
    for _ in range(steps):
        stepped = (
            tr.join(F.broadcast(p), F.col("_t2") == F.col("node"))
            .groupBy(F.col("_s").alias("node"))
            .agg(
                sdbl(
                    F.sum(F.round(F.col("_T") * F.col("p"), 12).cast("decimal(24,12)"))
                ).alias("_sm")
            )
        )
        p = states.join(stepped, "node", "left").select(
            "node", absorb.otherwise(F.coalesce("_sm", F.lit(0.0))).alias("p")
        )
    return p


def loop_shape(tr, states, pi, channels: list[str]) -> DataFrame:
    """The registry's current shape: one iteration per channel."""

    def reach(p, skip=None):
        src = pi if skip is None else pi.filter(F.col("node") != skip)
        return src.join(p, "node").agg(
            sdbl(
                F.sum(F.round(F.col("pi") * F.col("p"), 12).cast("decimal(24,12)"))
            ).alias("val")
        )

    per_channel = []
    for ch in channels:
        p_rm = absorb_p(tr.filter(F.col("_t2") != ch), states)
        per_channel.append(
            reach(p_rm, skip=ch).select(
                F.lit(ch).alias("channel"), F.col("val").alias("p_removed")
            )
        )
    rem = per_channel[0]
    for nxt in per_channel[1:]:
        rem = rem.unionByName(nxt)
    return rem


def keyed_shape(tr, states, pi, channels: list[str]) -> DataFrame:
    """One (removed, node)-keyed iteration: the removed channel is a
    column, 8 rounds total regardless of |channels|."""
    spark = tr.sparkSession
    ch_df = spark.createDataFrame([(c,) for c in channels], "removed string")
    trx = tr.crossJoin(F.broadcast(ch_df)).filter(F.col("_t2") != F.col("removed"))
    sx = states.crossJoin(F.broadcast(ch_df))
    absorb = F.when(F.col("node") == "purchase", F.lit(1.0))
    p = sx.select("removed", "node", absorb.otherwise(F.lit(0.0)).alias("p"))
    for _ in range(STEPS):
        stepped = (
            trx.join(
                p,
                (trx["_t2"] == p["node"]) & (trx["removed"] == p["removed"]),
            )
            .groupBy(trx["removed"].alias("removed"), F.col("_s").alias("node"))
            .agg(
                sdbl(
                    F.sum(F.round(F.col("_T") * F.col("p"), 12).cast("decimal(24,12)"))
                ).alias("_sm")
            )
        )
        p = sx.join(stepped, ["removed", "node"], "left").select(
            "removed",
            "node",
            absorb.otherwise(F.coalesce("_sm", F.lit(0.0))).alias("p"),
        )
    # reach per removed channel, journeys starting at it excluded
    return (
        p.join(F.broadcast(pi), "node")
        .filter(F.col("node") != F.col("removed"))
        .groupBy(F.col("removed").alias("channel"))
        .agg(
            sdbl(
                F.sum(F.round(F.col("pi") * F.col("p"), 12).cast("decimal(24,12)"))
            ).alias("p_removed")
        )
    )


def main() -> None:
    cs = [int(a) for a in sys.argv[1:]] or [4, 25, 50, 200]
    spark = get_spark(app_name="markov-probe", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for c in cs:
        ev = synth_events(spark, c)
        tr, states, pi = transitions(ev)
        tr = tr.localCheckpoint()  # isolate the ladder from corpus-pass cost
        states = states.localCheckpoint()
        pi = pi.localCheckpoint()
        channels = sorted(r.node for r in states.collect() if r.node != "purchase")

        t0 = time.perf_counter()
        keyed = {
            r.channel: r.p_removed
            for r in keyed_shape(tr, states, pi, channels).collect()
        }
        t_keyed = time.perf_counter() - t0

        t_loop = None
        loop = None
        if c <= 64:  # the loop plan at C=200 is 1600 join rounds; skip
            t0 = time.perf_counter()
            loop = {
                r.channel: r.p_removed
                for r in loop_shape(tr, states, pi, channels).collect()
            }
            t_loop = time.perf_counter() - t0
            mism = [
                ch
                for ch in channels
                if round(loop[ch] - keyed[ch], 9) != 0.0
            ]
            assert not mism, f"C={c}: shapes disagree on {mism[:3]}"

        results[str(c)] = {
            "n_channels": len(channels),
            "loop_sec": round(t_loop, 3) if t_loop is not None else None,
            "keyed_sec": round(t_keyed, 3),
            "shapes_match_9dp": loop is not None,
        }
        print(f"C={c:4d} loop={t_loop} keyed={round(t_keyed, 3)}")
    out = os.path.join(REPO, "tools", "markov_probe.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
        fh.write("\n")
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
