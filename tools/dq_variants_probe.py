"""Interleaved A/B of dq_audit shapes (r11): committed single-pass
form vs pin-free and hybrid variants, one JVM, noop sink.

Usage: python tools/dq_variants_probe.py [--sf SF] [--runs N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_implementation_grpc_spark import registry
from mapreduce_implementation_grpc_spark.materialize import materialize
from mapreduce_implementation_grpc_spark.operators.dq import (
    _row_local,
    dq_audit,
    events_row_checks,
)
from mapreduce_implementation_grpc_spark.session import get_spark
from mapreduce_implementation_grpc_spark.sources.catalog import load_table


def dq_v_r9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-start shape, verbatim (per-check scans)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")

    li_checks = _row_local(
        li,
        {
            "lineitem_qty_in_1_50": (F.col("l_quantity") < 1)
            | (F.col("l_quantity") > 50),
            "lineitem_discount_in_0_01": (F.col("l_discount") < 0)
            | (F.col("l_discount") > 0.1),
            "lineitem_returnflag_domain": ~F.col("l_returnflag").isin(
                "A", "N", "R"
            ),
            "lineitem_pk_nonnull": F.col("l_orderkey").isNull()
            | F.col("l_linenumber").isNull(),
        },
    )
    ord_checks = _row_local(
        orders, {"orders_totalprice_positive": F.col("o_totalprice") <= 0}
    )
    ev_checks = _row_local(ev, events_row_checks())
    doc_checks = _row_local(
        docs,
        {
            "documents_nchars_consistent": F.col("n_chars") != F.length("text"),
            "documents_text_nonempty": F.col("text").isNull()
            | (F.length("text") == 0),
        },
    )
    uniq = []
    for name, df, cols in (
        ("orders_pk_unique", orders, ["o_orderkey"]),
        ("events_pk_unique", ev, ["event_id"]),
        ("lineitem_pk_unique", li, ["l_orderkey", "l_linenumber"]),
    ):
        uniq.append(
            df.agg(
                F.lit(name).alias("check_name"),
                F.count(F.lit(1)).alias("n_checked"),
                (
                    F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols])
                ).alias("n_violations"),
            )
        )

    def _orphans(name, fk_df, fk, pk_df, pk):
        keys = fk_df.select(F.col(fk).alias("_k"))
        missing = keys.join(pk_df.select(F.col(pk).alias("_k")), "_k", "left_anti")
        return keys.agg(F.count(F.lit(1)).alias("n_checked")).crossJoin(
            F.broadcast(missing.agg(F.count(F.lit(1)).alias("n_violations")))
        ).select(F.lit(name).alias("check_name"), "n_checked", "n_violations")

    fk_checks = [
        _orphans("orders_fk_customer", orders, "o_custkey", cust, "c_custkey"),
        _orphans("lineitem_fk_orders", li, "l_orderkey", orders, "o_orderkey"),
        _orphans("orders_have_lineitems", orders, "o_orderkey", li, "l_orderkey"),
    ]
    line_total = li.groupBy("l_orderkey").agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(8,4)") - F.col("l_discount").cast("decimal(8,4)"))
                * (F.lit(1).cast("decimal(8,4)") + F.col("l_tax").cast("decimal(8,4)"))
            ),
            2,
        ).alias("_lt")
    )
    recon = (
        orders.select("o_orderkey", "o_totalprice")
        .join(line_total, F.col("o_orderkey") == F.col("l_orderkey"))
        .agg(
            F.lit("orders_totalprice_reconciles").alias("check_name"),
            F.count(F.lit(1)).alias("n_checked"),
            F.sum(
                F.when(
                    F.abs(F.col("o_totalprice").cast("decimal(18,2)") - F.col("_lt"))
                    > F.lit(0.01).cast("decimal(18,2)"),
                    1,
                ).otherwise(0)
            ).alias("n_violations"),
        )
    )
    out = li_checks
    for part in [ord_checks, ev_checks, doc_checks, *uniq, *fk_checks, recon]:
        out = out.unionByName(part)
    return out.select(
        "check_name",
        F.col("n_checked").cast("long").alias("n_checked"),
        F.col("n_violations").cast("long").alias("n_violations"),
    )


def dq_hybrid(spark: SparkSession, sf_dir: str, pin_small: bool) -> DataFrame:
    """r9 per-table row-local/uniqueness scans (cheap columnar
    passes, no Expand-merge) + the r11 full-outer trio (fk_li_orders,
    have_lineitems, recon on ONE join) -- the join restructure without
    the count_distinct merges or the wide pins."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")

    li_checks = _row_local(
        li,
        {
            "lineitem_qty_in_1_50": (F.col("l_quantity") < 1)
            | (F.col("l_quantity") > 50),
            "lineitem_discount_in_0_01": (F.col("l_discount") < 0)
            | (F.col("l_discount") > 0.1),
            "lineitem_returnflag_domain": ~F.col("l_returnflag").isin(
                "A", "N", "R"
            ),
            "lineitem_pk_nonnull": F.col("l_orderkey").isNull()
            | F.col("l_linenumber").isNull(),
        },
    )
    ord_checks = _row_local(
        orders, {"orders_totalprice_positive": F.col("o_totalprice") <= 0}
    )
    ev_checks = _row_local(ev, events_row_checks())
    doc_checks = _row_local(
        docs,
        {
            "documents_nchars_consistent": F.col("n_chars") != F.length("text"),
            "documents_text_nonempty": F.col("text").isNull()
            | (F.length("text") == 0),
        },
    )
    uniq = []
    for name, df, cols in (
        ("orders_pk_unique", orders, ["o_orderkey"]),
        ("events_pk_unique", ev, ["event_id"]),
        ("lineitem_pk_unique", li, ["l_orderkey", "l_linenumber"]),
    ):
        uniq.append(
            df.agg(
                F.lit(name).alias("check_name"),
                F.count(F.lit(1)).alias("n_checked"),
                (
                    F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols])
                ).alias("n_violations"),
            )
        )

    def _orphans(name, fk_df, fk, pk_df, pk):
        keys = fk_df.select(F.col(fk).alias("_k"))
        missing = keys.join(pk_df.select(F.col(pk).alias("_k")), "_k", "left_anti")
        return keys.agg(F.count(F.lit(1)).alias("n_checked")).crossJoin(
            F.broadcast(missing.agg(F.count(F.lit(1)).alias("n_violations")))
        ).select(F.lit(name).alias("check_name"), "n_checked", "n_violations")

    fk_customer = _orphans("orders_fk_customer", orders, "o_custkey", cust, "c_custkey")

    lik = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(8,4)") - F.col("l_discount").cast("decimal(8,4)"))
                * (F.lit(1).cast("decimal(8,4)") + F.col("l_tax").cast("decimal(8,4)"))
            ),
            2,
        ).alias("_lt"),
    )
    if pin_small:
        lik = materialize(lik)
    j = (
        orders.select("o_orderkey", "o_totalprice", F.lit(1).alias("_o"))
        .join(
            lik.select("l_orderkey", "_cnt", "_lt", F.lit(1).alias("_l")),
            F.col("o_orderkey") == F.col("l_orderkey"),
            "full_outer",
        )
        .agg(
            F.sum(F.when(F.col("_o").isNull(), F.col("_cnt")).otherwise(0)).alias("_fk_viol"),
            F.sum(F.when(F.col("_l").isNull(), 1).otherwise(0)).alias("_noline_viol"),
            F.sum(F.when(F.col("_o").isNotNull() & F.col("_l").isNotNull(), 1).otherwise(0)).alias("_recon_n"),
            F.sum(
                F.when(
                    F.col("_o").isNotNull()
                    & F.col("_l").isNotNull()
                    & (
                        F.abs(F.col("o_totalprice").cast("decimal(18,2)") - F.col("_lt"))
                        > F.lit(0.01).cast("decimal(18,2)")
                    ),
                    1,
                ).otherwise(0)
            ).alias("_recon_viol"),
        )
    )
    if pin_small:
        j = materialize(j)
    li_n = li.agg(F.count(F.lit(1)).alias("_li_n"))
    ord_n = orders.agg(F.count(F.lit(1)).alias("_ord_n"))
    fk_li_orders = j.crossJoin(F.broadcast(li_n)).select(
        F.lit("lineitem_fk_orders").alias("check_name"),
        F.col("_li_n").alias("n_checked"),
        F.col("_fk_viol").alias("n_violations"),
    )
    orders_have_li = j.crossJoin(F.broadcast(ord_n)).select(
        F.lit("orders_have_lineitems").alias("check_name"),
        F.col("_ord_n").alias("n_checked"),
        F.col("_noline_viol").alias("n_violations"),
    )
    recon = j.select(
        F.lit("orders_totalprice_reconciles").alias("check_name"),
        F.col("_recon_n").alias("n_checked"),
        F.col("_recon_viol").alias("n_violations"),
    )
    out = li_checks
    for part in [
        ord_checks, ev_checks, doc_checks, *uniq,
        fk_customer, fk_li_orders, orders_have_li, recon,
    ]:
        out = out.unionByName(part)
    return out.select(
        "check_name",
        F.col("n_checked").cast("long").alias("n_checked"),
        F.col("n_violations").cast("long").alias("n_violations"),
    )


def _time(df_fn, runs: int) -> list[float]:
    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df_fn().write.format("noop").mode("overwrite").save()
        out.append(round(time.perf_counter() - t0, 3))
    return sorted(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    spark = get_spark(app_name="dq-ab")
    spark.sparkContext.setLogLevel("ERROR")
    registry.QUERIES["wordcount"](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    ref = sorted(map(tuple, dq_v_r9(spark, "/root/testdata/sf0.01").collect()))
    for tag, fn in [
        ("committed", lambda: dq_audit(spark, "/root/testdata/sf0.01")),
        ("hybrid    ", lambda: dq_hybrid(spark, "/root/testdata/sf0.01", False)),
        ("hybrid-pin", lambda: dq_hybrid(spark, "/root/testdata/sf0.01", True)),
    ]:
        assert sorted(map(tuple, fn().collect())) == ref, f"{tag} diverges"
    print("identity ok (17 rows each)")

    for tag, fn in [
        ("r9        ", lambda: dq_v_r9(spark, args.sf)),
        ("committed ", lambda: dq_audit(spark, args.sf)),
        ("hybrid    ", lambda: dq_hybrid(spark, args.sf, False)),
        ("hybrid-pin", lambda: dq_hybrid(spark, args.sf, True)),
    ] * 2:
        spark.sparkContext.setJobDescription(f"dq-ab: {tag}")
        s = _time(fn, args.runs)
        print(f"{tag} median={s[len(s) // 2]:7.3f}s samples={s}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
