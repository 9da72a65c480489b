"""Exact Hamilton-apportioned stratified sample
(curation.stratified_sample): apportionment invariants, hand-checked
quotas, determinism, oracle parity."""

from __future__ import annotations

from mapreduce_implementation_grpc_spark import registry
from mapreduce_implementation_grpc_spark.operators.curation import (
    stratified_sample,
)
from mapreduce_implementation_grpc_spark.sources.catalog import load_table

from tests.oracle_utils import assert_matches_oracle


def test_hamilton_invariants_on_corpus(spark, sf_check):
    docs = load_table(spark, sf_check, "documents")
    total = docs.count()
    rows = stratified_sample(docs).collect()
    # exact total: sum of quotas == N div 10, and the sample IS the quotas
    assert len(rows) == total // 10
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    n_by_lang = {
        r.lang: r.n_h
        for r in docs.groupBy(docs.lang).count().withColumnRenamed("count", "n_h").collect()
    }
    n_samp = total // 10
    for lang, grp in by_lang.items():
        quota = grp[0].quota
        assert len(grp) == quota
        # Hamilton stays within 1 of the ideal share
        ideal = n_samp * n_by_lang[lang] / total
        assert abs(quota - ideal) < 1.0
        # doc_ids are distinct
        ids = [r.doc_id for r in grp]
        assert len(set(ids)) == len(ids)


def test_hand_computed_apportionment(spark):
    # N=10, n=1: strata of 7 and 3 -> quotas floor(1*7/10)=0 r=7,
    # floor(3/10)=0 r=3; deficit 1 -> the larger remainder (a) gets it
    rows = [("a", i) for i in range(7)] + [("b", 100 + i) for i in range(3)]
    df = spark.createDataFrame(rows, "lang string, doc_id long")
    got = stratified_sample(df).collect()
    assert len(got) == 1
    assert got[0].lang == "a" and got[0].quota == 1


def test_remainder_tie_breaks_by_stratum_name(spark):
    # N=20, n=2: strata 5/5/10 -> q0 = 0,0,1; r = 10,10,0; deficit 1
    # -> tie between 'a' and 'b' remainders, 'a' wins by name
    rows = (
        [("a", i) for i in range(5)]
        + [("b", 100 + i) for i in range(5)]
        + [("c", 200 + i) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "lang string, doc_id long")
    quotas = {r.lang: r.quota for r in stratified_sample(df).collect()}
    assert quotas == {"a": 1, "c": 1}


def test_membership_is_deterministic(spark, sf_check):
    docs = load_table(spark, sf_check, "documents")
    a = {r.doc_id for r in stratified_sample(docs).collect()}
    b = {
        r.doc_id
        for r in stratified_sample(docs.repartition(13)).collect()
    }
    assert a == b


def test_stratified_sample_exact_oracle(spark, sf_check):
    assert_matches_oracle(
        registry.QUERIES["stratified_sample_exact"](spark, sf_check),
        registry.ORACLES["stratified_sample_exact"],
        sf_check,
    )
