"""Curation pipeline: end-to-end behavior on crafted corpora + the
partitioned sink round trip + grouped-map trend fit."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreduce_implementation_grpc_spark import registry
from mapreduce_implementation_grpc_spark.plans.pipeline import (
    curate_documents,
    run_curation,
)

GOOD = (
    "the quick analysis of a large spark table shows that partial aggregation is "
    "one of the most effective levers for reducing shuffle volume in any big "
    "data pipeline and it is enabled by default for all hash aggregations"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        Row(doc_id=1, text=GOOD, lang="en", source="s1", n_chars=len(GOOD)),
        Row(doc_id=2, text=GOOD, lang="en", source="s1", n_chars=len(GOOD)),          # exact dup
        Row(doc_id=3, text=GOOD.replace("levers", "knobs"), lang="en", source="s2",
            n_chars=len(GOOD)),                                                        # near dup
        Row(doc_id=4, text="!!! ???", lang="en", source="s3", n_chars=7),              # junk
        Row(doc_id=5, text="the a of is and " * 12, lang="fr", source="s4", n_chars=16 * 12),  # low diversity
    ]
    return rows


def _curate_frame(spark, corpus, tmp_path, min_quality=0.5):
    docs = spark.createDataFrame(corpus)
    path = str(tmp_path / "docs_sf")
    docs.write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return path


def test_curation_dedups_and_filters(spark, corpus, tmp_path):
    path = _curate_frame(spark, corpus, tmp_path)
    out = curate_documents(spark, path, min_quality=0.5)
    kept = {r.doc_id: r for r in out.collect()}
    assert 1 in kept           # canonical of the exact-dup group
    assert 2 not in kept       # exact dup removed
    assert 3 not in kept       # near dup removed (cluster canonical is 1)
    assert 4 not in kept       # junk fails the quality gate
    assert kept[1].n_bpe_tokens > 0 and len(kept[1].fingerprint) == 32


def test_curation_sink_roundtrip_partitioned(spark, corpus, tmp_path):
    src = _curate_frame(spark, corpus, tmp_path)
    out_dir = str(tmp_path / "curated")
    back = run_curation(spark, src, out_dir, min_quality=0.0)
    assert back.count() == curate_documents(spark, src, min_quality=0.0).count()
    # lang partition pruning works on the sink output
    plan = back.filter(F.col("lang") == "en")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan


def test_events_type_trend(spark, sf_check):
    rows = {r.event_type: r for r in registry.QUERIES["events_type_trend"](spark, sf_check).collect()}
    assert set(rows) == {"click", "error", "purchase", "signup", "view"}
    for r in rows.values():
        assert r.n_hours > 100          # a month of hourly buckets
        assert abs(r.slope_per_hour) < 10  # no runaway fit on flat data
