"""Property-based tests (hypothesis): the SURVEY.md section 5
invariants, differentially checked against a pure-Python mirror of
the reference semantics (greeter_client.cc:316-321 normalize,
greeter_server.cc:72-79 tokenize)."""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreduce_implementation_grpc_spark.operators import word_count

# text with punctuation, unicode-ish noise, whitespace runs
LINE = st.text(
    alphabet=st.sampled_from(list("abcXYZ019 \t!?.,;'\"-_#@")), max_size=60
)
CORPUS = st.lists(LINE, min_size=0, max_size=8)


def python_word_count(lines: list[str]) -> Counter:
    """Reference semantics in plain Python: strip non-alnum-non-space,
    lowercase, split on whitespace."""
    counts: Counter = Counter()
    for line in lines:
        cleaned = re.sub(r"[^a-zA-Z0-9\s]", "", line).lower()
        counts.update(cleaned.split())
    return counts


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(CORPUS)
def test_wordcount_matches_python_mirror(spark, corpus):
    if corpus:
        df = spark.createDataFrame([Row(line=s) for s in corpus])
    else:
        df = spark.createDataFrame([], "line string")
    got = {r.word: r.cnt for r in word_count(df).collect()}
    want = python_word_count(corpus)
    assert got == dict(want)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(CORPUS.filter(lambda c: len(c) >= 2), st.integers(min_value=1, max_value=6))
def test_wordcount_partition_invariant(spark, corpus, nparts):
    df = spark.createDataFrame([Row(line=s) for s in corpus])
    base = sorted(map(tuple, word_count(df).collect()))
    repart = sorted(map(tuple, word_count(df.repartition(nparts)).collect()))
    assert base == repart
    total = word_count(df).agg(F.sum("cnt")).collect()[0][0] or 0
    assert total == sum(python_word_count(corpus).values())
