"""registry part 05: similarity (split from the monolithic registry.py in round 8; see tools/split_registry.py)."""

from __future__ import annotations

from .shared import (
    DataFrame,
    F,
    SparkSession,
    Window,
    ann_ivf_topk,
    ann_lsh_topk,
    embedding_dup_pairs,
    knn_brute_force,
    load_table,
    materialize,
    quantize_embeddings,
    with_token_array,
)
from .curation import BM25_QUERY, q_bm25_topk



# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def _query_vectors(spark: SparkSession, sf_dir: str, n: int = 10) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    knn = knn_brute_force(emb, _query_vectors(spark, sf_dir), k=5)
    return knn.withColumn("rank", F.col("rank").cast("long"))


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ann = ann_lsh_topk(emb, _query_vectors(spark, sf_dir), k=5)
    return ann.withColumn("rank", F.col("rank").cast("long"))


def q_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN (round 8): the query's bucket plus all 8
    Hamming-1 buckets -- the standard recall lever when the sign-LSH
    bucket is too selective (Lv et al., VLDB 2007). Deterministic
    splitmix64-mixed planes (round 9 randomness fix), so the probe
    set is embedded in the oracle and the
    approximate path hash-checks exactly. Recall vs the single-bucket
    form is measured by the ann_recall_lsh / ann_recall_lsh_multiprobe
    rows (SCALING.md ladder)."""
    from ..operators.similarity import ann_lsh_multiprobe_topk

    emb = load_table(spark, sf_dir, "embeddings")
    ann = ann_lsh_multiprobe_topk(emb, _query_vectors(spark, sf_dir), k=5)
    return ann.withColumn("rank", F.col("rank").cast("long"))


def q_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative Lloyd's k-means cell assignment. Oracle-checked:
    exact decimal-sum means make every round deterministic, and the
    DuckDB oracle unrolls the identical iterations. EAGER: Lloyd
    rounds run at DataFrame-construction time."""
    from ..operators.kmeans import kmeans_cells

    return kmeans_cells(load_table(spark, sf_dir, "embeddings"), k=8, n_iter=3)


def q_cluster_topics(spark: SparkSession, sf_dir: str, topn: int = 5,
                     min_count: int = 5) -> DataFrame:
    """Topic labeling of embedding clusters: k-means cells (the
    trained quantizer) joined to the documents' tokens, then each
    cell's top terms by LIFT = p(word|cell)/p(word) -- the
    cluster-inspection report of corpus-curation workflows ('what is
    in this cell I am about to drop/keep'). EAGER: reuses
    q_kmeans_cells' Lloyd fit at build time.

    Plan: the join is vec_id==doc_id (uniform keys); the lift
    denominators are three aggregates of the (cell, word) count table
    (per-cell totals, per-word totals, grand total) joined back --
    all post-aggregation sizes; top-n per cell is a window over the
    filtered count table."""
    from pyspark.sql import Window

    from ..functions.text_stats import with_token_array

    cells = q_kmeans_cells(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), F.col("cell").cast("long").alias("cell")
    )
    docs = with_token_array(load_table(spark, sf_dir, "documents"))
    words = docs.select("doc_id", F.explode("toks").alias("word")).join(
        cells, "doc_id"
    )
    cw = words.groupBy("cell", "word").agg(F.count("*").alias("cnt"))
    cw = materialize(cw)  # 3 aggregates + the join reuse it
    ct = cw.groupBy("cell").agg(F.sum("cnt").alias("ctot"))
    wt = cw.groupBy("word").agg(F.sum("cnt").alias("wtot"))
    g = cw.agg(F.sum("cnt").alias("gtot"))
    lift = F.round(
        (F.col("cnt").cast("double") / F.col("ctot"))
        / (F.col("wtot").cast("double") / F.col("gtot")),
        6,
    )
    scored = (
        cw.filter(F.col("cnt") >= min_count)
        .join(F.broadcast(ct), "cell")
        .join(wt, "word")
        .crossJoin(F.broadcast(g))
        .select("cell", "word", "cnt", lift.alias("lift"))
    )
    w = Window.partitionBy("cell").orderBy(F.desc("lift"), F.asc("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topn)
    )


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantized ANN. Oracle-checked end-to-end: centroids
    are exact decimal-sum means, so DuckDB reproduces the identical
    probe routing and serve ranking."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_ivf_topk(emb, _query_vectors(spark, sf_dir), k=5)


def _recall_df(spark, sf_dir, ann) -> DataFrame:
    exact = q_knn_cosine(spark, sf_dir).select("query_id", "neighbor_id")
    hits = (
        exact.join(ann, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    base = exact.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    nh = F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
    return (
        base.join(hits, "query_id", "left")
        .select(
            "query_id",
            nh.alias("n_hits"),
            F.round(nh / F.col("n_exact").cast("double"), 6).alias("recall"),
        )
    )


def q_bm25_snippets(spark: SparkSession, sf_dir: str, topn: int = 20,
                    ctx: int = 30, width: int = 80) -> DataFrame:
    """Search-result presentation: for each BM25 top-doc, an 80-char
    snippet centered on the FIRST query-term occurrence (instr
    positions; absent terms rank as +infinity via a sentinel). All
    expression-level string ops -- the snippet stage adds zero
    shuffles to the ranked join."""
    far = F.lit(1_000_000_000)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    top = q_bm25_topk(spark, sf_dir, topn=topn)
    pos_cols = [
        F.when(F.instr(F.col("text"), F.lit(t)) > 0,
               F.instr(F.col("text"), F.lit(t))).otherwise(far)
        for t in BM25_QUERY
    ]
    first_pos = F.least(*pos_cols)
    start = F.greatest(first_pos - F.lit(ctx), F.lit(1))
    return (
        top.join(docs, "doc_id")
        .select(
            "doc_id",
            "bm25",
            F.when(first_pos < far,
                   F.substr(F.col("text"), start, F.lit(width)))
            .otherwise(F.substr(F.col("text"), F.lit(1), F.lit(width)))
            .alias("snippet"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
    )


def q_hybrid_rrf_topk(spark: SparkSession, sf_dir: str, k_each: int = 50,
                      topn: int = 20, rrf_k: int = 60) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical
    top-50 and the dense cosine top-50 (document vector 0 as the
    query embedding) -- score = sum over systems of 1/(60 + rank), the
    standard fusion that needs no score calibration. Both input
    rankings are deterministic plans already in the registry; fusion
    is a full-outer join of two <=50-row lists, so the fused stage
    costs nothing at any corpus size. Exact cross-engine: ranks are
    integers, each term is one double division, and the two terms add
    in fixed order (expression, not aggregation)."""
    from pyspark.sql import Window

    bm = q_bm25_topk(spark, sf_dir, topn=k_each)
    wl = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex = bm.select("doc_id", F.row_number().over(wl).alias("r_lex"))
    emb = load_table(spark, sf_dir, "embeddings")
    q0 = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("embedding").alias("qvec")
    )
    den = knn_brute_force(emb, q0, k=k_each).select(
        F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("r_den")
    )
    kd = F.lit(float(rrf_k))
    one = F.lit(1.0)
    fused = lex.join(den, "doc_id", "full").select(
        "doc_id",
        F.round(
            F.coalesce(one / (kd + F.col("r_lex").cast("double")), F.lit(0.0))
            + F.coalesce(one / (kd + F.col("r_den").cast("double")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(topn)


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-search quality eval: recall of the IVF ANN probe
    against exact brute-force kNN, per query (|ann cap exact| /
    |exact|). Both sides are deterministic plans already in the
    registry, so the whole evaluation is oracle-checkable -- the
    standard way to choose n_probe/cells before shipping an index."""
    ann = q_ann_ivf(spark, sf_dir).select("query_id", "neighbor_id")
    return _recall_df(spark, sf_dir, ann)


def q_ann_recall_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the SINGLE-BUCKET LSH ANN path vs exact kNN -- the
    honesty row the LSH family lacked (ann_recall covers IVF).
    Measured mean top-5 recall 0.00 at sf0.01/sf0.1 (r9 splitmix64
    planes): all 8 sign bits must agree, so the bucket misses nearly
    every true neighbor at this corpus's moderate-cosine (~0.37)
    neighborhoods. Kept as the documented lower rung of the probing
    ladder (multi-probe 0.06-0.12, IVF 0.28-0.32, banded+re-rank
    0.88-0.92; SCALING.md r9 ANN ladder)."""
    ann = q_ann_lsh(spark, sf_dir).select("query_id", "neighbor_id")
    return _recall_df(spark, sf_dir, ann)


def q_ann_recall_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the multi-probe LSH ANN path vs exact kNN -- the
    same eval over the Hamming-1 probe set. Measured mean top-5
    recall 0.06 at sf0.01 / 0.08 at sf0.1 (r9 splitmix64 planes) vs
    single-bucket's 0.00: the 9 probes recover only the neighbors
    that disagree on exactly one sign bit -- at neighbor cosine ~0.37
    (p_agree ~0.62) most true neighbors disagree on 2+ of 8 planes,
    which is exactly why the banded OR-of-ANDs path
    (ann_recall_lsh_banded, 0.88-0.92) is the serving configuration
    (SCALING.md r9 ladder)."""
    ann = q_ann_lsh_multiprobe(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    return _recall_df(spark, sf_dir, ann)


def q_ann_lsh_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH ANN with exact re-ranking (round 9, VERDICT r8 #1
    lead task): 64 bands x 7 sign bits generate candidates (collide
    in ANY band), exact cosine re-ranks the distinct candidate set --
    the first LSH configuration on this corpus with usable recall
    (mean top-5 recall 0.92 at sf0.1; ann_recall_lsh_banded is the
    measured row, tests/test_ann_recall_floor.py pins the floor).
    Deterministic splitmix64 planes keep the whole approximate path
    hash-checkable against the DuckDB twin."""
    from ..operators.similarity import ann_lsh_banded_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_lsh_banded_topk(emb, _query_vectors(spark, sf_dir), k=5)


ANN_BANDED_SWEEP = (16, 32, 64)


def q_ann_recall_lsh_banded_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall-vs-bands TUNING CURVE for the banded+re-ranked ANN
    path (mirror of ann_recall_sweep for IVF): per-query recall at
    bands in {16, 32, 64}, rows_per_band=7. Because plane p depends
    only on its flat index, a smaller sweep config's planes are a
    PREFIX of a larger one's -- so the candidate sets are nested and
    recall is provably monotone non-decreasing in bands
    (pytest-pinned). This is the table an operator reads to trade
    probe volume against recall before shipping; measured sf0.1 means:
    0.50 / 0.84 / 0.92."""
    from ..operators.similarity import ann_lsh_banded_topk

    emb = load_table(spark, sf_dir, "embeddings")
    out = None
    for bands in ANN_BANDED_SWEEP:
        ann = ann_lsh_banded_topk(
            emb, _query_vectors(spark, sf_dir), k=5, bands=bands
        )
        r = _recall_df(spark, sf_dir, ann.select("query_id", "neighbor_id"))
        r = r.select(F.lit(bands).cast("long").alias("bands"), "*")
        out = r if out is None else out.unionByName(r)
    return out


def q_ann_banded_candidates_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COST half of the banded-ANN tuning table (recall half:
    ann_recall_lsh_banded_sweep, same (bands, query_id) keys): per
    query, how many distinct corpus vectors the banded candidate
    generator actually probes at bands in {16, 32, 64}, and the
    fraction of the corpus that is. Join the two rows and you have
    measured recall-vs-probe-volume -- the curve SCALING.md's r9
    ladder quotes (e.g. 0.92 recall at ~0.42 fraction for 64x7 on
    this corpus). Candidate counts are deterministic (splitmix64
    planes), so the whole cost surface is oracle-checkable.

    Plan shape: identical ids-only banded join as the serving path;
    the count is a per-query aggregate of the distinct candidate set;
    the corpus size joins in as one broadcast scalar."""
    from ..operators.similarity import ANN_ROWS_PER_BAND, with_lsh_bands

    emb = load_table(spark, sf_dir, "embeddings")
    total = emb.agg((F.count("*")).alias("_n"))
    out = None
    for bands in ANN_BANDED_SWEEP:
        cb = with_lsh_bands(
            emb.select("vec_id", "embedding"), "embedding",
            bands, ANN_ROWS_PER_BAND,
        ).select("vec_id", "band", "bucket")
        qb = with_lsh_bands(
            _query_vectors(spark, sf_dir).select(
                "query_id", F.col("qvec").alias("embedding")
            ),
            "embedding",
            bands,
            ANN_ROWS_PER_BAND,
        ).select("query_id", "band", "bucket")
        cand = (
            F.broadcast(qb)
            .join(cb, ["band", "bucket"])
            .filter(F.col("query_id") != F.col("vec_id"))
            .select("query_id", "vec_id")
            .distinct()
        )
        per_q = cand.groupBy("query_id").agg(
            F.count("*").alias("n_candidates")
        )
        r = per_q.crossJoin(F.broadcast(total)).select(
            F.lit(bands).cast("long").alias("bands"),
            "query_id",
            "n_candidates",
            F.round(
                F.col("n_candidates") / (F.col("_n") - F.lit(1)).cast("double"), 6
            ).alias("cand_frac"),
        )
        out = r if out is None else out.unionByName(r)
    return out


def q_ann_recall_lsh_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the banded+re-ranked LSH ANN path vs exact kNN: the
    measured proof that the r9 candidate widening reached a usable
    operating point. Mean top-5 recall 0.92/0.92/0.88 at
    sf0.1/0.01/0.001 at ~42% candidates probed per query -- on a
    synthetic corpus whose true neighbors sit at cosine ~0.37 against
    random ~0.0 (sign-LSH's worst case; clustered real embeddings
    reach the same recall at far smaller candidate fractions). The
    r8 ladder (single 0.00-0.06, multi-probe 0.06-0.16, IVF
    0.28-0.32) was capped by correlated LCG planes; see
    operators/similarity.lsh_planes."""
    ann = q_ann_lsh_banded(spark, sf_dir).select("query_id", "neighbor_id")
    return _recall_df(spark, sf_dir, ann)


ANN_SWEEP_PROBES = (1, 2, 4)


def q_ann_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall-vs-n_probe TUNING CURVE: per-query IVF recall at
    n_probe in {1, 2, 4} in one result (recall must be monotone
    non-decreasing in n_probe -- more probed cells only add
    candidates). This is the table an index operator reads to pick
    the latency/recall point before shipping; every branch reuses the
    deterministic IVF plan so the whole sweep stays hash-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = None
    for np_ in ANN_SWEEP_PROBES:
        ann = ann_ivf_topk(emb, _query_vectors(spark, sf_dir), k=5, n_probe=np_)
        r = _recall_df(spark, sf_dir, ann.select("query_id", "neighbor_id"))
        r = r.select(F.lit(np_).cast("long").alias("n_probe"), "*")
        out = r if out is None else out.unionByName(r)
    return out


def q_ann_rank_quality(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """GRADED ranking-quality eval of the IVF ANN index: per query,
    recall@k, MRR (reciprocal rank of the first true neighbor in the
    ANN list) and nDCG@k with graded relevance rel = k+1-exact_rank
    (the exact brute-force top-k is the ground truth, rel 0 for
    non-members) -- recall alone cannot distinguish an index that
    returns the right set in the wrong order.

    Scale: both input rankings are existing registry plans; the exact
    side is materialized once (it feeds both the relevance join and
    the ideal-DCG aggregate). Everything downstream operates on
    n_queries x k rows -- tiny regardless of corpus size.

    Cross-engine exactness: each DCG term rel/(ln(rank+1)/ln(2))
    rounds its ln's to 9dp (libm parity), then the term to 9dp, and
    sums as DECIMAL(20,9) (order-independent); the final nDCG division
    string-routes both decimal sums to double and rounds to 6dp. MRR
    and recall are exact small rationals rounded to 6dp.

    `k` is plumbed through BOTH rankings: the ANN list and the exact
    ground truth are each cut at depth k, and rel = k+1-exact_rank
    derives from the same k -- so recall@k/nDCG@k stay internally
    consistent at any k (ADVICE r5: the previous form graded a
    k-deep ANN list against a hard-pinned top-5 truth). The DuckDB
    oracle covers the driver's k=5 call."""
    emb = load_table(spark, sf_dir, "embeddings")
    ann = ann_ivf_topk(emb, _query_vectors(spark, sf_dir), k=k).select(
        "query_id", "neighbor_id", F.col("rank").alias("ann_rank")
    )
    return _rank_quality_df(spark, sf_dir, ann, k=k)


def _rank_quality_df(spark, sf_dir, ann: DataFrame, k: int = 5) -> DataFrame:
    """Graded eval core: `ann` is any (query_id, neighbor_id,
    ann_rank) ranking cut at depth `k`; ground truth is the exact
    brute-force top-k AT THE SAME k. Self-eval invariant
    (pytest-pinned): feeding the exact ranking itself yields
    recall = mrr = ndcg = 1.0 for every query."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = materialize(
        knn_brute_force(emb, _query_vectors(spark, sf_dir), k=k).select(
            "query_id", "neighbor_id", F.col("rank").cast("long").alias("exact_rank")
        )
    )
    ln2 = F.round(F.log(F.lit(2.0)), 9)

    def _dcg_term(rel, rank):
        disc = F.round(F.log(rank.cast("double") + 1.0), 9) / ln2
        return F.round(rel.cast("double") / disc, 9).cast("decimal(20,9)")

    j = ann.join(exact, ["query_id", "neighbor_id"], "left")
    rel = F.when(
        F.col("exact_rank").isNotNull(), F.lit(k + 1) - F.col("exact_rank")
    ).otherwise(F.lit(0)).cast("long")
    per_q = (
        j.select("query_id", rel.alias("rel"), "ann_rank")
        .groupBy("query_id")
        .agg(
            F.sum(_dcg_term(F.col("rel"), F.col("ann_rank"))).alias("dcg_d"),
            F.min(F.when(F.col("rel") > 0, F.col("ann_rank"))).alias("first_hit"),
            F.sum((F.col("rel") > 0).cast("long")).alias("n_hits"),
        )
    )
    ideal = exact.groupBy("query_id").agg(
        F.sum(
            _dcg_term(F.lit(k + 1) - F.col("exact_rank"), F.col("exact_rank"))
        ).alias("idcg_d"),
        F.count("*").alias("n_exact"),
    )
    nh = F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
    dcg = F.coalesce(F.col("dcg_d").cast("string").cast("double"), F.lit(0.0))
    idcg = F.col("idcg_d").cast("string").cast("double")
    return ideal.join(per_q, "query_id", "left").select(
        "query_id",
        nh.alias("n_hits"),
        F.round(nh / F.col("n_exact").cast("double"), 6).alias("recall"),
        F.coalesce(
            F.round(F.lit(1.0) / F.col("first_hit"), 6), F.lit(0.0)
        ).alias("mrr"),
        F.round(dcg / idcg, 6).alias("ndcg"),
    )


def q_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over LEARNED cells: Lloyd's k-means assigns the
    inverted lists, then the same probe/serve plan as ann_ivf -- the
    full no-natural-partition-key recipe, oracle-checked end to end."""
    from ..operators.kmeans import kmeans_cells

    emb = load_table(spark, sf_dir, "embeddings")
    cells = kmeans_cells(emb, k=8, n_iter=3).select("vec_id", "cell")
    emb_cells = emb.join(cells, "vec_id")
    return ann_ivf_topk(emb_cells, _query_vectors(spark, sf_dir), k=5, by="cell")


def q_mmr_rerank(spark: SparkSession, sf_dir: str, n_cand: int = 20,
                 k: int = 8, lam: float = 0.7) -> DataFrame:
    """MMR diversified re-rank (operators/mmr.py): brute-force top-20
    candidates per query, then greedy lam=0.7 relevance-vs-redundancy
    selection of 8 via applyInPandas over query groups -- serving-time
    dedup for a near-dup-heavy corpus. The oracle unrolls the 8 greedy
    steps as materialized CTEs; literal lam/(1.0-lam) doubles and the
    shared cosine fold keep every pick hash-exact."""
    from ..operators.mmr import mmr_select

    emb = load_table(spark, sf_dir, "embeddings")
    cand = knn_brute_force(emb, _query_vectors(spark, sf_dir), k=n_cand)
    cand = cand.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        "neighbor_id",
    ).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("cosine").alias("sim_q"),
        "embedding",
    )
    return mmr_select(cand, k=k, lam=lam)


def _mmr_ctes(n_cand: int = 20, k: int = 8) -> str:
    """Unrolled greedy-MMR oracle: step i scores every not-yet-picked
    candidate against the selected set sel{i-1} and picks the argmax
    (ties on doc_id asc). lam appears ONLY as the literals 0.7 and
    (1.0 - 0.7), matching the Python operator's doubles."""
    parts = [
        f"""
  WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dvec FROM embeddings),
  q AS (SELECT vec_id AS query_id, dvec AS qvec FROM v WHERE vec_id < 10),
  s AS (SELECT q.query_id, e.vec_id AS doc_id, e.dvec,
               round(list_cosine_similarity(q.qvec, e.dvec), 6) AS sim_q
        FROM q, v e WHERE e.vec_id <> q.query_id),
  cand AS MATERIALIZED (SELECT query_id, doc_id, dvec, sim_q FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY sim_q DESC, doc_id ASC) AS rn FROM s)
    WHERE rn <= {n_cand}),
  sel0 AS (SELECT query_id, doc_id, dvec FROM cand WHERE FALSE)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
  sc{i} AS MATERIALIZED (
    SELECT c.query_id, c.doc_id,
           CAST(0.7 AS DOUBLE) * c.sim_q
           - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE))
             * coalesce(mx.m, CAST(0.0 AS DOUBLE)) AS score
    FROM cand c
    LEFT JOIN (SELECT c2.query_id, c2.doc_id,
                      max(round(list_cosine_similarity(c2.dvec, s.dvec), 6)) AS m
               FROM cand c2 JOIN sel{i-1} s ON c2.query_id = s.query_id
               GROUP BY 1, 2) mx
      ON mx.query_id = c.query_id AND mx.doc_id = c.doc_id
    WHERE NOT EXISTS (SELECT 1 FROM sel{i-1} s
                      WHERE s.query_id = c.query_id AND s.doc_id = c.doc_id)),
  p{i} AS MATERIALIZED (SELECT query_id, doc_id, score FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, doc_id ASC) AS rn FROM sc{i}) WHERE rn = 1),
  sel{i} AS MATERIALIZED (SELECT query_id, doc_id, dvec FROM sel{i-1}
    UNION ALL
    SELECT p.query_id, p.doc_id, c.dvec FROM p{i} p
      JOIN cand c ON c.query_id = p.query_id AND c.doc_id = p.doc_id)"""
        )
    tail = "\n  UNION ALL\n".join(
        f"  SELECT query_id, doc_id, CAST({i} AS BIGINT) AS pick_rank,"
        f" score AS mmr FROM p{i}"
        for i in range(1, k + 1)
    )
    return "".join(parts) + "\n" + tail


def q_embedding_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_dup_pairs(load_table(spark, sf_dir, "embeddings"), min_cosine=0.35)


def q_embedding_dup_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: pair search restricted to LSH buckets (recall<1,
    but deterministic -- the splitmix64 planes are embedded in the
    oracle, so even the approximate path hash-checks)."""
    return embedding_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), min_cosine=0.35, use_lsh=True
    )


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding corpus, projected to
    gate-hashable scalars: code checksum/extrema (exact integers) +
    reconstruction mse at 6 decimals."""
    q = quantize_embeddings(load_table(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id",
        F.size("codes").cast("long").alias("n_dims"),
        F.aggregate(
            "codes", F.lit(0).cast("long"), lambda a, c: a + c.cast("long")
        ).alias("code_sum"),
        F.array_min("codes").cast("long").alias("code_min"),
        F.array_max("codes").cast("long").alias("code_max"),
        "mse",
    )


def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes (4 subspaces x 4 codewords over the
    64-dim embeddings) + total reconstruction error, projected to
    scalar code columns for the gate. EAGER: the per-subspace Lloyd
    fits run at DataFrame-construction time."""
    from ..operators.quantization import pq_codes

    pq = pq_codes(load_table(spark, sf_dir, "embeddings"))
    return pq.select(
        "vec_id",
        *[F.col("codes")[j].alias(f"c{j}") for j in range(4)],
        "recon_err",
    )


def q_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-5 neighbors from the PQ codes alone (the compressed-
    domain ANN scan). EAGER: trains the codebooks first."""
    from ..operators.quantization import pq_adc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_adc_topk(emb, _query_vectors(spark, sf_dir), topk=5)


def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: coarse k-means cells bound the scan, PQ codes
    compress it -- the standard billion-scale ANN layout, fully
    oracle-checked. EAGER: trains coarse + subspace codebooks."""
    from ..operators.quantization import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_topk(emb, _query_vectors(spark, sf_dir), topk=5)


def q_ann_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC proper: PQ codebooks trained on coarse-cell residuals
    (tighter codes at the same bit budget). EAGER: trains coarse +
    residual subspace codebooks."""
    from ..operators.quantization import ivfpq_residual_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_residual_topk(emb, _query_vectors(spark, sf_dir), topk=5)


def q_nb_lang_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained multinomial Naive Bayes language classifier: two
    training aggregations, broadcast model table, decimal-exact
    log-score accumulation, deterministic argmax."""
    from ..operators.nb_classify import nb_lang_scores

    return nb_lang_scores(load_table(spark, sf_dir, "documents"))


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: target-vs-raw unigram log-likelihood
    ratio per raw-pool doc (two vocab-sized training aggregations,
    decimal-exact accumulation; data-selection surface)."""
    from ..operators.dsir import dsir_weights

    return dsir_weights(load_table(spark, sf_dir, "documents"))


def q_select_pretraining_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed data-selection pipeline: exact dedup -> DSIR
    importance threshold (>= 0: at least as target-like as the raw
    average) -> temperature rebalancing over the selected pool."""
    from ..plans.pipeline import select_pretraining_corpus

    return select_pretraining_corpus(spark, sf_dir)


def q_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation loop: confusion matrix of the NB
    prediction vs the labeled lang (count per (lang, pred_lang))."""
    from ..operators.nb_classify import nb_lang_scores

    return (
        nb_lang_scores(load_table(spark, sf_dir, "documents"))
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: k-means cells bound the pair
    scan; within a cell, a vector with a smaller-id neighbor at
    cosine >= 0.35 is marked keep=false. EAGER: trains the cells."""
    from ..operators.similarity import semantic_dedup

    return semantic_dedup(load_table(spark, sf_dir, "embeddings"), min_cosine=0.35)


# ---------------------------------------------------------------------------
# clustered-corpus ANN selectivity (round 10, VERDICT r9 #1/#3)
# ---------------------------------------------------------------------------
# The driver's embeddings table is deliberately near-orthogonal (true
# neighbors at cosine ~0.37 vs random ~0.0) -- sign-LSH's worst case,
# where 0.92 recall costs a ~42% candidate fraction and no sublinear
# ANN can exist. These rows measure the SAME banded/IVF serving paths
# on a deterministic corpus WITH neighborhood structure
# (within-cluster cosine ~0.80, cross ~0.00 -- see
# clustered_corpus_structure), turning SCALING.md's "clustered real
# embeddings collide far more selectively" from an assertion into a
# measured, oracle-checked curve.

CLUSTERED_N_CLUSTERS = 25
CLUSTERED_SIGMA = 0.5
ANN_CLUSTERED_SWEEP = (4, 8, 16, 64)


def _clustered_vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import synthetic_clustered_embeddings

    ids = load_table(spark, sf_dir, "embeddings").select("vec_id")
    return synthetic_clustered_embeddings(
        ids, CLUSTERED_N_CLUSTERS, CLUSTERED_SIGMA
    )


def _clustered_query_vecs(cv: DataFrame, n: int = 10) -> DataFrame:
    return cv.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("cluster").alias("qcluster"),
    )


def q_clustered_corpus_structure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The clustered fixture's measured geometry: cosine of the 10
    query vectors against the whole corpus, aggregated by whether the
    pair shares a cluster. Documents that the fixture actually has
    neighborhood structure (within ~0.80, cross ~0.00) AND pins the
    generator cross-engine (any drift in a single generated double
    shifts a rounded cosine and flips the hash). Mean is the
    decimal-sum of 6dp-rounded cosines -- order-independent."""
    cv = _clustered_vecs(spark, sf_dir)
    q = _clustered_query_vecs(cv)
    from ..functions.vectors import dot_col, l2_norm_col

    corpus = cv.select(
        "vec_id", F.col("cluster"), F.col("embedding").alias("vec"),
        l2_norm_col("embedding").alias("vnorm"),
    )
    pairs = (
        corpus.crossJoin(
            F.broadcast(
                q.select(
                    "query_id", "qcluster", "qvec",
                    l2_norm_col("qvec").alias("qnorm"),
                )
            )
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            (F.col("cluster") == F.col("qcluster")).cast("long").alias("same_cluster"),
            F.round(
                dot_col("qvec", "vec") / (F.col("qnorm") * F.col("vnorm")), 6
            ).alias("cosine"),
        )
    )
    csum = F.sum(F.col("cosine").cast("decimal(16,6)"))
    return pairs.groupBy("same_cluster").agg(
        F.count("*").alias("n_pairs"),
        F.round(
            csum.cast("string").cast("double") / F.count("*"), 6
        ).alias("mean_cos"),
        F.min("cosine").alias("min_cos"),
        F.max("cosine").alias("max_cos"),
    )


def q_ann_clustered_selectivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE recall-vs-candidate-fraction curve on data with real
    neighborhood structure (VERDICT r9 #1): for bands in {4, 8, 16,
    64} x rows_per_band=7, per query: top-5 recall of the banded+
    re-ranked ANN path AND the candidate fraction it probed, on the
    clustered corpus. Measured means (sf0.01 / sf0.1): recall 0.64 /
    0.72 at ~6% of the corpus (4 bands), 0.94 / 0.96 at ~10%
    (8 bands), 0.98 / 1.00 at ~18% (16 bands), 1.00 at ~44%
    (64 bands) -- versus 0.92 recall at ~42% for the SAME 64x7
    serving config on the near-orthogonal driver corpus
    (ann_recall_lsh_banded + ann_banded_candidates_sweep). I.e. on
    clustered data the operator reaches the orthogonal fixture's
    recall at ~a quarter of its probe volume, and the tuned operating
    point (8-16 bands) is 3-7x cheaper still -- sign-LSH selectivity
    is a property of the data's neighborhood structure, now measured
    rather than asserted (SCALING.md r10). Candidate sets nest across
    sweep widths (plane-prefix property), so recall is provably
    monotone in bands (pytest-pinned)."""
    from ..operators.similarity import banded_candidates, rerank_topk

    cv = _clustered_vecs(spark, sf_dir)
    corpus = cv.select("vec_id", "embedding")
    q = _clustered_query_vecs(cv).select("query_id", "qvec")
    exact = knn_brute_force(corpus, q, k=5).select("query_id", "neighbor_id")
    n_exact = exact.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    total = corpus.agg(F.count("*").alias("_n"))
    out = None
    for bands in ANN_CLUSTERED_SWEEP:
        # ONE evaluation of the banded pipeline per arm: the top-k
        # rows carry the candidate-set size as a window count
        # (count_col), so recall and probe volume come out of the
        # same pass -- a second consumer of the candidate set would
        # re-run the band hashing (Spark expands shared lazy
        # subplans per consumer; no exchange reuse here, measured)
        topk = rerank_topk(
            banded_candidates(corpus, q, bands=bands),
            corpus, q, k=5, count_col="n_candidates",
        )
        per_q = (
            topk.join(
                exact.withColumn("_hit", F.lit(1)),
                ["query_id", "neighbor_id"],
                "left",
            )
            .groupBy("query_id")
            .agg(
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hits"),
                F.max("n_candidates").alias("n_candidates"),
            )
        )
        nh = F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
        ncand = F.coalesce(F.col("n_candidates"), F.lit(0)).cast("long")
        r = (
            n_exact.join(per_q, "query_id", "left")
            .crossJoin(F.broadcast(total))
            .select(
                F.lit(bands).cast("long").alias("bands"),
                "query_id",
                nh.alias("n_hits"),
                F.round(nh / F.col("n_exact").cast("double"), 6).alias("recall"),
                ncand.alias("n_candidates"),
                F.round(
                    ncand / (F.col("_n") - F.lit(1)).cast("double"), 6
                ).alias("cand_frac"),
            )
        )
        out = r if out is None else out.unionByName(r)
    return out


def q_ann_clustered_ivf_kmeans_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall AND cost of the LEARNED-cell IVF path on the clustered
    corpus (VERDICT r9 #3: the one IVF variant that could be
    selective on clustered data had no quality number). k-means
    (k=25, 3 Lloyd rounds, smallest-id seeds) learns the inverted
    lists, the standard 2-probe serve runs, and the row reports
    per-query top-5 recall vs exact kNN plus the candidate fraction
    actually scanned (rows in the probed cells). On this corpus the
    learned cells align with the true clusters, so IVF reaches
    recall ~1.0 at ~8% of the corpus (2 of 25 cells) -- versus
    0.28-0.32 recall for the same plan on the near-orthogonal driver
    corpus (ann_recall ladder), the measured statement of WHEN IVF
    is the right index. EAGER: trains the cells at build time.
    Oracle: the unrolled Lloyd fit over the clustered CTE."""
    from ..operators.kmeans import kmeans_cells
    from ..operators.similarity import ann_ivf_candidate_counts

    cv = _clustered_vecs(spark, sf_dir)
    corpus = cv.select("vec_id", "embedding")
    cells = kmeans_cells(
        corpus, k=CLUSTERED_N_CLUSTERS, n_iter=3
    ).select("vec_id", "cell")
    emb_cells = corpus.join(cells, "vec_id")
    q = _clustered_query_vecs(cv).select("query_id", "qvec")
    ann = ann_ivf_topk(emb_cells, q, k=5, by="cell").select(
        "query_id", "neighbor_id"
    )
    exact = knn_brute_force(corpus, q, k=5).select("query_id", "neighbor_id")
    hits = (
        exact.join(ann, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    n_exact = exact.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    n_cand = ann_ivf_candidate_counts(emb_cells, q, n_probe=2, by="cell")
    total = corpus.agg(F.count("*").alias("_n"))
    nh = F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
    ncand = F.coalesce(F.col("n_candidates"), F.lit(0)).cast("long")
    return (
        n_exact.join(hits, "query_id", "left")
        .join(n_cand, "query_id", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "query_id",
            nh.alias("n_hits"),
            F.round(nh / F.col("n_exact").cast("double"), 6).alias("recall"),
            ncand.alias("n_candidates"),
            F.round(
                ncand / (F.col("_n") - F.lit(1)).cast("double"), 6
            ).alias("cand_frac"),
        )
    )


def q_ann_recall_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the learned-cell (k-means) IVF path vs exact kNN on
    the standard corpus -- the missing rung of the recall ladder
    (VERDICT r9 #3: ann_ivf_kmeans was oracle-green but absent from
    the ladder). Measured mean top-5 recall 0.86 at sf0.01 / 0.80 at
    sf0.1 at a ~24-25% candidate fraction (2 of 8 learned cells) --
    far above label-cell IVF's 0.28-0.32 (labels are uncorrelated
    with neighborhoods by construction; even weak learned structure
    routes better) and cheaper per recall point than banded-64x7
    LSH's 0.92 at ~42% on this near-orthogonal corpus. Its clustered
    twin (ann_clustered_ivf_kmeans_recall) measures 1.0 at ~8%
    probed -- together they bound WHEN the IVF family applies.
    EAGER: trains the cells at build time."""
    ann = q_ann_ivf_kmeans(spark, sf_dir).select("query_id", "neighbor_id")
    return _recall_df(spark, sf_dir, ann)
