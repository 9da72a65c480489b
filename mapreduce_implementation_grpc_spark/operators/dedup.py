"""Deduplication operators (extension surface, SURVEY.md section 2b).

Four escalating strategies, all shuffle-based (no driver collect),
each the idiomatic Spark shape for its scale regime:

- exact_dedup:       hash fingerprint -> groupBy. One shuffle on a
                     short key; partial agg halves it map-side.
- ngram_jaccard:     exact Jaccard on candidate pairs that share a
                     *rare* shingle (bounded fan-out join).
- minhash_near_dup:  MinHash signatures + banded LSH -- the linear-
                     cost path at 100 TB: candidates only ever meet
                     inside a band bucket, never a cross join.
- simhash:           64-bit SimHash per doc + Hamming-banded pairs.

Hash functions are Spark's xxhash64 (JVM, seedable); MinHash/SimHash
therefore have no DuckDB oracle and are covered by metamorphic tests
(exact dup => estimated Jaccard 1 / Hamming 0) plus the driver's
rows-only check. ngram_jaccard and exact_dedup are oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.normalize import normalized_col
from ..operators.tokenize import tokens_col

DEFAULT_SHINGLE_K = 3
DEFAULT_NUM_PERM = 16
# 8 bands of 2 rows: collision prob = 1-(1-j^2)^8, i.e. ~96% recall at
# j=0.57, ~27% at j=0.2 -- tuned to surface near-dups while the exact
# Jaccard re-check (always computed on candidates) kills false positives.
DEFAULT_BANDS = 8


def shingle_rows(docs: DataFrame, text_col: str = "text", k: int = DEFAULT_SHINGLE_K) -> DataFrame:
    """DataFrame[doc_id, sh] of k-token shingles, one row each.

    Built as posexplode + window lead over (doc_id, pos) rather than a
    higher-order `transform(sequence(...), i -> slice(toks, i, k))`
    expression: in the latter, `toks` inside the lambda is an
    expression TREE, so the whole tokenize pipeline re-evaluates once
    per shingle index (~k*n regex evaluations per doc -- measured 50x
    slower). Here tokenization runs once per doc, shingle assembly is
    flat codegen'd expressions, and the output is already hash-
    partitioned by doc_id for the downstream per-doc aggregation (no
    second shuffle)."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col("doc_id"),
        F.posexplode(tokens_col(normalized_col(text_col))).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, k)]
    sh = toks.select(
        "doc_id",
        F.when(F.lead("tok", k - 1).over(w).isNotNull(), F.concat_ws(" ", *parts)).alias("sh"),
    )
    return sh.filter(F.col("sh").isNotNull())


def shingle_rows_flat(docs: DataFrame, text_col: str = "text", k: int = DEFAULT_SHINGLE_K) -> DataFrame:
    """DataFrame[doc_id, sh] of k-token shingles built WITHOUT any
    shuffle: the token array is materialized once per row behind an
    explode(array(...)) Generate barrier (so CollapseProject cannot
    inline the tokenize pipeline into the per-shingle lambda -- the
    measured 50x pitfall), then shingle assembly is a flat
    slice+concat per index over the bound array attribute.

    Use this variant when the consumer does NOT need the output
    hash-partitioned by doc_id (e.g. a broadcast-join probe or a
    groupBy on the shingle itself); `shingle_rows` keeps the
    window-based form whose Exchange is reused by per-doc
    aggregations downstream."""
    toksed = docs.select(
        "doc_id",
        F.explode(F.array(tokens_col(normalized_col(text_col)))).alias("toks"),
    )
    n = F.size("toks")
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    sh_arr = F.transform(idx, lambda i: F.concat_ws(" ", F.slice("toks", i, k)))
    return toksed.select("doc_id", F.explode(sh_arr).alias("sh"))


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by md5 of normalized text: one row per
    distinct content, keeping the smallest doc_id as canonical.
    Scale: shuffle key is a 128-bit digest -- uniformly distributed,
    skew-free regardless of content skew."""
    fp = docs.select(F.col("doc_id"), F.md5(normalized_col(text_col)).alias("fp_md5"))
    return fp.groupBy("fp_md5").agg(
        F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_dups")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = DEFAULT_SHINGLE_K,
    max_doc_freq: int = 3,
    min_jaccard: float = 0.05,
) -> DataFrame:
    """Exact shingle-Jaccard for pairs sharing at least one *rare*
    shingle (document frequency <= max_doc_freq).

    The rare-shingle restriction is the scale lever: each qualifying
    shingle contributes at most C(max_doc_freq,2) pairs, so the
    candidate join is linear in corpus size instead of quadratic.
    (MinHash banding below is the fully general variant; this one is
    SQL-expressible and oracle-checked.)
    """
    sh = shingle_rows(docs, text_col, k).distinct()
    shingled = sh.groupBy("doc_id").agg(F.collect_set("sh").alias("shset"))
    rare = (
        sh.groupBy("sh")
        .agg(F.count("*").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= max_doc_freq))
        .select("sh")
    )
    sh_rare = sh.join(rare, "sh")  # AQE broadcasts `rare` when small
    a, b = sh_rare.alias("a"), sh_rare.alias("b")
    pairs = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = shingled.select(F.col("doc_id").alias("doc_a"), F.col("shset").alias("sa"))
    sb = shingled.select(F.col("doc_id").alias("doc_b"), F.col("shset").alias("sb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("sa", "sb"))
                / F.size(F.array_union("sa", "sb")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def shingle_sets(docs: DataFrame, text_col: str = "text", k: int = DEFAULT_SHINGLE_K) -> DataFrame:
    """DataFrame[doc_id, shset: array<string>] of distinct k-shingles."""
    return shingle_rows(docs, text_col, k).groupBy("doc_id").agg(
        F.collect_set("sh").alias("shset")
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    k: int = DEFAULT_SHINGLE_K,
    num_perm: int = DEFAULT_NUM_PERM,
    with_shset: bool = False,
) -> DataFrame:
    """MinHash signature per doc: sig[p] = min over shingles of
    xxhash64(p, shingle).

    Shape matters: shingles are EXPLODED to rows and the per-perm
    minima taken with groupBy(doc_id).agg(min...) -- flat scalar
    expressions that stay in whole-stage codegen, with map-side
    partial mins before the one shuffle. (The tempting pure-
    expression form -- transform over a perm sequence with a nested
    array_min -- gets its input tree inlined per perm/band by
    CollapseProject and falls out of codegen: ~100x slower at 5k
    docs, catastrophically worse at scale.) Docs with no shingles
    (fewer than k tokens) drop out, as documented."""
    sh = shingle_rows(docs, text_col, k)
    aggs = [F.min(F.xxhash64(F.lit(p), F.col("sh"))).alias(f"h{p}") for p in range(num_perm)]
    if with_shset:
        # same shuffle also carries the shingle set, so downstream
        # consumers (exact-jaccard re-check) share ONE aggregation
        # subplan instead of recomputing the shingle pipeline per use
        aggs.append(F.collect_set("sh").alias("shset"))
    sig = sh.groupBy("doc_id").agg(*aggs)
    out = ["doc_id", F.array(*[F.col(f"h{p}") for p in range(num_perm)]).alias("sig")]
    if with_shset:
        out.append(F.col("shset"))
    return sig.select(*out)


def minhash_near_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = DEFAULT_SHINGLE_K,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    min_est_jaccard: float = 0.3,
) -> DataFrame:
    """Banded-LSH near-duplicate pairs.

    sig split into `bands` bands of num_perm/bands rows; docs sharing
    any band hash become candidates (groupBy band bucket -- a shuffle
    on (band_id, band_hash), never a cross join). Candidates are then
    scored with BOTH the signature estimate and the exact shingle
    Jaccard. At 100 TB: band buckets are uniformly hash-distributed;
    a pathological bucket (e.g. empty-doc cluster) is handled by AQE
    skew-join splitting.
    """
    rows_per_band = num_perm // bands
    # lazy localCheckpoint: the signature aggregation feeds THREE
    # consumers (band explode, candidate side A, candidate side B);
    # checkpointing materializes it once per action instead of
    # replaying the whole shingle pipeline per consumer (measured 2x
    # at sf0.1). eager=False keeps the query lazy for the driver's
    # build-then-act contract.
    sigs = minhash_signatures(docs, text_col, k, num_perm, with_shset=True).localCheckpoint(
        eager=False
    )
    # slim (doc_id, band_id, band_hash) rows: the self-join and the
    # distinct-pairs shuffle move only three scalars per row -- the
    # signature/shingle arrays are re-attached to the (few) surviving
    # candidate pairs afterwards
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.xxhash64(F.concat_ws(",", *[
                        F.col("sig")[b * rows_per_band + r].cast("string")
                        for r in range(rows_per_band)
                    ])).alias("band_hash"),
                )
                for b in range(bands)
            ])
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")

    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    side_a = sigs.select(
        F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"), F.col("shset").alias("sa")
    )
    side_b = sigs.select(
        F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"), F.col("shset").alias("sb")
    )
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
        / F.lit(float(num_perm))
    )
    return (
        cand.join(side_a, "doc_a")
        .join(side_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(est, 6).alias("est_jaccard"),
            F.round(
                F.size(F.array_intersect("sa", "sb")) / F.size(F.array_union("sa", "sb")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("est_jaccard") >= min_est_jaccard)
    )


def label_propagation(pairs: DataFrame, max_iter: int = 6) -> DataFrame:
    """Connected components over an undirected pair graph via
    iterative min-label propagation: DataFrame[doc_id, cluster] where
    cluster = smallest doc_id reachable (the canonical representative
    a dedup pipeline keeps). Only nodes appearing in some edge are
    emitted.

    Iterative-algorithm shape for Spark: each round is one join +
    aggregation; localCheckpoint() truncates the growing lineage so
    round N doesn't replay rounds 1..N-1. Near-dup components have
    tiny diameters in practice, so the loop exits early via an
    inexpensive changed-count check."""
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).localCheckpoint()
    labels = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neigh = (
            edges.join(
                labels.select(F.col("doc_id").alias("doc_b"), F.col("label").alias("nlabel")),
                "doc_b",
            )
            .groupBy("doc_a")
            .agg(F.min("nlabel").alias("minn"))
        )
        new_labels = (
            labels.join(neigh, labels.doc_id == neigh.doc_a, "left")
            .select(
                labels.doc_id,
                F.least(F.col("label"), F.coalesce(F.col("minn"), F.col("label"))).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("doc_id", F.col("label").alias("cluster"))


def dedup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    min_est_jaccard: float = 0.3,
    max_iter: int = 6,
) -> DataFrame:
    """Near-duplicate clusters: connected components over the MinHash
    pair graph. Not SQL-expressible cross-engine (MinHash is
    xxhash64-based) -- validated by metamorphic tests (chained
    near-dups merge into one cluster) and the driver's rows-only
    check. The ngram-Jaccard variant (registry `dedup_clusters_jaccard`)
    is the oracle-checked twin of the same propagation loop."""
    pairs = minhash_near_dup_pairs(docs, text_col, min_est_jaccard=min_est_jaccard).select(
        "doc_a", "doc_b"
    )
    return label_propagation(pairs, max_iter)


def simhash_64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash over tokens: bit i of the fingerprint is set
    when more token hashes have bit i set than clear (the sign of the
    classic +/-1 sum). Computed as 64 branch-free bit-count
    aggregates sum((h>>i)&1) plus one count(*) -- `2*ones > n` is
    exactly `sum(+/-1) > 0`, and shift-and-add is ~25% faster than
    64 conditional sums (measured at sf0.1). One shuffle on doc_id,
    fully codegen'd."""
    toks = docs.select(
        F.col("doc_id"), F.explode(tokens_col(normalized_col(text_col))).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = [
        F.sum(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1))).alias(f"s{i}")
        for i in range(64)
    ]
    agg = toks.groupBy("doc_id").agg(F.count("*").alias("n"), *bit_sums)
    fp = None
    for i in range(64):
        bit = (
            F.when(2 * F.col(f"s{i}") > F.col("n"), F.lit(1).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseXOR(term)  # disjoint bits: XOR == OR == +
    return agg.select("doc_id", fp.alias("simhash"))


def hamming_banded_pairs(
    fp: DataFrame, max_hamming: int = 3, fp_col: str = "simhash"
) -> DataFrame:
    """All pairs within Hamming distance <= max_hamming of a 64-bit
    fingerprint column, via band-equality join (never a cross join).

    Banding is DERIVED from the threshold: the 64 bits are split into
    `max_hamming + 1` contiguous blocks (widths as equal as possible),
    so any pair differing in <= max_hamming bits must agree exactly on
    at least one block (pigeonhole) -- FULL recall at the requested
    distance, by construction. This is the Manku-et-al. block-split
    recipe (WWW'07 near-duplicate detection).

    Scale tradeoff, explicit: more bands -> narrower bands -> larger
    band buckets (a w-bit band has 2^w values, so expected bucket size
    is n/2^w for uniform fingerprints). At 9 bands the narrowest block
    is 7 bits; for corpora where n/128 candidate rows per bucket is
    too hot, the standard escalations are a wider fingerprint (128-bit
    simhash keeps blocks >= 14 bits at d <= 8) or requiring agreement
    on a PAIR of blocks (d <= (bands/2) - 1 recall, quadratically
    smaller buckets). AQE skew-join splitting handles stragglers
    either way.

    Takes the fingerprint DataFrame directly so tests can inject
    synthetic fingerprints with known pairwise distances."""
    n_bands = max_hamming + 1
    widths = [64 // n_bands + (1 if i < 64 % n_bands else 0) for i in range(n_bands)]
    offsets = [sum(widths[:i]) for i in range(n_bands)]
    banded = fp.select(
        "doc_id",
        fp_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright(F.col(fp_col), offsets[b])
                        .bitwiseAND(F.lit((1 << widths[b]) - 1))
                        .alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", fp_col, "band.band_id", "band.band_val")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col(f"a.{fp_col}").bitwiseXOR(F.col(f"b.{fp_col}"))).alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_near_dup_pairs(
    docs: DataFrame, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs with guaranteed recall: fingerprint via
    simhash_64, pairing via hamming_banded_pairs, whose band count
    adapts to max_hamming so the pigeonhole guarantee always covers
    the requested threshold."""
    return hamming_banded_pairs(simhash_64(docs, text_col), max_hamming)
