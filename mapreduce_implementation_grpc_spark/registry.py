"""Query registry: name -> (spark, sf_dir) -> DataFrame, plus the
equivalent DuckDB oracle SQL for the driver's correctness gate.

Conventions (driver compares row-count + schema + order-insensitive
value-hash, joining columns by NAME):
- every computed column aliased identically in Spark and SQL;
- floating-point outputs rounded to 6 decimals on BOTH sides, with
  identical expression trees, so IEEE results are bit-equal;
- money aggregates summed as DECIMAL (exact, order-independent) and
  cast to double only at the output boundary;
- integer outputs standardized to BIGINT/long;
- every ordering has a deterministic tie-break.

MinHash/SimHash sketches use PORTABLE hashing (md5-prefix base hash
+ LCG permutations, operators/dedup.py) so even the banded-LSH pair
queries and the composed curation pipeline are hash-checked against
DuckDB. Iterative k-means is oracle-checked too: exact decimal-sum
means make each Lloyd round deterministic, and the oracle unrolls
the same iterations in SQL. The only queries still without an
oracle entry are the true randomized/mergeable sketches (HLL
approx_distinct, GK quantiles) whose internal state no other engine
reproduces; they get the driver's rows-only check plus
error-bound tests.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from .materialize import materialize

from .functions.text_stats import (
    LANG_MARKERS,
    bpe_like_token_count_col,
    doc_fingerprint_cols,
    lang_score_cols,
    quality_score_col,
    text_stats_cols,
    with_token_array,
)
from .operators.dedup import (
    dedup_clusters,
    exact_dedup,
    label_propagation,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_fp,
    simhash_near_dup_pairs,
)
from .operators.curation import (
    PII_PATTERNS,
    decontaminate,
    eval_overlap_report,
    mixture_sample,
    pii_redact,
    repetition_stats,
    shard_manifest,
)
from .operators.normalize import normalized_col
from .operators.similarity import (
    ann_ivf_topk,
    ann_lsh_topk,
    embedding_dup_pairs,
    knn_brute_force,
    lsh_planes,
)
from .operators.quantization import quantize_embeddings
from .operators.tokenize import tokenize
from .operators.topk import top_k
from .functions.tfidf import tfidf_top_terms
from .operators.wordcount import (
    word_count,
    word_count_rdd,
    word_count_salted,
    word_count_sql,
)
from .sources.catalog import register_views
from .plans import analytics
from .plans.pipeline import curate_documents
from .multimodal.binary_ops import (
    decode_features,
    resize_images,
    sample_frames,
    with_binary_payload,
)
from .sources.catalog import load_table
from .sources.text import corpus_from_documents, read_text_corpus, task_id_col

# ---------------------------------------------------------------------------
# shared SQL fragments for oracles (DuckDB dialect)
# ---------------------------------------------------------------------------

# Matches operators.normalize + operators.tokenize exactly.
_SQL_WORDS = """
  SELECT unnest(string_split_regex(trim(lower(
           regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))), '\\s+')) AS word
  FROM documents
"""

_SQL_WORDCOUNT = f"""
  SELECT word, count(*) AS cnt FROM ({_SQL_WORDS}) WHERE word <> '' GROUP BY word
"""

# Per-doc token list, matching tokens_col(normalized_col(text)).
# Parameterized by source table/CTE name so composed oracles (e.g.
# curate_documents) can run the same fragment over an intermediate.
def _sql_toks(table: str = "documents") -> str:
    return f"""
  SELECT doc_id, lang, text,
         list_filter(string_split_regex(trim(lower(
           regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))), '\\s+'),
           w -> w <> '') AS toks
  FROM {table}
"""


_SQL_TOKS = _sql_toks()


# 3-token shingle set per doc, matching operators.dedup._shingles.
def _sql_shingles(table: str = "documents") -> str:
    return f"""
  SELECT doc_id, CASE WHEN len(toks) >= 3 THEN
           list_distinct(list_transform(range(1, len(toks) - 1),
             i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
         ELSE [] END AS shset
  FROM ({_sql_toks(table)})
"""


_SQL_SHINGLES = _sql_shingles()


def _bpe_ctes(k: int) -> str:
    """WITH-chain body for k unrolled BPE merge rounds, mirroring
    operators/bpe.py bit-for-bit: v{i} is the vocab after i merges
    (double-delimited symbol strings), p{i} the weighted pair counts,
    b{i} the greedy pick (max count, ties by (l, r) string order).
    replace() is plain non-overlapping left-to-right in both engines
    and the doubled delimiter means adjacent matches never share a
    character, so the unrolled SQL reproduces the iterative trainer
    exactly."""
    parts = [
        f"""wf AS (SELECT w, count(*) AS c
         FROM (SELECT unnest(toks) AS w FROM ({_SQL_TOKS})) GROUP BY 1),
  v0 AS (SELECT '||' || regexp_replace(w, '(.)', '\\1||', 'g') AS ws, c FROM wf)"""
    ]
    for i in range(k):
        parts.append(
            f"""p{i} AS (
    SELECT p.l AS l, p.r AS r, CAST(sum(c) AS BIGINT) AS cnt
    FROM (SELECT unnest(list_transform(range(1, len(s)),
                   j -> struct_pack(l := s[j], r := s[j + 1]))) AS p, c
          FROM (SELECT list_filter(string_split(ws, '||'), x -> x <> '') AS s, c
                FROM v{i}))
    GROUP BY 1, 2),
  b{i} AS (SELECT l, r, cnt FROM p{i} ORDER BY cnt DESC, l, r LIMIT 1),
  v{i + 1} AS (SELECT replace(ws,
                coalesce((SELECT '|' || l || '||' || r || '|' FROM b{i}), ''),
                coalesce((SELECT '|' || l || r || '|' FROM b{i}), '')) AS ws, c FROM v{i})"""
        )
    return ",\n  ".join(parts)


def _bpe_compression_sql(k: int) -> str:
    """Per-language rollup of the BPE encode CTEs (tokenizer parity)."""
    m_cols = ", ".join(
        f"coalesce((SELECT '|' || l || '||' || r || '|' FROM b{i}), '') AS s{i}, "
        f"coalesce((SELECT '|' || l || r || '|' FROM b{i}), '') AS t{i}"
        for i in range(k)
    )
    chain = "'||' || regexp_replace(w, '(.)', '\\1||', 'g')"
    for i in range(k):
        chain = f"replace({chain}, s{i}, t{i})"
    return f"""
      WITH {_bpe_ctes(k)},
      m AS (SELECT {m_cols}),
      per_doc AS (
        SELECT lang,
               CAST(coalesce(list_sum(list_transform(toks, w -> length(w))), 0)
                    AS BIGINT) AS nc,
               CAST(coalesce(list_sum(list_transform(toks, w ->
                 len(list_filter(string_split({chain}, '||'),
                                 x -> x <> '')))), 0) AS BIGINT) AS nb
        FROM ({_sql_toks()}) CROSS JOIN m)
      SELECT lang, CAST(sum(nc) AS BIGINT) AS total_chars,
             CAST(sum(nb) AS BIGINT) AS total_bpe_tokens,
             round(CAST(sum(nc) AS DOUBLE) / CAST(sum(nb) AS DOUBLE), 6)
               AS chars_per_token
      FROM per_doc GROUP BY lang ORDER BY lang
    """


def _bpe_pack_sql(k: int, budget: int = 256) -> str:
    """pack_sequences over real trained-BPE counts (oracle twin of
    q_pack_sequences_bpe): the encode CTEs feed the per-shard
    prefix-sum block layout."""
    m_cols = ", ".join(
        f"coalesce((SELECT '|' || l || '||' || r || '|' FROM b{i}), '') AS s{i}, "
        f"coalesce((SELECT '|' || l || r || '|' FROM b{i}), '') AS t{i}"
        for i in range(k)
    )
    chain = "'||' || regexp_replace(w, '(.)', '\\1||', 'g')"
    for i in range(k):
        chain = f"replace({chain}, s{i}, t{i})"
    return f"""
      WITH {_bpe_ctes(k)},
      m AS (SELECT {m_cols}),
      n AS (
        SELECT doc_id, source,
               CAST(coalesce(list_sum(list_transform(toks, w ->
                 len(list_filter(string_split({chain}, '||'),
                                 x -> x <> '')))), 0) AS BIGINT) AS n_tokens
        FROM (SELECT doc_id, source,
                     list_filter(string_split_regex(trim(lower(
                       regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))), '\\s+'),
                       w -> w <> '') AS toks
              FROM documents) CROSS JOIN m),
      p AS (
        SELECT doc_id, source, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
                    ORDER BY doc_id ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS prefix
        FROM n)
      SELECT doc_id, source, n_tokens,
             CAST(prefix // {budget} AS BIGINT) AS bin_id,
             CAST(prefix % {budget} AS BIGINT) AS offset
      FROM p
    """


def _bpe_encode_sql(k: int) -> str:
    """Per-doc BPE token counts with the k trained merges applied as
    a literal replace chain (scalar merge columns cross-joined in so
    the list lambda only references plain columns)."""
    m_cols = ", ".join(
        f"coalesce((SELECT '|' || l || '||' || r || '|' FROM b{i}), '') AS s{i}, "
        f"coalesce((SELECT '|' || l || r || '|' FROM b{i}), '') AS t{i}"
        for i in range(k)
    )
    chain = "'||' || regexp_replace(w, '(.)', '\\1||', 'g')"
    for i in range(k):
        chain = f"replace({chain}, s{i}, t{i})"
    return f"""
      WITH {_bpe_ctes(k)},
      m AS (SELECT {m_cols})
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_ws_tokens,
             CAST(coalesce(list_sum(list_transform(toks, w ->
               len(list_filter(string_split({chain}, '||'),
                               x -> x <> '')))), 0) AS BIGINT) AS n_bpe_tokens
      FROM ({_SQL_TOKS}) CROSS JOIN m
    """


def _pagerank_ctes(iters: int, seeds_sql: str | None = None) -> str:
    """Unrolled damped power iterations over the purchase graph,
    mirroring operators/pagerank.py: per-edge contributions rounded
    to 9dp and summed as DECIMAL (the lm_score exactness recipe), so
    every iteration's rank vector is bit-identical to Spark's.
    With `seeds_sql` (a SELECT yielding a `node` column) the teleport
    mass lands only on the seed set -- personalized PageRank."""
    parts = ["""e0 AS (SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
  e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
  deg AS (SELECT src AS dsrc, count(*) AS d FROM e GROUP BY 1),
  ed AS (SELECT e.src, e.dst, deg.d FROM e JOIN deg ON e.src = deg.dsrc)"""]
    if seeds_sql is None:
        parts.append("r0 AS (SELECT dsrc AS node, CAST(1.0 AS DOUBLE) AS r FROM deg)")
    else:
        parts.append(f"""seeds AS ({seeds_sql}),
  ind AS (SELECT deg.dsrc AS inode,
                 CASE WHEN seeds.node IS NOT NULL THEN CAST(1.0 AS DOUBLE)
                      ELSE CAST(0.0 AS DOUBLE) END AS ind
          FROM deg LEFT JOIN seeds ON deg.dsrc = seeds.node),
  r0 AS (SELECT inode AS node, ind AS r FROM ind)""")
    tele = ("CAST(0.15 AS DOUBLE)" if seeds_sql is None
            else "CAST(0.15 AS DOUBLE) * ind.ind")
    tail = "" if seeds_sql is None else " JOIN ind ON s.node = ind.inode"
    for t in range(1, iters + 1):
        parts.append(f"""r{t} AS (
    SELECT s.node, {tele} + CAST(0.85 AS DOUBLE) * s.sm AS r
    FROM (SELECT ed.dst AS node,
                 CAST(CAST(sum(CAST(round(rr.r / ed.d, 9) AS DECIMAL(12,9)))
                           AS VARCHAR) AS DOUBLE) AS sm
          FROM ed JOIN r{t - 1} rr ON ed.src = rr.node GROUP BY 1) s{tail})""")
    return ",\n  ".join(parts)


# ---------------------------------------------------------------------------
# faithful reference surface (SURVEY.md section 2a)
# ---------------------------------------------------------------------------

def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1..O9: the reference's entire job as one declarative plan."""
    return word_count(corpus_from_documents(spark, sf_dir))


def q_wordcount_topn(spark: SparkSession, sf_dir: str, n: int = 100) -> DataFrame:
    """O11: top-N report with deterministic tie-break."""
    return top_k(q_wordcount(spark, sf_dir), n)


# checked-in newline-delimited fixture (airline-tweet flavored, like
# the reference's corpus); absolute path so the oracle SQL can read
# the identical bytes
_CORPUS_TXT = __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))),
    "tests", "fixtures", "corpus.txt",
)


def q_wordcount_textfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 exercised end-to-end from a real text FILE, the way the
    reference reads /Assignment5/input.txt (greeter_client.cc:298-314):
    spark.read.text -> normalize -> tokenize -> count. The file-scan
    path (byte-range splits per executor, never a master-side string)
    rather than the parquet documents table the other wordcounts use.
    sf_dir is ignored: the source is the checked-in fixture corpus."""
    return word_count(read_text_corpus(spark, _CORPUS_TXT))


def q_wordcount_rdd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BASELINE 'RDD API' surface: flatMap -> map -> reduceByKey."""
    return word_count_rdd(corpus_from_documents(spark, sf_dir))


def q_wordcount_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same plan through the SQL front end (Catalyst output identical
    to the DataFrame form -- the engine is API-agnostic)."""
    return word_count_sql(spark, corpus_from_documents(spark, sf_dir))


def q_pricing_summary_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary via spark.sql over registered catalog views --
    a user can drive this engine with nothing but SQL strings."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
          CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS sum_qty,
          CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS sum_base_price,
          CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS STRING) AS DOUBLE) AS sum_disc_price,
          CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
                        * (CAST(1 AS DECIMAL(8,4)) + CAST(l_tax AS DECIMAL(8,4)))) AS STRING) AS DOUBLE) AS sum_charge,
          round(CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS STRING) AS DOUBLE) / count(*), 6) AS avg_qty,
          round(CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS STRING) AS DOUBLE) / count(*), 6) AS avg_disc,
          count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """)


def q_wordcount_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew path: two-stage salted aggregation, identical result."""
    return word_count_salted(corpus_from_documents(spark, sf_dir))


def q_doc_idf_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient shuffle JOIN (the join-side complement of
    wordcount_salted's salted aggregation): every token row joins the
    corpus-derived idf vocabulary on the word -- a Zipf-hot key per
    hot word -- through operators/skewjoin.salted_join, which spreads
    each hot word over 16 salt partitions and replicates the vocab
    side 16x. The oracle is the NAIVE SQL join, so the driver's hash
    match proves salting changes partitioning only, never results.
    Measured straggler evidence: tools/skew_probe.py -> SCALING.md."""
    from .operators.skewjoin import doc_idf_sum

    return doc_idf_sum(load_table(spark, sf_dir, "documents"))


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_top_terms(load_table(spark, sf_dir, "documents"))


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 line count generalized: corpus-level totals in one pass."""
    docs = corpus_from_documents(spark, sf_dir)
    words = tokenize(docs.select(normalized_col("line").alias("norm")), "norm")
    return words.agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("word").alias("n_distinct_words"),
    ).crossJoin(docs.agg(F.count("*").alias("n_lines")))


def q_map_task_stats(spark: SparkSession, sf_dir: str, num_tasks: int = 4) -> DataFrame:
    """O4 observable surface: per-task (word,count) rollup mirroring
    the reference's MapOutputTask<N>.txt intermediates
    (greeter_server.cc:81-86), with deterministic doc_id%4 task
    assignment standing in for the contiguous split."""
    docs = corpus_from_documents(spark, sf_dir)
    words = tokenize(
        docs.select(task_id_col(F.col("doc_id"), num_tasks).alias("task_id"),
                    normalized_col("line").alias("norm")),
        "norm",
        keep=["task_id"],
    )
    return words.groupBy("task_id").agg(
        F.countDistinct("word").alias("n_distinct_words"),
        F.count("*").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# text analysis (extension surface, SURVEY.md section 2b)
# ---------------------------------------------------------------------------

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_token_array(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", *text_stats_cols("text", toks=F.col("toks")))


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_token_array(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id", quality_score_col("text", toks=F.col("toks")).alias("quality")
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_token_array(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", "lang", *lang_score_cols("text", toks=F.col("toks")))


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_token_array(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_ws_tokens"),
        bpe_like_token_count_col("text", toks=F.col("toks")).alias("n_bpe_tokens"),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", *doc_fingerprint_cols("text"))


# ---------------------------------------------------------------------------
# training-data shaping (chunking / packing / vocab)
# ---------------------------------------------------------------------------

def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase inverted index (3-token shingles, df in [2, 20]): the
    search-side generalization of word count -- phrase -> document
    frequency + sorted posting list (comma-joined so the gate can
    hash it). Posting rows are bounded by max_df, so no reducer row
    can blow up on a boilerplate phrase."""
    from .functions.indexing import inverted_index

    return inverted_index(load_table(spark, sf_dir, "documents"))


def q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocations over adjacent-token bigrams (count >= 5):
    phrase mining for corpus analysis. Vocab-sized joins only; the
    corpus-sized work is the two token aggregations."""
    from .functions.indexing import bigram_pmi

    return bigram_pmi(load_table(spark, sf_dir, "documents"))


def q_top_terms_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 most frequent terms per language: per-group top-k over
    the post-aggregation (lang, word) table with deterministic
    tie-breaks -- never a global sort."""
    from .functions.indexing import top_terms_per_group

    return top_terms_per_group(load_table(spark, sf_dir, "documents"))


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding token-window chunking (32-token windows, stride 24)."""
    from .operators.chunking import doc_chunks

    return doc_chunks(load_table(spark, sf_dir, "documents"))


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard sequential sequence packing into 256-token blocks."""
    from .operators.chunking import pack_sequences

    return pack_sequences(load_table(spark, sf_dir, "documents"))


def q_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 corpus bigrams (all occurrences, not per-doc distinct):
    the n-gram LM statistics pass. Uses the shuffle-free flat shingle
    builder -- the aggregation keys on the gram itself, so the
    window variant's doc_id Exchange would be pure overhead."""
    from .operators.dedup import shingle_rows_flat

    grams = shingle_rows_flat(load_table(spark, sf_dir, "documents"), k=2)
    return (
        grams.groupBy(F.col("sh").alias("gram"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(100)
    )


def q_vocab_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary construction: words with count >= 5, ranked into
    contiguous ids by (cnt desc, word asc). The global window runs
    over the POST-AGGREGATION table (vocab size, not corpus size) --
    the single-partition rank of a small aggregate, same shape as
    top-N."""
    from pyspark.sql import Window

    wc = word_count(corpus_from_documents(spark, sf_dir)).filter(F.col("cnt") >= 5)
    w = Window.orderBy(F.desc("cnt"), F.asc("word"))
    return wc.select(
        "word", "cnt", F.row_number().over(w).cast("long").alias("vocab_id")
    )


def q_vocab_ids_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vocab_ids without the unpartitioned rank window: exact ids
    from operators/ranking.with_global_row_number (two-level bucketed
    ranking -- no single-partition exchange over the vocab), for
    vocabularies too large for a one-task sort. Shares vocab_ids'
    oracle: the hash match proves the decomposition exact."""
    from .operators.ranking import with_global_row_number

    wc = word_count(corpus_from_documents(spark, sf_dir)).filter(F.col("cnt") >= 5)
    ranked = with_global_row_number(
        wc, "cnt", tiebreaks=[F.asc("word")], ascending=False, out_col="vocab_id"
    )
    return ranked.select("word", "cnt", F.col("vocab_id").cast("long").alias("vocab_id"))


def q_training_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic global shuffle of the training corpus --
    the epoch-ordering primitive of every pretraining run: each doc's
    position is its exact global rank under a keyed portable hash
    (seed in the hash input; change the seed string, get an
    independent permutation). Composed from existing machinery:
    portable_hash32 (32-bit, so the rank key is double-exact) +
    operators/ranking.with_global_row_number -- NO single-partition
    sort over the corpus; the oracle's naive row_number() OVER
    (ORDER BY hash) proves the two-level decomposition exact.
    At 100 TB the positions feed a range-partitioned write, giving
    shuffled shards without any global sort task."""
    from .operators.dedup import portable_hash32
    from .operators.ranking import with_global_row_number

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    hashed = docs.withColumn(
        "hk",
        portable_hash32(F.concat(F.lit("shuf1:"), F.col("doc_id").cast("string"))),
    )
    ranked = with_global_row_number(
        hashed, "hk", tiebreaks=[F.asc("doc_id")], out_col="position"
    )
    return ranked.select(
        "doc_id", "hk", F.col("position").cast("long").alias("position")
    )


BPE_MERGES = 4


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str, topn: int = 50) -> DataFrame:
    """The BPE-trainer kernel: adjacent-symbol pair frequencies over
    the word-frequency table (corpus scanned once; the pair stage runs
    on |vocab| rows). Top-N with deterministic tie-break."""
    from .operators import bpe

    vocab = bpe.word_freqs(spark, sf_dir).select(
        bpe.symbolized(F.col("w")).alias("ws"), "c"
    )
    return (
        bpe.pair_counts(vocab)
        .orderBy(F.desc("pair_freq"), "left", "right")
        .limit(topn)
    )


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE training (Sennrich et al. 2016): BPE_MERGES
    greedy merge rounds; each round re-counts pairs over the merged
    vocab and picks the max (1-row collect, k-means driver-loop
    pattern). Oracle: the rounds unrolled in SQL (_bpe_ctes)."""
    from .operators import bpe

    merges, _ = bpe.bpe_train(spark, sf_dir, num_merges=BPE_MERGES)
    return spark.createDataFrame(
        merges, "rank long, left string, right string, merged string, pair_freq long"
    ).orderBy("rank")


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained merges to every document: per-doc real BPE
    token count next to the whitespace count. The k learned merges are
    literal replace() calls -- encode is MAP-ONLY over the corpus."""
    from .functions.text_stats import with_token_array
    from .operators import bpe

    merges = bpe.trained_merges(spark, sf_dir, num_merges=BPE_MERGES)
    docs = with_token_array(load_table(spark, sf_dir, "documents"))
    n_bpe = F.aggregate(
        F.transform(F.col("toks"), lambda w: bpe.encoded_len_col(w, merges)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long"),
    )
    return docs.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# curation / filtering (decontamination, quality, PII, mixing)
# ---------------------------------------------------------------------------

def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs (doc_id % 20 != 0)
    sharing any 6-gram with the held-out eval slice (doc_id % 20 == 0),
    with the distinct shared-n-gram count. Eval n-gram set broadcast;
    corpus side never shuffles before the match."""
    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 20 == 0)
    train_docs = docs.filter(F.col("doc_id") % 20 != 0)
    return decontaminate(train_docs, eval_docs)


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-sketch frequency estimates for the top-20 corpus
    words, next to the truth (operators/cms.py): est >= true always
    -- the one-sided CMS guarantee, test-pinned; the oracle checks
    the approximate path itself."""
    from .operators.cms import cms_heavy_hitters

    return cms_heavy_hitters(word_count(corpus_from_documents(spark, sf_dir)))


def q_cms_screened_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase sketch-screened exact heavy hitters: a map-side CMS
    pass finds candidate words (threshold = token total div 500,
    read off the sketch itself), and only candidate occurrences ever
    shuffle on the word key -- the 100 TB replacement for a
    full-vocabulary groupBy when only frequent words matter. CMS
    one-sidedness guarantees zero false negatives; false positives
    appear as confirmed=false rows (operators/cms.py)."""
    from .operators.cms import cms_screened_wordcount

    corpus = corpus_from_documents(spark, sf_dir)
    tokens = tokenize(corpus.select(normalized_col("line").alias("norm")), "norm")
    return cms_screened_wordcount(tokens)


def q_kmv_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-operation sketch: estimate the overlap between
    purchasing users (events) and BUILDING-segment customer keys
    (customer) from two 256-row k-min-value summaries
    (operators/kmv.py -- HLL can count but not intersect; KMV
    sketches compose), with the exact intersection and relative
    error alongside. A CROSS-TABLE set intersection with a
    non-trivial Jaccard, and both estimator branches exercised
    across SFs: below 256 union values the sketch IS the set
    (exact), above it the (k-1)*2^60/h_k estimator engages."""
    from .operators.kmv import kmv_intersection_report

    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    return kmv_intersection_report(a, b, F.col("user_id"), F.col("c_custkey"))


def q_bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter pattern, built manually and proven exact:
    revenue of lineitems belonging to URGENT orders of
    BUILDING-segment customers. The qualifying orderkey set (~4% of
    orders) is compacted to a 2^17-bit Bloom bitmap (4096 rows,
    broadcast); the lineitem side probes it MAP-SIDE
    (operators/bloom.bloom_prune) so only survivors -- members plus
    ~0.4% false positives -- enter the exact semi join's shuffle. At
    100 TB this is the difference between shuffling every lineitem
    and shuffling the selected few; the oracle is the PLAIN semi-join
    SQL, so the hash match proves the pruned plan drops nothing and
    the exact join cleans every false positive."""
    from .operators.bloom import bloom_bitmap, bloom_prune

    orders = load_table(spark, sf_dir, "orders")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    keys = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .join(cust, "o_custkey", "left_semi")
        .select("o_orderkey")
        .transform(materialize)  # bitmap build + exact join share it
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    bitmap = bloom_bitmap(keys.select(F.col("o_orderkey").cast("string").alias("sh")))
    survivors = bloom_prune(li, F.col("l_orderkey").cast("string"), bitmap)
    exact = survivors.join(
        keys, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
    )
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(8,4)") - F.col("l_discount").cast("decimal(8,4)")
    )
    return exact.agg(
        analytics._dec2dbl(F.sum(revenue)).alias("revenue"),
        F.count("*").alias("n_items"),
    )


def q_hll_users_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog distinct-user estimate per event type,
    reported NEXT TO the exact count with the relative error -- the
    oracle-checkable twin of approx_distinct_users (whose Spark-
    internal HLL++ hash makes it rows-only by necessity). See
    operators/hll.py for the exact-integer register-sum design."""
    from .operators.hll import hll_estimate

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    est = hll_estimate(ev, "event_type", "user_id")
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "est_distinct",
        "exact_distinct",
        F.round(
            (F.col("est_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            6,
        ).alias("rel_err"),
    )


def q_hll_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style sketch rollup: ONE pass over events builds a
    per-(event_type, day) HLL register table -- the stored fine-grain
    continuous aggregate -- and every coarser grain (per event_type,
    grand total) derives from that table by reg-wise max alone,
    never re-reading raw rows. max is associative/commutative, so the
    merged registers are bit-identical to a direct sketch (pinned by
    the mergeability test); this is the layout a 1000-executor
    daily-rollup pipeline stores and serves. Output: [grain, gkey,
    est_distinct, exact_distinct, rel_err] -- estimate quality
    measured, not asserted."""
    from .operators.hll import (
        estimate_from_registers,
        hll_registers,
        merge_registers,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("d"), "user_id"
    )
    day_regs = materialize(hll_registers(ev, ["event_type", "d"], "user_id"))
    t_est = estimate_from_registers(
        merge_registers(day_regs, ["event_type"]), ["event_type"]
    ).select(
        F.lit("event_type").alias("grain"),
        F.col("event_type").alias("gkey"),
        "est_distinct",
    )
    a_est = estimate_from_registers(merge_registers(day_regs, []), []).select(
        F.lit("total").alias("grain"), F.lit("*").alias("gkey"), "est_distinct"
    )
    exact = (
        ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact_distinct"))
        .select(F.col("event_type").alias("gkey"), "exact_distinct")
        .unionByName(
            ev.agg(F.count_distinct("user_id").alias("exact_distinct")).select(
                F.lit("*").alias("gkey"), "exact_distinct"
            )
        )
    )
    return (
        t_est.unionByName(a_est)
        .join(exact, "gkey")
        .select(
            "grain",
            "gkey",
            "est_distinct",
            "exact_distinct",
            F.round(
                (F.col("est_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                6,
            ).alias("rel_err"),
        )
        .orderBy("grain", "gkey")
    )


def q_copurchase_butterflies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite butterfly support among BUILDING-segment customers:
    top pairs by shared suppliers (see operators/graph_motifs.py for
    the wedge-join algorithm and the degree/segment scale knobs).
    Exact within the segment (max_degree=None) so the naive
    all-pairs oracle hash-checks the wedge join; the segment scope
    is what keeps the synthetic graph's ~4%-dense supplier degrees
    (measured: full exact = ~170 M wedges at sf0.1) out of the
    per-round gates."""
    from .operators.graph_motifs import copurchase_butterflies

    return copurchase_butterflies(spark, sf_dir, segment=PPR_SEGMENT)


def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination audit (operators/bloom.py): the
    2^17-bit portable bloom probe vs the exact n-gram match, as a
    confusion matrix. The (bloom=false, exact=true) cell is
    structurally impossible (no false negatives); (true, false) is
    the measured FP rate the exact re-check cleans up."""
    from .operators.bloom import bloom_decontaminate_audit

    docs = load_table(spark, sf_dir, "documents")
    return bloom_decontaminate_audit(
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
    )


def q_eval_overlap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-side leakage report: per held-out doc (doc_id % 20 == 0),
    its distinct 6-grams, how many the train slice contains anywhere,
    and the leaked fraction. Corpus side never shuffles (broadcast
    probe -> tiny hit set -> broadcast back)."""
    docs = load_table(spark, sf_dir, "documents")
    return eval_overlap_report(
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
    )


def q_fuzzy_word_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymSpell-banded fuzzy vocabulary match: every word pair within
    Levenshtein distance 2, found via deletion-neighborhood buckets
    (keyed join, never all-pairs) + exact-distance filter. The oracle
    is the NAIVE all-pairs SQL, so hash parity proves the banding
    loses no pair."""
    from .operators import bpe
    from .operators.fuzzy import fuzzy_word_pairs

    return fuzzy_word_pairs(bpe.word_freqs(spark, sf_dir))


def q_bpe_compression_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-parity report: chars-per-BPE-token by language. The
    fairness metric tokenizer owners publish (a language with a much
    higher ratio is under-served by the learned merges and pays more
    tokens for the same text). Composes the trained encode with a
    one-shuffle rollup; the ratio is a division of two exact counts,
    so it is bit-identical cross-engine."""
    from .functions.text_stats import with_token_array
    from .operators import bpe

    merges = bpe.trained_merges(spark, sf_dir, num_merges=BPE_MERGES)
    docs = with_token_array(load_table(spark, sf_dir, "documents"))
    n_bpe = F.aggregate(
        F.transform(F.col("toks"), lambda w: bpe.encoded_len_col(w, merges)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long"),
    )
    n_chars = F.aggregate(
        F.transform(F.col("toks"), lambda w: F.length(w)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long"),
    )
    per_doc = docs.select("lang", n_bpe.alias("nb"), n_chars.alias("nc"))
    return (
        per_doc.groupBy("lang")
        .agg(
            F.sum("nc").alias("total_chars"),
            F.sum("nb").alias("total_bpe_tokens"),
        )
        .select(
            "lang",
            "total_chars",
            "total_bpe_tokens",
            F.round(
                F.col("total_chars").cast("double")
                / F.col("total_bpe_tokens").cast("double"),
                6,
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


def q_pack_sequences_bpe(spark: SparkSession, sf_dir: str, budget: int = 256) -> DataFrame:
    """Sequence packing by the TRAINED tokenizer's real token counts
    (train BPE -> measure each doc -> lay head-to-tail into
    budget-token blocks) -- the packing a training job actually does,
    vs pack_sequences' length heuristic. Same scale-safe per-shard
    window; the count column is the map-only encode."""
    from pyspark.sql import Window

    from .functions.text_stats import with_token_array
    from .operators import bpe

    merges = bpe.trained_merges(spark, sf_dir, num_merges=BPE_MERGES)
    docs = with_token_array(load_table(spark, sf_dir, "documents"))
    n_bpe = F.aggregate(
        F.transform(F.col("toks"), lambda w: bpe.encoded_len_col(w, merges)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long"),
    )
    base = docs.select("doc_id", "source", n_bpe.alias("n_tokens"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return base.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(prefix / budget).cast("long").alias("bin_id"),
        (prefix % budget).cast("long").alias("offset"),
    )


BM25_QUERY = ("spark", "join", "fast")


def _eq_lit(t: str):
    """Single-arg HOF lambda factory: a two-parameter lambda would be
    treated by PySpark as an (element, index) function."""
    return lambda x: x == F.lit(t)


def q_bm25_topk(spark: SparkSession, sf_dir: str, k1: float = 1.2,
                b: float = 0.75, topn: int = 50) -> DataFrame:
    """Lexical retrieval: Okapi BM25 top-k for a fixed query -- the
    sparse complement of the ANN dense-retrieval suite (hybrid search
    runs both and fuses). Plan: one corpus pass computes per-doc term
    frequencies and length from the materialized token array; the
    collection statistics (N, per-term df, avg doc length) are ONE
    tiny aggregate broadcast back (scalar-subquery pattern), so there
    is no shuffle proportional to the corpus beyond the single stats
    aggregate; top-k is TakeOrderedAndProject.

    Cross-engine exactness: idf = ln((N - df + 0.5)/(df + 0.5) + 1)
    is rounded to 9dp (the lm_score ln recipe); every other factor is
    arithmetic on identical doubles; contributions are summed as a
    FIXED-ORDER expression chain (query terms are literals), not an
    aggregation, so no reassociation can occur; final score rounds
    to 6dp."""
    from .functions.text_stats import with_token_array

    docs = with_token_array(load_table(spark, sf_dir, "documents"))
    toks = F.col("toks")
    per_doc = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        *[
            F.size(F.filter(toks, _eq_lit(t))).cast("long").alias(f"tf_{i}")
            for i, t in enumerate(BM25_QUERY)
        ],
    )
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(BM25_QUERY))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    n = F.col("n_docs").cast("double")
    avgdl = F.col("sum_dl").cast("double") / n
    score = F.lit(0.0)
    for i in range(len(BM25_QUERY)):
        df_ = F.col(f"df_{i}").cast("double")
        idf = F.round(F.log((n - df_ + 0.5) / (df_ + 0.5) + 1.0), 9)
        tf = F.col(f"tf_{i}").cast("double")
        denom = tf + k1 * (1.0 - b + b * F.col("dl").cast("double") / avgdl)
        score = score + idf * (tf * (k1 + 1.0)) / denom
    return (
        scored.select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(topn)
    )


def q_prf_rerank(spark: SparkSession, sf_dir: str, n_feedback: int = 10,
                 topn: int = 20) -> DataFrame:
    """Pseudo-relevance-feedback rerank (Rocchio-style): BM25
    retrieves 50 candidates; the top n_feedback docs' embedding
    CENTROID becomes the dense pseudo-query; candidates re-rank by
    cosine to it -- the classic sparse-retrieve -> dense-rerank
    composition (the other fusion besides hybrid_rrf_topk's rank
    fusion).

    Scale: the candidate list is 50 rows (lazily checkpointed so the
    corpus-wide BM25 pass runs once, not once per consumer); the
    centroid is a 64-row decimal-exact aggregate of 10 vectors folded
    to a 1-row array and broadcast; the rerank window orders 50 rows.
    Nothing corpus-sized shuffles beyond BM25's own stats aggregate.

    Exactness: centroid dims use the label_centroids recipe
    (DECIMAL(27,12) sums -> string-route -> /n -> round 6); cosine is
    the element-order fold that is bit-identical to DuckDB's
    list_cosine_similarity (functions/vectors.py)."""
    from pyspark.sql import Window

    from .functions.vectors import dot_col, l2_norm_col

    cand = materialize(q_bm25_topk(spark, sf_dir))
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    fb = cand.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(n_feedback)
    dims = (
        fb.join(emb, "doc_id")
        .select(F.posexplode("embedding").alias("pos", "v"))
        .groupBy("pos")
        .agg(
            F.round(
                F.sum(F.col("v").cast("decimal(27,12)")).cast("string").cast("double")
                / F.count("*"),
                6,
            ).alias("c")
        )
    )
    cvec = dims.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda x: x["c"]
        ).alias("cvec")
    )
    scored = (
        cand.join(emb, "doc_id")
        .crossJoin(F.broadcast(cvec))
        .select(
            "doc_id",
            "bm25",
            F.round(
                dot_col("embedding", "cvec")
                / (l2_norm_col("embedding") * l2_norm_col("cvec")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.orderBy(F.desc("cosine"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topn)
    )


PAGERANK_ITERS = 3
PPR_SEGMENT = "BUILDING"


def q_segment_affinity_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank: teleport mass on one market segment's
    customers; the top-50 SUPPLIER nodes by resulting rank are the
    suppliers most proximate to that segment in the purchase graph --
    graph-walk recommendation, oracle-exact (unrolled CTEs with a
    seeded teleport)."""
    from .operators.pagerank import personalized_pagerank

    cust = load_table(spark, sf_dir, "customer")
    seeds = cust.filter(F.col("c_mktsegment") == PPR_SEGMENT).select(
        F.concat(F.lit("c"), F.col("c_custkey")).alias("node")
    )
    r = personalized_pagerank(spark, sf_dir, seeds, iters=PAGERANK_ITERS)
    return (
        r.filter(F.col("node").startswith("s"))
        .orderBy(F.desc("r"), F.asc("node"))
        .limit(50)
        .select("node", F.round("r", 6).alias("rank"))
    )



def q_purchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (3 power iterations) over the customer-supplier
    purchase graph; top-100 authority report with deterministic
    tie-break. No driver collects: the whole loop is one fixed-depth
    lazy plan (see operators/pagerank.py for the scale notes)."""
    from .operators.pagerank import pagerank

    r = pagerank(spark, sf_dir, iters=PAGERANK_ITERS)
    return (
        r.orderBy(F.desc("r"), F.asc("node"))
        .limit(100)
        .select("node", F.round("r", 6).alias("rank"))
    )


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics (top-token / top-bigram
    fraction, longest same-token run) per document."""
    return repetition_stats(load_table(spark, sf_dir, "documents"))


def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mT5-style temperature (alpha=0.5) language rebalancing with
    content-hash membership -- exact cross-engine kept set."""
    from .operators.curation import temperature_sample

    return temperature_sample(load_table(spark, sf_dir, "documents"))


def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate spans (Lee et al. ACL 2022 shape):
    maximal per-doc token intervals covered by corpus-repeated
    8-gram windows."""
    from .operators.curation import duplicate_spans

    return duplicate_spans(load_table(spark, sf_dir, "documents"))


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: typed placeholder substitution with
    per-type counts. The synthetic corpus is PII-free, so this is an
    identity pass here (counts 0) -- the crafted-fixture tests in
    tests/test_curation.py exercise the actual redaction; the oracle
    proves both engines run the identical regex pipeline."""
    return pii_redact(load_table(spark, sf_dir, "documents"))


def q_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture: fill each language's 3000-token budget
    greedily with its highest-quality docs (per-group audit rows);
    the rate-based complements are mixture_sample/temperature_sample.
    Integer cumulative window over a 6dp-rounded quality key -> the
    exact kept set is oracle-checked."""
    from .operators.curation import token_budget_mixture

    return token_budget_mixture(load_table(spark, sf_dir, "documents"))


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-balanced sampling: down-sample each language to the
    smallest language's size via deterministic content hashing."""
    return mixture_sample(load_table(spark, sf_dir, "documents"))


def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-shard manifest for a sharded training-data export:
    per-shard doc/token totals and doc_id bounds."""
    return shard_manifest(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------

def q_documents_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash sampling (~1/8 of docs): the
    reproducible train/test-split primitive -- membership depends only
    on content, never on partitioning, ordering, or RNG state."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(normalized_col("text")), 1, 1)
    return docs.filter(bucket.isin("0", "1")).select("doc_id", "lang", "source")


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load_table(spark, sf_dir, "documents"))


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked exact dedup (operators/dedup.keep_best_dedup):
    among exact duplicates keep the cleanest raw copy, not the
    smallest id -- one digest-keyed window shuffle."""
    from .operators.dedup import keep_best_dedup

    return keep_best_dedup(load_table(spark, sf_dir, "documents"))


def q_events_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.events_unpivot(spark, sf_dir)


def q_weighted_doc_sample(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Deterministic weighted sampling without replacement, per
    stratum (Efraimidis-Spirakis A-ES): each doc draws u from a
    CONTENT-FREE hash of its id (portable md5 -> (0,1)), gets key =
    ln(u)/quality, and the top-k keys per lang are the sample --
    inclusion probability proportional to the quality weight, fully
    reproducible (no RNG state, same sample in any engine or rerun).
    The quality-weighted step up from stratified_sample's uniform
    slices: the curation move 'keep k docs per language, preferring
    clean ones'.

    Exactness: u is exact integer arithmetic; ln runs JVM-side and is
    rounded to 9dp before the /quality division (the BM25-idf
    recipe); zero-quality docs are filtered (their key would be
    -inf). Scale: per-doc map work + one top-k window per lang
    partition."""
    from pyspark.sql import Window

    from .functions.text_stats import quality_score_col, with_token_array
    from .operators.dedup import portable_hash32

    docs = with_token_array(load_table(spark, sf_dir, "documents"))
    u = (portable_hash32(F.col("doc_id").cast("string")) + 1).cast("double") / F.lit(
        float(2**32 + 1)
    )
    scored = docs.select(
        "doc_id",
        "lang",
        quality_score_col("text", toks=F.col("toks")).alias("quality"),
        F.round(F.log(u), 9).alias("lnu"),
    ).filter(F.col("quality") > 0)
    key = F.col("lnu") / F.col("quality")
    w = Window.partitionBy("lang").orderBy(F.desc(key), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "lang", "quality", "rank")
    )


def q_events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (the Deequ-style data-quality report): per
    column, row count, null count, and EXACT distinct count -- the
    first thing a pipeline owner asks of a new 100 TB drop. One
    single-column pruned scan + partial-agg'd aggregate per column
    (a single multi-countDistinct aggregate would plan an Expand
    replay of the scan per column -- measured 1.9x slower on the
    waiting_suppliers shape); the approx companion for trillion-row
    tables is approx_distinct_users' HLL path."""
    from functools import reduce

    ev = load_table(spark, sf_dir, "events")
    parts = [
        ev.select(F.col(c)).agg(
            F.lit(c).alias("column"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
            F.countDistinct(c).alias("n_distinct"),
        )
        for c in ("event_id", "ts", "user_id", "event_type", "value", "props")
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def q_user_activity_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.user_activity_decay(spark, sf_dir)


def q_user_activity_decay_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.user_activity_decay_fold(spark, sf_dir)


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))


def q_jaccard_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity join at Jaccard >= 0.8 via lossless
    prefix filtering (operators/setjoin.py); oracle is the naive
    all-pairs SQL, so the hash match proves completeness."""
    from .operators.setjoin import jaccard_prefix_pairs

    return jaccard_prefix_pairs(load_table(spark, sf_dir, "documents"))


def q_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_near_dup_pairs(load_table(spark, sf_dir, "documents"))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative connected components over the MinHash near-dup
    graph. max_iter=20 so min-label propagation provably reaches the
    transitive closure the DuckDB recursive-CTE oracle computes even
    on long chain components (early exit keeps extra rounds free).
    EAGER: propagation rounds run at DataFrame-construction time."""
    return dedup_clusters(load_table(spark, sf_dir, "documents"), max_iter=20)


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val split: membership is decided per
    NEAR-DUP CLUSTER, not per document, so two near-duplicates can
    never straddle the split and leak training text into validation
    (the published split-hygiene rule behind benchmark-decontamination
    practice). Singletons form their own cluster (cluster = doc_id);
    the split is a content-free hash of the cluster id -- deterministic
    under any partitioning. ~1/16 of clusters go to val.
    EAGER: cluster propagation runs at build time."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    clusters = dedup_clusters(
        load_table(spark, sf_dir, "documents"), max_iter=20
    ).select("doc_id", F.col("cluster").alias("cl"))
    assigned = docs.join(clusters, "doc_id", "left").select(
        "doc_id", F.coalesce(F.col("cl"), F.col("doc_id")).alias("cluster")
    )
    bucket = F.substring(F.md5(F.col("cluster").cast("string")), 1, 1)
    return assigned.select(
        "doc_id",
        "cluster",
        F.when(bucket == "0", F.lit("val")).otherwise(F.lit("train")).alias("split"),
    )


def q_dedup_clusters_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the EXACT ngram-Jaccard pair graph:
    the same iterative min-label propagation as dedup_clusters, but
    with SQL-reproducible edges -- so the whole iterative algorithm
    is oracle-checked (DuckDB recursive CTE computes the identical
    transitive min-label closure). EAGER: propagation rounds run at
    DataFrame-construction time."""
    pairs = ngram_jaccard_pairs(load_table(spark, sf_dir, "documents")).select(
        "doc_a", "doc_b"
    )
    return label_propagation(pairs, max_iter=20)


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: treat doc_id % 10 == 0 as today's
    new batch and the rest as the existing corpus; return the novel
    new docs (content fingerprint unseen in the corpus). Anti-join
    keyed on the md5 digest -- uniform, skew-free; corpus side
    reduced to distinct fingerprints before the join."""
    from .operators.incremental import incremental_dedup_exact

    docs = load_table(spark, sf_dir, "documents")
    new_docs = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    return incremental_dedup_exact(new_docs, corpus)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_fp(load_table(spark, sf_dir, "documents"))


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming <= 8 of 60 bits: close fingerprints only (16+ admits
    vocabulary-level noise on this small-vocab corpus). Recall is
    FULL at this threshold: the banding adapts to max_hamming
    (9 blocks for d<=8, pigeonhole) -- so the banded result equals
    the brute-force all-pairs oracle exactly."""
    return simhash_near_dup_pairs(load_table(spark, sf_dir, "documents"), max_hamming=8)


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


def q_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative Lloyd's k-means cell assignment. Oracle-checked:
    exact decimal-sum means make every round deterministic, and the
    DuckDB oracle unrolls the identical iterations. EAGER: Lloyd
    rounds run at DataFrame-construction time."""
    from .operators.kmeans import kmeans_cells

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

    from .functions.text_stats import with_token_array

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
    from .operators.kmeans import kmeans_cells

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
    from .operators.mmr import mmr_select

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
    but deterministic -- the LCG planes are embedded in the oracle, so
    even the approximate path hash-checks)."""
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
    from .operators.quantization import pq_codes

    pq = pq_codes(load_table(spark, sf_dir, "embeddings"))
    return pq.select(
        "vec_id",
        *[F.col("codes")[j].alias(f"c{j}") for j in range(4)],
        "recon_err",
    )


def q_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-5 neighbors from the PQ codes alone (the compressed-
    domain ANN scan). EAGER: trains the codebooks first."""
    from .operators.quantization import pq_adc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_adc_topk(emb, _query_vectors(spark, sf_dir), topk=5)


def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: coarse k-means cells bound the scan, PQ codes
    compress it -- the standard billion-scale ANN layout, fully
    oracle-checked. EAGER: trains coarse + subspace codebooks."""
    from .operators.quantization import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_topk(emb, _query_vectors(spark, sf_dir), topk=5)


def q_ann_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC proper: PQ codebooks trained on coarse-cell residuals
    (tighter codes at the same bit budget). EAGER: trains coarse +
    residual subspace codebooks."""
    from .operators.quantization import ivfpq_residual_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_residual_topk(emb, _query_vectors(spark, sf_dir), topk=5)


def q_nb_lang_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained multinomial Naive Bayes language classifier: two
    training aggregations, broadcast model table, decimal-exact
    log-score accumulation, deterministic argmax."""
    from .operators.nb_classify import nb_lang_scores

    return nb_lang_scores(load_table(spark, sf_dir, "documents"))


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: target-vs-raw unigram log-likelihood
    ratio per raw-pool doc (two vocab-sized training aggregations,
    decimal-exact accumulation; data-selection surface)."""
    from .operators.dsir import dsir_weights

    return dsir_weights(load_table(spark, sf_dir, "documents"))


def q_select_pretraining_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed data-selection pipeline: exact dedup -> DSIR
    importance threshold (>= 0: at least as target-like as the raw
    average) -> temperature rebalancing over the selected pool."""
    from .plans.pipeline import select_pretraining_corpus

    return select_pretraining_corpus(spark, sf_dir)


def q_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation loop: confusion matrix of the NB
    prediction vs the labeled lang (count per (lang, pred_lang))."""
    from .operators.nb_classify import nb_lang_scores

    return (
        nb_lang_scores(load_table(spark, sf_dir, "documents"))
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: k-means cells bound the pair
    scan; within a cell, a vector with a smaller-id neighbor at
    cosine >= 0.35 is marked keep=false. EAGER: trains the cells."""
    from .operators.similarity import semantic_dedup

    return semantic_dedup(load_table(spark, sf_dir, "embeddings"), min_cosine=0.35)


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------

def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payload = with_binary_payload(docs)
    return payload.select(
        "doc_id",
        F.col("meta.modality").alias("modality"),
        F.col("meta.n_bytes").cast("long").alias("n_bytes"),
        F.col("meta.content_sha256").alias("content_sha256"),
    )


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched stub decode via mapInPandas, projected to scalar
    feature columns for the gate: the deterministic fake decode is
    plain byte arithmetic, so each feature component gets its own
    double column (f_len, f_first, f_last, f_sum_mod) AND a DuckDB
    oracle recomputing the same bytes from hex(encode(text)).
    `decode_features` itself still returns array<double>."""
    docs = load_table(spark, sf_dir, "documents")
    feat = decode_features(with_binary_payload(docs))
    return feat.select(
        "doc_id",
        "modality",
        "n_bytes",
        F.col("feature")[0].alias("f_len"),
        F.col("feature")[1].alias("f_first"),
        F.col("feature")[2].alias("f_last"),
        F.col("feature")[3].alias("f_sum_mod"),
    )


def q_multimodal_phash_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup shape: quantize the decoded
    feature vector into fixed-threshold bits, pack a tiny pHash, and
    group identical hashes (keep the min doc_id) -- the bucketed
    near-dup-image recipe over the Arrow decode path. Real pHash
    (DCT of pixels) drops into the same plumbing when a codec is
    present; the deterministic stub keeps it oracle-checkable."""
    docs = load_table(spark, sf_dir, "documents")
    feat = decode_features(with_binary_payload(docs))

    def bit(idx: int, thresh: float, weight: int):
        return (
            F.when(F.col("feature")[idx] >= thresh, F.lit(weight)).otherwise(F.lit(0))
        )

    phash = (
        bit(0, 300.0, 1) + bit(1, 128.0, 2) + bit(2, 128.0, 4) + bit(3, 498.0, 8)
    ).cast("long")
    return (
        feat.select("doc_id", phash.alias("phash"))
        .groupBy("phash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_docs"))
    )


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (every 4th 16-byte chunk) via mapInPandas --
    the video-frame-sampler shape with the deterministic stand-in
    chunker; fully oracle-checked byte-for-byte from hex(encode)."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(with_binary_payload(docs))


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize shape: stride the byte stream to an 8x8 'thumb'
    via mapInPandas; oracle recomputes the strided hex pairs."""
    docs = load_table(spark, sf_dir, "documents")
    return resize_images(with_binary_payload(docs))


# ---------------------------------------------------------------------------
# relational analytics / events
# ---------------------------------------------------------------------------

q_pricing_summary = analytics.pricing_summary
q_events_rollup = analytics.events_rollup
q_repeat_customers = analytics.repeat_customers
q_distinct_users = analytics.distinct_users_daily
q_approx_distinct_users = analytics.approx_distinct_users
q_orders_monthly = analytics.orders_monthly
q_events_asof_error = analytics.events_asof_last_error
q_events_pivot = analytics.events_pivot_daily
q_customers_without_orders = analytics.customers_without_orders
q_brands_shipped = analytics.brands_shipped
q_events_quantiles = analytics.events_value_quantiles
q_events_trailing_hour = analytics.events_trailing_hour
q_events_type_trend = analytics.events_type_trend
q_revenue_forecast = analytics.revenue_forecast
q_events_cube = analytics.events_cube
q_orders_price_deciles = analytics.orders_price_deciles
q_stratified_sample = analytics.stratified_sample
q_signup_funnel = analytics.signup_purchase_funnel
q_shipping_priority = analytics.shipping_priority
q_late_shipments = analytics.late_shipments
q_events_anomaly_zscore = analytics.events_anomaly_zscore
q_customer_spend_percentiles = analytics.customer_spend_percentiles
q_orders_grouping_sets = analytics.orders_grouping_sets
q_purchase_and_signup_users = analytics.purchase_and_signup_users
q_large_orders = analytics.large_orders
q_order_priority_backlog = analytics.order_priority_backlog
q_returned_items = analytics.returned_items
q_important_parts = analytics.important_parts
q_promo_revenue = analytics.promo_revenue
q_sales_opportunity = analytics.sales_opportunity
q_volume_shipping = analytics.volume_shipping
q_market_share = analytics.market_share
q_large_volume_customers = analytics.large_volume_customers
q_disjunctive_revenue = analytics.disjunctive_revenue
q_customer_distribution = analytics.customer_distribution
q_top_supplier = analytics.top_supplier
q_small_qty_revenue = analytics.small_qty_revenue
q_waiting_suppliers = analytics.waiting_suppliers
q_product_profit = analytics.product_profit
q_supplier_part_counts = analytics.supplier_part_counts
q_dominant_suppliers = analytics.dominant_suppliers
q_purchase_attribution = analytics.purchase_attribution


def q_attribution_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The attribution REPORT: purchases and revenue rolled up by the
    session's first-touch channel -- what a growth team actually
    reads. One extra tiny aggregate over the single-shuffle
    attribution plan; revenue summed as decimal (exact)."""
    att = analytics.purchase_attribution(spark, sf_dir)
    return (
        att.groupBy("first_touch")
        .agg(
            F.count("*").alias("n_purchases"),
            analytics._dec2dbl(
                F.sum(F.col("value").cast("decimal(18,2)"))
            ).alias("total_revenue"),
        )
        .orderBy(F.desc("n_purchases"), "first_touch")
    )



def q_events_asof_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature attach: each event joined (as-of) to the
    per-user stats of the latest fully COMPLETED hour before it --
    the leakage-free feature-store join, via the union+window asof
    operator (one shuffle, no range-join pair blow-up)."""
    from .operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("hour")).agg(
        F.count("*").alias("feat_n"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("string").cast("double"), 6
        ).alias("feat_value"),
    )
    right = hourly.select(
        "user_id",
        (F.col("hour") + F.expr("INTERVAL 1 HOUR")).alias("fts"),
        "feat_n",
        "feat_value",
    )
    left = ev.select("user_id", "ts", "event_id", "event_type")
    joined = asof_join(left, right, by="user_id", left_ts="ts", right_ts="fts")
    return joined.select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "feat_n",
        "feat_value",
    )


def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution range join: every click within 24 h BEFORE a
    purchase by the same user. Bucketed equi-join plan
    (operators/rangejoin.py): time-bucket both sides, shuffle on
    (user, bucket), exact predicate as a post-filter -- no
    nested-loop join, no per-key pair blow-up. The reference has no
    joins at all (SURVEY.md section 2a)."""
    from .operators.rangejoin import time_range_pairs

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    pairs = time_range_pairs(purchases, clicks, key="user_id", max_gap_s=24 * 3600)
    return pairs.select(
        "user_id", "purchase_id", F.col("click_id_r").alias("click_id"), "gap_us"
    )


def q_events_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-event attach: each purchase joined to the CLOSEST click
    by the same user within +-2 h, in either direction (ties prefer
    the earlier click) -- the sensor-alignment / nearest-measurement
    join, where backward-only as-of would miss a click seconds after
    the purchase. Uses asof_join_nearest (union + two keyed windows
    sharing one exchange, linear rows); the right side is pre-deduped
    per (user, ts) with min event_id, per the operator's uniqueness
    contract. gap_us is signed microseconds (negative = click before
    purchase); unmatched purchases keep NULL click/gap."""
    from .operators.asof import asof_join_nearest

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("click_id"))
    )
    j = asof_join_nearest(
        purchases,
        clicks,
        by="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["click_id"],
        tolerance_us=2 * 3600 * 1_000_000,
    )
    return j.select(
        "purchase_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "click_id",
        (F.col("asof_ts_us") - F.unix_micros(F.col("ts").cast("timestamp"))).alias(
            "gap_us"
        ),
    )


def q_embedding_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64 -> 8 dims with
    deterministic LCG directions (operators/projection.py): per-row
    map work only, oracle-checkable because the 'random' matrix is
    reproducible integer arithmetic in both engines."""
    from .operators.projection import project_embeddings

    return project_embeddings(load_table(spark, sf_dir, "embeddings"))


def q_events_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window aggregate (1 h windows sliding every 15 min):
    each event lands in exactly 4 overlapping windows -- the batch
    twin of the streaming windowed aggregation. Spark expands the
    window generator map-side; one shuffle on window start."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("string")
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n_events",
            "sum_value",
        )
    )


def q_word_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostic: the distribution of per-key row counts
    (here: the word-count keys, the reference's real skew -- stopword
    tokens dwarf the median word). p50/p90/p99/max of key counts and
    the hottest key's share of all rows are exactly the numbers that
    decide whether a shuffle needs salting (wordcount_salted) or AQE
    skew-join splitting. Percentiles run over the POST-aggregation
    key-count table (vocab-sized), never the corpus."""
    counts = word_count(corpus_from_documents(spark, sf_dir))
    pct = F.expr("percentile(cnt, array(0.5, 0.9, 0.99))")
    return counts.agg(
        F.count("*").alias("n_words"),
        F.sum("cnt").alias("n_tokens"),
        F.max("cnt").alias("max_cnt"),
        F.round(pct[0], 6).alias("p50"),
        F.round(pct[1], 6).alias("p90"),
        F.round(pct[2], 6).alias("p99"),
        F.round(F.max("cnt") / F.sum("cnt"), 6).alias("top1_share"),
    )


def q_events_quantiles_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mergeable quantile sketch: fixed-width
    histogram bins (the counts are exact integers, so unlike GK/KLL
    the sketch is order-independent and DuckDB-reproducible). Per
    event_type: bin = floor(value / width); the p-quantile estimate
    is the LEFT edge of the first bin whose cumulative count reaches
    ceil(p * n). Error is bounded by the bin width; at 100 TB the
    state is one (type, bin) count map -- a map-side-combined
    groupBy, same cost shape as a word count."""
    from pyspark.sql import Window

    width = 10.0
    ev = load_table(spark, sf_dir, "events")
    binned = ev.select(
        "event_type", F.floor(F.col("value") / width).cast("long").alias("bin")
    ).groupBy("event_type", "bin").agg(F.count("*").alias("c"))
    w = Window.partitionBy("event_type").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy("event_type")
    cum = binned.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(tot)
    )

    def q_edge(p: float):
        hit = F.when(F.col("cum") >= F.ceil(F.lit(p) * F.col("n")), F.col("bin"))
        return F.round(F.min(hit) * width, 6)

    return cum.groupBy("event_type").agg(
        q_edge(0.5).alias("p50_bin"),
        q_edge(0.9).alias("p90_bin"),
        q_edge(0.99).alias("p99_bin"),
        F.max("n").alias("n_events"),
    )


def q_events_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles (Greenwald-Khanna via
    approx_percentile, rank error <= n/accuracy): the single-pass,
    bounded-memory path for 100 TB where the exact percentile's
    per-group sorted buffer is unaffordable. Rows-only (no DuckDB
    twin for the sketch); tests/test_rangejoin_projection.py bounds
    it against the exact events_quantiles."""
    ev = load_table(spark, sf_dir, "events")
    pct = F.expr("approx_percentile(value, array(0.5, 0.9, 0.99), 10000)")
    return ev.groupBy("event_type").agg(
        F.round(pct[0], 6).alias("p50"),
        F.round(pct[1], 6).alias("p90"),
        F.round(pct[2], 6).alias("p99"),
        F.count("*").alias("n_events"),
    )


def q_doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM cross-entropy per document (add-1 smoothing, model
    trained on the corpus itself) -- the perplexity quality filter of
    LLM data pipelines (operators/lm_score.py). Decimal-accumulated
    ln terms make the float sum order-independent and oracle-exact."""
    from .operators.lm_score import bigram_cross_entropy

    return bigram_cross_entropy(load_table(spark, sf_dir, "documents"))


def q_doc_tf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse lexical all-pairs similarity: token-count cosine over
    the rare-term subspace (df <= 100) via an inverted-index
    self-join (operators/sparse_sim.py) -- posting lists bounded by
    max_df, so no term creates a hot reducer; integer dot products
    and norms keep the oracle exact."""
    from .operators.sparse_sim import tf_cosine_pairs

    return tf_cosine_pairs(load_table(spark, sf_dir, "documents"))


def q_curate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline, oracle-checked end to end now
    that the MinHash cluster stage uses portable hashing. EAGER:
    cluster propagation rounds run at DataFrame-construction time."""
    return curate_documents(spark, sf_dir)
q_orders_running_total = analytics.orders_running_total
q_cheapest_supplier = analytics.cheapest_supplier
q_nation_market_share = analytics.nation_market_share
q_events_last_per_user = analytics.events_last_per_user
q_segment_event_stats = analytics.segment_event_stats_salted
q_label_centroids = analytics.label_centroids
q_revenue_by_nation = analytics.revenue_by_nation
q_top_customers = analytics.top_customers
q_customer_order_ranks = analytics.customer_order_ranks
q_events_hourly = analytics.events_hourly
q_user_retention = analytics.user_retention
q_events_sessionize = analytics.events_sessionize


def _exact_ntile(rn, total, k: int):
    """SQL-standard NTILE(k) from a 1-based global row number: the
    first n%k tiles get ceil(n/k) rows, the rest floor(n/k) -- exact
    integer arithmetic, identical to the oracle's native ntile()."""
    q = F.floor(total / k)
    r = total % k
    cut = r * (q + 1)
    return (
        F.when(total < F.lit(k), rn)  # degenerate: fewer rows than tiles
        .when(rn <= cut, F.floor((rn - 1) / (q + 1)) + 1)
        .otherwise(r + F.floor((rn - 1 - cut) / q) + 1)
        .cast("long")
    )


def q_customer_rfm(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """RFM customer segmentation -- recency / frequency / monetary
    quintile scores (5 = best) plus a coarse segment label: the
    classic CRM table, built WITHOUT a single global sort: each of
    the three exact NTILEs comes from the two-level bucketed global
    row_number (operators/ranking.with_global_row_number) + the
    closed-form ntile arithmetic, so no customer row ever crosses a
    SinglePartition exchange. The oracle uses NATIVE ntile() windows;
    the hash match proves all three scalable decompositions exact.

    Determinism: ranking keys are (days, custkey), (count, custkey)
    and (decimal-sum-routed-to-double, custkey) -- total orders, so
    ties cannot float; the monetary double is built by the identical
    string route in both engines."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    ref = orders.agg(F.max("o_orderdate").alias("ref_date"))
    per = (
        orders.crossJoin(F.broadcast(ref))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.min(
                F.datediff(F.col("ref_date").cast("date"), F.col("o_orderdate").cast("date"))
            ).cast("long").alias("recency_days"),
            F.count("*").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("string")
            .cast("double")
            .alias("monetary"),
        )
    )
    per = materialize(per)  # three ranking passes read it
    from .operators.ranking import with_global_row_number

    def score(df, key, ascending, out):
        ranked = with_global_row_number(
            df, key, tiebreaks=[F.asc("custkey")], ascending=ascending,
            out_col="_rn", total_col="_n",
        )
        tile = _exact_ntile(F.col("_rn"), F.col("_n"), k)
        return ranked.withColumn(out, (F.lit(k + 1) - tile).cast("long")).drop(
            "_rn", "_n"
        )

    # score = k+1-tile, so tile 1 must hold the BEST customers:
    # recency ranks ascending (smallest days-since-order first),
    # frequency and monetary rank descending (largest first)
    scored = score(per, "recency_days", True, "r_score")
    scored = score(scored, "frequency", False, "f_score")
    scored = score(scored, "monetary", False, "m_score")
    seg = (
        F.when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 4) & (F.col("m_score") >= 4),
            "champion",
        )
        .when((F.col("r_score") >= 4) & (F.col("f_score") >= 3), "loyal")
        .when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "at_risk")
        .otherwise("regular")
    )
    return scored.select(
        "custkey",
        "recency_days",
        "frequency",
        F.round("monetary", 2).alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
        F.concat_ws("", "r_score", "f_score", "m_score").alias("rfm_cell"),
        seg.alias("segment"),
    )


def q_events_cusum(spark: SparkSession, sf_dir: str, slack: float = 0.5,
                   threshold: float = 4.0) -> DataFrame:
    """CUSUM change-point monitor (Page 1954) over the daily count
    series of each event type: standardize counts against the series'
    own mean/std, then the one-sided upper CUSUM
    s_t = max(0, s_{t-1} + z_t - slack), alert when s_t > threshold --
    the sequential drift detector a pipeline runs on its volume
    metrics (z-score anomaly flags single spikes; CUSUM accumulates
    small sustained shifts).

    Cross-engine exactness: the recursion is computed in its CLOSED
    FORM s_t = P_t - min(0, min_{j<=t} P_j) with P the running prefix
    sum of (round(z, 9) - slack) accumulated in DECIMAL(20,9) --
    double running sums are NOT portable here (DuckDB's windowed sum
    aggregates via a segment tree, so its float association differs
    from Spark's sequential adds; measured: one last-ulp mismatch in
    150 rows at sf0.1). Decimal sums are exact, the min and the
    threshold compare happen on exact decimals, and only the final
    reported value string-routes to double. Scale: two type-keyed
    windows over a types x days table; everything upstream is one
    groupBy."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("cnt"))
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cnt").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("s2"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n
    std = F.sqrt(
        (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double") / n) / n
    )
    z = F.round((F.col("cnt").cast("double") - F.col("mean")) / F.col("std"), 9)
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    y_dec = z.cast("decimal(20,9)") - F.lit(str(slack)).cast("decimal(20,9)")
    zero = F.lit("0").cast("decimal(30,9)")
    scored = (
        daily.join(
            F.broadcast(stats.select("event_type", mean.alias("mean"), std.alias("std"))),
            "event_type",
        )
        .select("event_type", "day", "cnt", y_dec.alias("y"))
        .withColumn("p", F.sum("y").over(w))
        .withColumn("mp", F.min("p").over(w))
        .withColumn("m", F.when(F.col("mp") < zero, F.col("mp")).otherwise(zero))
    )
    s_dec = F.col("p") - F.col("m")
    return scored.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day_s"),
        "cnt",
        s_dec.cast("string").cast("double").alias("cusum"),
        (s_dec > F.lit(str(threshold)).cast("decimal(20,9)")).alias("alert"),
    )


def q_user_value_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-weighted average value per user (TWAP): each event's value
    holds until the user's next event (LOCF semantics, as the gap-fill
    and SCD2 operators); the average weights by that holding duration
    instead of by event count -- the correct aggregate whenever
    sampling is irregular (a value held for 6 h must outweigh one
    replaced after 3 s). The user's last event has no successor and
    carries no weight.

    Scale: one user-keyed window (lead) + one groupBy on the same key
    -- Catalyst reuses a single exchange. Exactness: value is exact
    DECIMAL(10,2), the holding time exact integer microseconds as
    DECIMAL(16,0); their product (27,2) never hits Spark's 38-digit
    precision reduction (the narrow-both-operands rule), so numerator
    and denominator are exact and only the final division is floating
    point (then round 6)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    dur = F.lead(us).over(w) - us
    g = ev.withColumn("dur", dur).filter(F.col("dur").isNotNull())
    num = F.sum(
        F.col("value").cast("decimal(10,2)") * F.col("dur").cast("decimal(16,0)")
    )
    return (
        g.groupBy("user_id")
        .agg(
            F.sum("dur").cast("long").alias("active_us"),
            num.cast("string").cast("double").alias("_num"),
        )
        .select(
            "user_id",
            "active_us",
            F.round(F.col("_num") / F.col("active_us").cast("double"), 6).alias(
                "twap"
            ),
        )
    )


def q_session_concurrency(spark: SparkSession, sf_dir: str,
                          gap_seconds: int = 1800) -> DataFrame:
    """Peak-load sweep line: per day, how many user sessions were
    active SIMULTANEOUSLY at the worst moment (capacity planning /
    peak-concurrency SLO). Sessions are 30-min-gap islands; each
    session is a CLOSED [first_event, last_event] interval, split into
    per-day segments so the sweep stays a day-keyed window.

    Scale: session build is the one user_id-keyed window chain; the
    segment explode is bounded (sessions span at most 2 days); the
    sweep is a window PARTITIONED BY day over (day, distinct ts)
    rows -- never a global sort. Tie-safety: concurrency is evaluated
    per distinct timestamp as running_net_before + starts_at_ts
    (starts count before ends at the same instant -- touching
    sessions overlap), which is invariant to any intra-timestamp
    ordering, so no tie-break is needed at all."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    chg = (gap.isNull() | (gap > gap_seconds)).cast("long")
    isl = ev.withColumn("chg", chg).withColumn(
        "island", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    sess = isl.groupBy("user_id", "island").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    seg = sess.select(
        F.explode(
            F.sequence(
                F.date_trunc("day", F.col("s")),
                F.date_trunc("day", F.col("e")),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
        "s",
        "e",
    ).select(
        "day",
        F.greatest(F.col("s"), F.col("day")).alias("a"),
        F.least(
            F.col("e"),
            F.col("day") + F.expr("INTERVAL 1 DAY") - F.expr("INTERVAL 1 MICROSECOND"),
        ).alias("b"),
    )
    # the start/end endpoint selects both consume seg: without pinning,
    # the union DUPLICATES the whole session-build subtree (two
    # user-keyed shuffles over events instead of one)
    seg = materialize(seg)
    pts = (
        seg.select("day", F.col("a").alias("ts"), F.lit(1).alias("cs"), F.lit(0).alias("ce"))
        .unionByName(
            seg.select("day", F.col("b").alias("ts"), F.lit(0).alias("cs"), F.lit(1).alias("ce"))
        )
        .groupBy("day", "ts")
        .agg(F.sum("cs").alias("cs"), F.sum("ce").alias("ce"))
    )
    wd = (
        Window.partitionBy("day")
        .orderBy(F.asc("ts"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    peak = (
        F.coalesce(F.sum(F.col("cs") - F.col("ce")).over(wd), F.lit(0)) + F.col("cs")
    )
    return (
        pts.withColumn("peak", peak)
        .groupBy("day")
        .agg(
            F.sum("cs").cast("long").alias("n_sessions"),
            F.max("peak").cast("long").alias("max_concurrent"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day_s"),
            "n_sessions",
            "max_concurrent",
        )
    )


def q_events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's NATIVE session_window operator (the
    dynamic-gap merge inside the aggregation, the same operator the
    streaming twin uses) -- per-session rows, not per-user counts.
    The oracle is the classic SQL gaps-and-islands rewrite, so the
    hash match PROVES the built-in's merge semantics (half-open
    [start, last+gap): a gap of exactly 30 min starts a NEW session)
    equal the `diff >= gap` island rule at microsecond precision.
    Scale: one hash shuffle on user_id; session merging is
    per-group operator state, never a window over raw facts."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window(F.col("ts"), "30 minutes").alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "n_types",
        )
    )
q_events_json_stats = analytics.events_json_stats


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------

def _lang_hits_sql() -> str:
    hit_exprs = ",\n      ".join(
        "CAST(len(list_filter(toks, t -> t IN ({vals}))) AS BIGINT) AS hits_{lang}".format(
            vals=", ".join(f"'{m}'" for m in LANG_MARKERS[lang]), lang=lang
        )
        for lang in sorted(LANG_MARKERS)
    )
    langs = sorted(LANG_MARKERS)
    m = "greatest(" + ", ".join(f"hits_{lang}" for lang in langs) + ")"
    pred = "CASE " + " ".join(
        f"WHEN hits_{lang} = {m} THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""
      WITH t AS ({_SQL_TOKS}),
      h AS (SELECT doc_id, lang, {hit_exprs} FROM t)
      SELECT doc_id, lang, {", ".join(f"hits_{lang}" for lang in langs)},
             {pred} AS pred_lang
      FROM h
    """


def _bucket_terms_sql(num_planes: int = 8, dim: int = 64) -> str:
    """The deterministic-LCG LSH bucket id as a SQL expression over a
    DOUBLE[] column named dvec -- the exact twin of
    operators.similarity._bucket_col."""
    planes = lsh_planes(num_planes, dim)
    return " + ".join(
        "(CASE WHEN list_dot_product(dvec, [{w}]) >= 0 THEN {p2} ELSE 0 END)".format(
            w=", ".join(repr(x) for x in plane), p2=2**p
        )
        for p, plane in enumerate(planes)
    )


def _ann_lsh_sql(num_planes: int = 8, dim: int = 64, n_queries: int = 10, k: int = 5) -> str:
    bucket_terms = _bucket_terms_sql(num_planes, dim)
    return f"""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dvec FROM embeddings),
      b AS (SELECT vec_id, dvec, CAST({bucket_terms} AS BIGINT) AS bucket FROM v),
      q AS (SELECT vec_id AS query_id, dvec AS qvec, bucket FROM b WHERE vec_id < {n_queries}),
      s AS (SELECT q.query_id, q.bucket, e.vec_id AS neighbor_id,
                   round(list_cosine_similarity(q.qvec, e.dvec), 6) AS cosine
            FROM q JOIN b e USING (bucket) WHERE e.vec_id <> q.query_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM s)
      SELECT query_id, bucket, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
      FROM r WHERE rank <= {k}
    """


def _projection_sql(k: int = 8, dim: int = 64) -> str:
    """Oracle twin of operators.projection.project_embeddings: the
    identical LCG plane literals, list_dot_product's sequential
    double fold == Spark's zip_with/aggregate fold."""
    from .operators.projection import projection_planes

    cols = ",\n             ".join(
        "round(list_dot_product(dvec, [{w}]), 6) AS p{p}".format(
            w=", ".join(repr(x) for x in plane), p=p
        )
        for p, plane in enumerate(projection_planes(k, dim))
    )
    return f"""
      SELECT vec_id,
             {cols}
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dvec FROM embeddings)
    """


# One k-token shingle per ROW (with duplicates), matching
# operators.dedup.shingle_rows -- the MinHash input.
def _sql_sh_rows(table: str = "documents") -> str:
    return f"""
  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
           i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS sh
  FROM ({_sql_toks(table)}) WHERE len(toks) >= 3
"""


def _minhash_pairs_sql(
    num_perm: int = 16, bands: int = 8, min_est: float = 0.3, table: str = "documents"
) -> str:
    """Oracle twin of operators.dedup.minhash_near_dup_pairs: the
    identical md5-prefix base hash, the identical LCG permutation
    literals (minhash_perm_constants), the identical md5-prefix band
    hash -- integer arithmetic end-to-end, so signatures, band
    buckets, candidate pairs, and both Jaccard columns reproduce
    exactly."""
    from .operators.dedup import MINHASH_PRIME, minhash_perm_constants

    rows_per_band = num_perm // bands
    sig_aggs = ",\n               ".join(
        f"min(({a} * hb + {b}) % {MINHASH_PRIME}) AS h{p}"
        for p, (a, b) in enumerate(minhash_perm_constants(num_perm))
    )
    band_selects = "\n        UNION ALL\n".join(
        "SELECT doc_id, {b} AS band_id, CAST(concat('0x', substr(md5("
        "concat_ws(',', {parts})), 1, 15)) AS BIGINT) AS band_hash FROM sig".format(
            b=b,
            parts=", ".join(
                f"CAST(h{b * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    est_sum = " + ".join(
        f"CASE WHEN sa.h{p} = sb.h{p} THEN 1 ELSE 0 END" for p in range(num_perm)
    )
    return f"""
      WITH hb_rows AS (
        SELECT doc_id, CAST(concat('0x', substr(md5(sh), 1, 8)) AS BIGINT) AS hb
        FROM ({_sql_sh_rows(table)})
      ),
      sig AS (SELECT doc_id, {sig_aggs} FROM hb_rows GROUP BY doc_id),
      banded AS (
        {band_selects}
      ),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM banded a JOIN banded b
                 ON a.band_id = b.band_id AND a.band_hash = b.band_hash
                AND a.doc_id < b.doc_id),
      shs AS ({_sql_shingles(table)}),
      p AS (SELECT doc_a, doc_b,
                   round(({est_sum}) / {num_perm}.0, 6) AS est_jaccard,
                   round(len(list_intersect(ja.shset, jb.shset))
                         / len(list_distinct(list_concat(ja.shset, jb.shset))), 6) AS jaccard
            FROM cand
            JOIN sig sa ON sa.doc_id = cand.doc_a
            JOIN sig sb ON sb.doc_id = cand.doc_b
            JOIN shs ja ON ja.doc_id = cand.doc_a
            JOIN shs jb ON jb.doc_id = cand.doc_b)
      SELECT doc_a, doc_b, est_jaccard, jaccard FROM p WHERE est_jaccard >= {min_est}
    """


def _simhash_sql() -> str:
    """Oracle twin of operators.dedup.simhash_fp: 60 bit-count sums
    over the md5-prefix token hash, majority vote per bit, disjoint
    bit reassembly -- exact integers cross-engine."""
    from .operators.dedup import SIMHASH_BITS

    sums = ",\n               ".join(
        f"sum((h >> {i}) & 1) AS s{i}" for i in range(SIMHASH_BITS)
    )
    fp = "\n               + ".join(
        f"(CASE WHEN 2 * s{i} > n THEN {1 << i} ELSE 0 END)" for i in range(SIMHASH_BITS)
    )
    return f"""
      WITH t AS (SELECT doc_id, unnest(toks) AS tok FROM ({_SQL_TOKS})),
      h AS (SELECT doc_id,
                   CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h
            FROM t),
      a AS (SELECT doc_id, count(*) AS n, {sums} FROM h GROUP BY doc_id)
      SELECT doc_id,
             CAST({fp} AS BIGINT) AS simhash
      FROM a
    """


def _simhash_pairs_sql(max_hamming: int = 8) -> str:
    """Brute-force all-pairs Hamming oracle: the banded Spark plan
    guarantees FULL recall at the threshold (pigeonhole) and filters
    on the exact distance, so banded == brute force exactly."""
    return f"""
      WITH f AS ({_simhash_sql()})
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
      FROM f a JOIN f b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


def _dedup_clusters_sql() -> str:
    """Recursive-CTE transitive min-label closure over the SAME
    MinHash pair graph _minhash_pairs_sql reproduces -- the iterative
    label_propagation loop, oracle-checked end to end."""
    return f"""
      WITH RECURSIVE base AS (
        SELECT doc_a, doc_b FROM ({_minhash_pairs_sql()})
      ),
      ee AS (SELECT doc_a, doc_b FROM base
             UNION ALL
             SELECT doc_b AS doc_a, doc_a AS doc_b FROM base),
      cc AS (
        SELECT doc_a AS doc_id, doc_a AS label FROM ee
        UNION
        SELECT ee.doc_a AS doc_id, cc.label FROM ee JOIN cc ON cc.doc_id = ee.doc_b
      )
      SELECT doc_id, min(label) AS cluster FROM cc GROUP BY doc_id
    """


def _kmeans_assign_cte(name: str, cents: str, src: str = "v") -> str:
    """One Lloyd assignment round as a CTE: per-vector argmin of
    ||c||^2 - 2 v.c over the current centroids, ties to the smallest
    cell -- exactly operators.kmeans._assign's array_min(struct)."""
    obj = (
        "list_dot_product(c.cvec, c.cvec) - 2 * list_dot_product(v.dvec, c.cvec)"
    )
    return f"""
      {name} AS (
        SELECT vec_id, dvec, cell, obj FROM (
          SELECT v.vec_id, v.dvec, c.cell, {obj} AS obj,
                 row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY {obj} ASC, c.cell ASC) AS rn
          FROM {src} v CROSS JOIN {cents} c)
        WHERE rn = 1
      )"""


def _kmeans_means_cte(name: str, assigned: str) -> str:
    """One Lloyd update round: per-(cell, dim) exact decimal-sum mean
    (the order-independent recipe of operators.kmeans._centroids_from
    / similarity.ivf_centroids), reassembled into ordered arrays."""
    return f"""
      {name} AS (
        SELECT cell, list(c ORDER BY idx ASC) AS cvec FROM (
          SELECT cell, idx,
                 CAST(CAST(sum(CAST(dvec[idx] AS DECIMAL(27,12))) AS VARCHAR) AS DOUBLE)
                   / count(*) AS c
          FROM (SELECT cell, dvec, unnest(range(1, len(dvec) + 1)) AS idx
                FROM {assigned})
          GROUP BY cell, idx)
        GROUP BY cell
      )"""


def _kmeans_ctes(k: int = 8, n_iter: int = 3, src: str = "v", prefix: str = "") -> str:
    """The full unrolled Lloyd fit as a WITH-clause body: seeds =
    smallest k vec_ids, n_iter (assign, update) rounds, final
    assignment in CTE `{prefix}fin`. Every arithmetic step is either
    exact integers/decimals or the same sequential double fold in
    both engines, so the iterative algorithm reproduces bit-for-bit.
    `src`/`prefix` let product quantization unroll one independent
    fit per subspace in a single statement."""
    ctes = [
        f"""
      {prefix}c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS BIGINT) AS cell,
                    dvec AS cvec
             FROM (SELECT vec_id, dvec FROM {src} ORDER BY vec_id ASC LIMIT {k}))"""
    ]
    for i in range(1, n_iter + 1):
        ctes.append(_kmeans_assign_cte(f"{prefix}a{i}", f"{prefix}c{i - 1}", src))
        ctes.append(_kmeans_means_cte(f"{prefix}c{i}", f"{prefix}a{i}"))
    ctes.append(_kmeans_assign_cte(f"{prefix}fin", f"{prefix}c{n_iter}", src))
    return ",".join(ctes)


_SQL_EMB_V = "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dvec FROM embeddings)"


def _kmeans_cells_sql(k: int = 8, n_iter: int = 3) -> str:
    return f"""
      WITH {_SQL_EMB_V},{_kmeans_ctes(k, n_iter)}
      SELECT vec_id, cell, round(obj, 6) AS obj FROM fin
    """


def _ann_ivf_kmeans_sql(
    k: int = 8, n_iter: int = 3, n_queries: int = 10, n_probe: int = 2, topk: int = 5
) -> str:
    """IVF serve plan over the LEARNED k-means cells: the unrolled
    Lloyd fit above assigns the inverted lists, then the identical
    probe/rank SQL as the ann_ivf oracle (decimal-mean serve
    centroids over the final assignment)."""
    return f"""
      WITH {_SQL_EMB_V},{_kmeans_ctes(k, n_iter)},{_kmeans_means_cte("sc", "fin")},
      q AS (SELECT vec_id AS query_id, dvec AS qvec FROM v WHERE vec_id < {n_queries}),
      qc AS (SELECT q.query_id, q.qvec, c.cell,
                    list_cosine_similarity(q.qvec, c.cvec) AS csim
             FROM q CROSS JOIN sc c),
      probes AS (SELECT query_id, qvec, cell FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY csim DESC, cell ASC) AS pr FROM qc) WHERE pr <= {n_probe}),
      s AS (SELECT p.query_id, p.cell, e.vec_id AS neighbor_id,
                   round(list_cosine_similarity(p.qvec, e.dvec), 6) AS cosine
            FROM probes p JOIN fin e ON e.cell = p.cell
            WHERE e.vec_id <> p.query_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM s)
      SELECT query_id, cell, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
      FROM r WHERE rank <= {topk}
    """


def _pq_ctes(
    m: int = 4, k: int = 4, n_iter: int = 2, dim: int = 64, src: str | None = None
) -> str:
    """WITH-body for product quantization: one independent unrolled
    Lloyd fit per dim/m-wide subspace slice (operators.quantization
    pq_fit/pq_codes twins). Subspace j's final assignment lands in
    CTE s{j}_fin (vec_id, dvec = the slice, cell, obj). Pass `src`
    to quantize another (vec_id, dvec) CTE -- e.g. the residuals in
    the IVFADC oracle -- instead of the raw embeddings."""
    w = dim // m
    ctes = [] if src else [_SQL_EMB_V]
    src = src or "v"
    for j in range(m):
        ctes.append(
            f"""
      v{j} AS (SELECT vec_id, list_slice(dvec, {j * w + 1}, {j * w + w}) AS dvec FROM {src})"""
        )
        ctes.append(_kmeans_ctes(k, n_iter, src=f"v{j}", prefix=f"s{j}_"))
    return ",".join(ctes)


def _pq_codes_sql(m: int = 4, k: int = 4, n_iter: int = 2, dim: int = 64) -> str:
    """Oracle twin of pq_codes, projected to scalar code columns
    c0..c{m-1} (the driver's canonicalizer cannot hash arrays)."""
    code_cols = ",\n             ".join(f"f{j}.cell AS c{j}" for j in range(m))
    err = "\n               + ".join(
        f"(list_dot_product(f{j}.dvec, f{j}.dvec) + f{j}.obj)" for j in range(m)
    )
    joins = "\n      ".join(
        f"JOIN s{j}_fin f{j} ON f{j}.vec_id = v.vec_id" for j in range(m)
    )
    return f"""
      WITH {_pq_ctes(m, k, n_iter, dim)}
      SELECT v.vec_id,
             {code_cols},
             round({err}, 6) AS recon_err
      FROM v
      {joins}
    """


def _pq_search_sql(
    m: int = 4,
    k: int = 4,
    n_iter: int = 2,
    dim: int = 64,
    n_queries: int = 10,
    topk: int = 5,
) -> str:
    """Oracle twin of pq_adc_topk: per-query lookup table of
    subspace-to-codeword squared distances, ADC sum as exact
    decimals, rank with deterministic tie-break."""
    w = dim // m
    cents_union = "\n        UNION ALL\n".join(
        f"SELECT {j} AS j, cell AS code, cvec FROM s{j}_c{n_iter}" for j in range(m)
    )
    codes_union = "\n        UNION ALL\n".join(
        f"SELECT vec_id, {j} AS j, cell AS code FROM s{j}_fin" for j in range(m)
    )
    return f"""
      WITH {_pq_ctes(m, k, n_iter, dim)},
      cents AS (
        {cents_union}
      ),
      q AS (SELECT vec_id AS query_id, dvec AS qvec FROM v WHERE vec_id < {n_queries}),
      qt1 AS (SELECT q.query_id, c.j, c.code, c.cvec,
                     list_slice(q.qvec, c.j * {w} + 1, c.j * {w} + {w}) AS qs
              FROM q CROSS JOIN cents c),
      qt AS (SELECT query_id, j, code, list_dot_product(d, d) AS d2
             FROM (SELECT *, list_transform(range(1, {w} + 1), i -> qs[i] - cvec[i]) AS d
                   FROM qt1)),
      ce AS (
        {codes_union}
      ),
      sc AS (SELECT qt.query_id, ce.vec_id,
                    CAST(CAST(sum(CAST(d2 AS DECIMAL(27,12))) AS VARCHAR) AS DOUBLE) AS adc
             FROM ce JOIN qt ON qt.j = ce.j AND qt.code = ce.code
             WHERE ce.vec_id <> qt.query_id
             GROUP BY qt.query_id, ce.vec_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY adc ASC, vec_id ASC) AS rank FROM sc)
      SELECT query_id, vec_id AS neighbor_id, round(adc, 6) AS adc_dist,
             CAST(rank AS BIGINT) AS rank
      FROM r WHERE rank <= {topk}
    """


def _ivfpq_sql(
    coarse_k: int = 8,
    coarse_iter: int = 3,
    m: int = 4,
    k: int = 4,
    n_iter: int = 2,
    dim: int = 64,
    n_queries: int = 10,
    n_probe: int = 2,
    topk: int = 5,
) -> str:
    """Oracle twin of quantization.ivfpq_topk: coarse unrolled Lloyd
    (prefix g_) routes queries to n_probe cells; the per-subspace PQ
    fits supply codes; the ADC scan is restricted to probed cells."""
    w = dim // m
    cents_union = "\n        UNION ALL\n".join(
        f"SELECT {j} AS j, cell AS code, cvec FROM s{j}_c{n_iter}" for j in range(m)
    )
    codes_union = "\n        UNION ALL\n".join(
        f"SELECT vec_id, {j} AS j, cell AS code FROM s{j}_fin" for j in range(m)
    )
    return f"""
      WITH {_pq_ctes(m, k, n_iter, dim)},{_kmeans_ctes(coarse_k, coarse_iter, src="v", prefix="g_")},
      q AS (SELECT vec_id AS query_id, dvec AS qvec FROM v WHERE vec_id < {n_queries}),
      qc AS (SELECT q.query_id, c.cell,
                    list_dot_product(c.cvec, c.cvec)
                      - 2 * list_dot_product(q.qvec, c.cvec) AS obj
             FROM q CROSS JOIN g_c{coarse_iter} c),
      probes AS (SELECT query_id, cell FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY obj ASC, cell ASC) AS pr FROM qc)
        WHERE pr <= {n_probe}),
      cents AS (
        {cents_union}
      ),
      qt1 AS (SELECT q.query_id, c.j, c.code, c.cvec,
                     list_slice(q.qvec, c.j * {w} + 1, c.j * {w} + {w}) AS qs
              FROM q CROSS JOIN cents c),
      qt AS (SELECT query_id, j, code, list_dot_product(d, d) AS d2
             FROM (SELECT *, list_transform(range(1, {w} + 1), i -> qs[i] - cvec[i]) AS d
                   FROM qt1)),
      ce AS (
        {codes_union}
      ),
      ce2 AS (SELECT ce.vec_id, g.cell AS gcell, ce.j, ce.code
              FROM ce JOIN g_fin g USING (vec_id)),
      sc AS (SELECT p.query_id, ce2.vec_id,
                    CAST(CAST(sum(CAST(qt.d2 AS DECIMAL(27,12))) AS VARCHAR) AS DOUBLE) AS adc
             FROM ce2
             JOIN probes p ON p.cell = ce2.gcell
             JOIN qt ON qt.query_id = p.query_id AND qt.j = ce2.j AND qt.code = ce2.code
             WHERE ce2.vec_id <> p.query_id
             GROUP BY p.query_id, ce2.vec_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY adc ASC, vec_id ASC) AS rank FROM sc)
      SELECT query_id, vec_id AS neighbor_id, round(adc, 6) AS adc_dist,
             CAST(rank AS BIGINT) AS rank
      FROM r WHERE rank <= {topk}
    """


def _duplicate_spans_sql(k: int = 8, min_count: int = 2) -> str:
    """Oracle twin of curation.duplicate_spans: positioned k-gram
    windows via struct unnest, repeated-window marking, and the same
    gaps-and-islands merge (running max of ends -> gap flag ->
    running sum as island id)."""
    return f"""
      WITH t AS ({_SQL_TOKS}),
      s AS (SELECT doc_id,
                   unnest(list_transform(range(1, len(toks) - {k} + 2),
                     i -> struct_pack(pos := i - 1,
                            sh := array_to_string(list_slice(toks, i, i + {k} - 1), ' '))))
                   AS u
            FROM t WHERE len(toks) >= {k}),
      e AS (SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.sh AS sh FROM s),
      d AS (SELECT sh FROM e GROUP BY sh HAVING count(*) >= {min_count}),
      marked AS (SELECT doc_id, pos FROM e JOIN d USING (sh)),
      x AS (SELECT doc_id, pos, pos + {k} AS e_pos,
                   max(pos + {k}) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run_max
            FROM marked),
      f AS (SELECT *, CASE WHEN run_max IS NULL OR pos > run_max
                           THEN 1 ELSE 0 END AS flag FROM x),
      g AS (SELECT *, sum(flag) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
            FROM f)
      SELECT doc_id,
             min(pos) AS span_start,
             max(e_pos) AS span_end,
             max(e_pos) - min(pos) AS n_tokens
      FROM g GROUP BY doc_id, island
    """


def _ivfpq_residual_sql(
    coarse_k: int = 8,
    coarse_iter: int = 3,
    m: int = 4,
    k: int = 4,
    n_iter: int = 2,
    dim: int = 64,
    n_queries: int = 10,
    n_probe: int = 2,
    topk: int = 5,
) -> str:
    """Oracle twin of quantization.ivfpq_residual_topk (IVFADC): PQ
    fits run over residuals v - coarse_centroid(cell); the lookup
    table is per-(query, probed cell) against the query residual."""
    w = dim // m
    cents_union = "\n        UNION ALL\n".join(
        f"SELECT {j} AS j, cell AS code, cvec FROM s{j}_c{n_iter}" for j in range(m)
    )
    codes_union = "\n        UNION ALL\n".join(
        f"SELECT vec_id, {j} AS j, cell AS code FROM s{j}_fin" for j in range(m)
    )
    return f"""
      WITH {_SQL_EMB_V},{_kmeans_ctes(coarse_k, coarse_iter, src="v", prefix="g_")},
      r AS (SELECT f.vec_id,
                   list_transform(range(1, {dim} + 1), i -> f.dvec[i] - c.cvec[i]) AS dvec
            FROM g_fin f JOIN g_c{coarse_iter} c USING (cell)),
      {_pq_ctes(m, k, n_iter, dim, src="r")},
      q AS (SELECT vec_id AS query_id, dvec AS qvec FROM v WHERE vec_id < {n_queries}),
      qc AS (SELECT q.query_id, q.qvec, c.cell, c.cvec,
                    list_dot_product(c.cvec, c.cvec)
                      - 2 * list_dot_product(q.qvec, c.cvec) AS obj
             FROM q CROSS JOIN g_c{coarse_iter} c),
      probes AS (SELECT query_id, cell,
                        list_transform(range(1, {dim} + 1), i -> qvec[i] - cvec[i]) AS qres
                 FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                              ORDER BY obj ASC, cell ASC) AS pr FROM qc)
                 WHERE pr <= {n_probe}),
      cents AS (
        {cents_union}
      ),
      qt1 AS (SELECT p.query_id, p.cell, c.j, c.code, c.cvec AS cwvec,
                     list_slice(p.qres, c.j * {w} + 1, c.j * {w} + {w}) AS qs
              FROM probes p CROSS JOIN cents c),
      qt AS (SELECT query_id, cell, j, code, list_dot_product(d, d) AS d2
             FROM (SELECT *, list_transform(range(1, {w} + 1), i -> qs[i] - cwvec[i]) AS d
                   FROM qt1)),
      ce AS (
        {codes_union}
      ),
      ce2 AS (SELECT ce.vec_id, g.cell, ce.j, ce.code
              FROM ce JOIN g_fin g USING (vec_id)),
      sc AS (SELECT qt.query_id, ce2.vec_id,
                    CAST(CAST(sum(CAST(qt.d2 AS DECIMAL(27,12))) AS VARCHAR) AS DOUBLE) AS adc
             FROM ce2
             JOIN qt ON qt.cell = ce2.cell AND qt.j = ce2.j AND qt.code = ce2.code
             WHERE ce2.vec_id <> qt.query_id
             GROUP BY qt.query_id, ce2.vec_id),
      r2 AS (SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY adc ASC, vec_id ASC) AS rank FROM sc)
      SELECT query_id, vec_id AS neighbor_id, round(adc, 6) AS adc_dist,
             CAST(rank AS BIGINT) AS rank
      FROM r2 WHERE rank <= {topk}
    """


def _semantic_dedup_sql(
    min_cosine: float = 0.35, coarse_k: int = 8, coarse_iter: int = 3
) -> str:
    """Oracle twin of similarity.semantic_dedup: the unrolled Lloyd
    fit supplies the cells; within-cell pairs at rounded cosine >=
    threshold mark the larger id keep=false."""
    return f"""
      WITH {_SQL_EMB_V},{_kmeans_ctes(coarse_k, coarse_iter)},
      n AS (SELECT vec_id, cell, dvec,
                   sqrt(list_dot_product(dvec, dvec)) AS nrm
            FROM fin),
      d AS (SELECT DISTINCT b.vec_id
            FROM n a JOIN n b ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.dvec, b.dvec) / (a.nrm * b.nrm), 6)
                  >= {min_cosine}),
      r AS (SELECT f.vec_id, f.cell, (d.vec_id IS NULL) AS keep
            FROM fin f LEFT JOIN d ON d.vec_id = f.vec_id)
      SELECT vec_id, cell, keep FROM r
    """


def _curate_documents_sql(min_quality: float = 0.5) -> str:
    """Oracle for the COMPOSED curation pipeline (plans/pipeline.py):
    exact dedup keep-min -> MinHash-cluster near-dup removal (the
    portable pair SQL + recursive-CTE closure, over the exact-deduped
    subset) -> quality gate + annotations. Every stage reuses the
    per-operator oracle expression verbatim."""
    norm = "trim(lower(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))"
    return f"""
      WITH RECURSIVE
      keep AS (
        SELECT min(doc_id) AS doc_id
        FROM (SELECT doc_id, md5({norm}) AS f FROM documents)
        GROUP BY f
      ),
      docs1 AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
      base AS (SELECT doc_a, doc_b FROM ({_minhash_pairs_sql(table="docs1")})),
      ee AS (SELECT doc_a, doc_b FROM base
             UNION ALL
             SELECT doc_b AS doc_a, doc_a AS doc_b FROM base),
      cc AS (
        SELECT doc_a AS doc_id, doc_a AS label FROM ee
        UNION
        SELECT ee.doc_a AS doc_id, cc.label FROM ee JOIN cc ON cc.doc_id = ee.doc_b
      ),
      clusters AS (SELECT doc_id, min(label) AS cluster FROM cc GROUP BY doc_id),
      drop_near AS (SELECT doc_id FROM clusters WHERE doc_id <> cluster),
      t AS (SELECT doc_id, text, lang, source,
                   list_filter(string_split_regex({norm}, '\\s+'), w -> w <> '') AS toks
            FROM docs1
            WHERE doc_id NOT IN (SELECT doc_id FROM drop_near)),
      q AS (SELECT doc_id, text, lang, source,
              round(
                least(len(toks) / 50.0, 1.0) * 0.35
                + (1.0 - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))
                         / greatest(length(text), 1)) * 0.25
                + (len(list_distinct(toks)) / greatest(len(toks), 1)) * 0.2
                + least(len(list_filter(toks, t -> t IN ('the','a','and','of','is'))) / 5.0, 1.0) * 0.2
              , 6) AS quality,
              CAST(coalesce(list_sum(list_transform(toks,
                    t -> CAST(floor((length(t) + 3) / 4.0) AS BIGINT))), 0) AS BIGINT) AS n_bpe_tokens,
              md5({norm}) AS fingerprint
            FROM t)
      SELECT doc_id, text, lang, source, quality, n_bpe_tokens, fingerprint
      FROM q WHERE quality >= {min_quality}
    """



def _dsir_sql(rel: str = "documents", target: str = "src0") -> str:
    """DSIR oracle SQL over an arbitrary documents-shaped relation --
    shared by the standalone dsir_weights oracle and the composed
    selection-pipeline oracle (same text, different FROM)."""
    return f"""
      WITH t0 AS (SELECT doc_id, source,
                         list_filter(string_split_regex(trim(lower(
                           regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))), '\\s+'),
                           w -> w <> '') AS toks
                  FROM {rel}),
      tr AS (SELECT doc_id, source, unnest(toks) AS w FROM t0),
      tc AS (SELECT w,
                    sum(CASE WHEN source = '{target}' THEN 1 ELSE 0 END) AS ct,
                    sum(CASE WHEN source = '{target}' THEN 0 ELSE 1 END) AS cr
             FROM tr GROUP BY 1),
      tot AS (SELECT sum(ct) AS nt_t, sum(cr) AS nt_r, count(*) AS v FROM tc),
      ratios AS (SELECT w,
                        CAST(round(ln((ct + 1) / CAST(nt_t + v AS DOUBLE)), 9) AS DECIMAL(13,9))
                      - CAST(round(ln((cr + 1) / CAST(nt_r + v AS DOUBLE)), 9) AS DECIMAL(13,9))
                          AS lr
                 FROM tc CROSS JOIN tot),
      hist AS (SELECT doc_id, w, count(*) AS m FROM tr
               WHERE source <> '{target}' GROUP BY 1, 2),
      logw AS (SELECT h.doc_id, sum(CAST(h.m AS DECIMAL(10,0)) * r.lr) AS s
               FROM hist h JOIN ratios r USING (w) GROUP BY 1)
      SELECT d.doc_id, d.lang, d.source,
             round(CAST(CAST(l.s AS VARCHAR) AS DOUBLE), 6) AS dsir_logw
      FROM logw l JOIN {rel} d USING (doc_id)
    """


def _temperature_sql(rel: str = "documents") -> str:
    """Temperature-membership oracle SQL over an arbitrary
    documents-shaped relation (mT5 alpha=0.5 shares; decimal-exact
    normalizer; content-hash membership)."""
    return f"""
      WITH c AS (SELECT lang, count(*) AS n_g FROM {rel} GROUP BY 1),
      n AS (SELECT count(*) AS n_tot FROM {rel}),
      w AS (SELECT lang, n_g, n_tot,
                   CAST(round(sqrt(CAST(n_g AS DOUBLE) / CAST(n_tot AS DOUBLE)), 12)
                        AS DECIMAL(14,12)) AS t
            FROM c CROSS JOIN n),
      s AS (SELECT CAST(CAST(sum(t) AS VARCHAR) AS DOUBLE) AS s FROM w),
      r AS (SELECT lang,
                   least(CAST(1.0 AS DOUBLE),
                         ((CAST(CAST(t AS VARCHAR) AS DOUBLE) / s.s) * n_tot) / n_g) AS rate
            FROM w CROSS JOIN s)
      SELECT d.doc_id, d.lang, d.source
      FROM {rel} d JOIN r USING (lang)
      WHERE CAST(concat('0x', substr(md5(trim(lower(regexp_replace(d.text, '[^a-zA-Z0-9\\s]', '', 'g')))), 1, 8)) AS BIGINT)
            / 4294967296.0 < r.rate
    """


def q_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout cells: Morton-interleave (user_id, ts) bin
    ranks and report each quadtree cell's row count + raw dimension
    spans -- the footer min/max a 100 TB scan would prune with. The
    multi-dimensional generalization of the reference's contiguous
    range partitioner (greeter_client.cc:362-390); exact BIGINT
    arithmetic end to end, so the layout itself is oracle-checked."""
    from .operators.zorder import zorder_cells

    return zorder_cells(spark, sf_dir)


def q_zorder_skipping_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured file-skipping tradeoff: total per-chunk dimension
    spans under a Z-curve layout vs a linear time sort (256 chunks
    each). Z-order bounds BOTH dimensions; the linear layout leaves
    every chunk spanning the full user range."""
    from .operators.zorder import zorder_skipping_summary

    return zorder_skipping_summary(spark, sf_dir)


def q_hilbert_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve layout cells (zorder_cells' twin): the xy2d
    quadrant+rotate recurrence unrolled as a per-level column chain,
    exact BIGINT arithmetic, generated from ONE text shared by the
    Spark expression and the DuckDB oracle (operators/zorder.py
    _hilbert_level_sql) so the curve itself is hash-checked."""
    from .operators.zorder import hilbert_cells

    return hilbert_cells(spark, sf_dir)


def q_hilbert_skipping_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert vs Morton under the same oracle-checked skipping
    metric (256 contiguous curve chunks, total per-dimension spans).
    Oracle-pinned TIE by geometry: aligned power-of-4 chunks of
    either curve are the same axis-aligned squares; the curves
    separate on successor locality (see curve_locality_stats)."""
    from .operators.zorder import hilbert_skipping_summary

    return hilbert_skipping_summary(spark, sf_dir)


def q_curve_locality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Successor-locality comparison of the two space-filling curves
    over occupied cells: total/max Manhattan step in bin space and
    the count of perfectly-adjacent steps. Hilbert's total is the
    measured win; the window runs over the distinct-reduced cell
    table only."""
    from .operators.zorder import curve_locality_stats

    return curve_locality_stats(spark, sf_dir)


def _zorder_binned_sql() -> str:
    """Shared oracle CTE: bin ranks + Morton code, generated from the
    same loop as the Spark expression (operators/zorder.morton_sql)."""
    from .operators.zorder import morton_sql

    return f"""
      WITH s AS (SELECT min(user_id) AS lo_u, max(user_id) AS hi_u,
                        min(epoch_us(ts)) AS lo_t, max(epoch_us(ts)) AS hi_t
                 FROM events),
      b AS (SELECT user_id, epoch_us(ts) AS tus,
                   ((user_id - lo_u) * 256) // (hi_u - lo_u + 1) AS bx,
                   ((epoch_us(ts) - lo_t) * 256) // (hi_t - lo_t + 1) AS bt
            FROM events, s),
      zz AS (SELECT user_id, tus, bt, {morton_sql("bx", "bt")} AS z FROM b)
    """


def q_events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-fill + forward fill (LOCF) of each user's last
    purchase value (operators/gapfill.py): one dense row per user per
    hour between their first and last purchase, synthesized rows
    flagged. The sparse-to-dense resample every feature store runs;
    grid generated distributed via explode(sequence), fill is one
    keyed window — nothing driver-side, nothing cross-joined."""
    from .operators.gapfill import gap_fill_forward

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", "value")
    )
    out = gap_fill_forward(ev, "user_id", "ts", "value")
    return out.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("hour_s"),
        "filled_value",
        "is_gap",
    )


def q_cosupply_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-supplier triangle counts in the thresholded
    co-supply graph via degree-ordered wedge enumeration
    (operators/graph_motifs.py:cosupply_triangles). The unipartite
    complement of the butterfly counter: orientation bounds wedge
    fan-out by O(E^1.5); the naive triple-join oracle hash-matching
    proves the oriented enumeration exact."""
    from .operators.graph_motifs import cosupply_triangles

    return cosupply_triangles(spark, sf_dir)


def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding statistics [dim, mean, std, min_v,
    max_v] -- the feature-normalization fit (what a standardizing
    preprocessor broadcasts back to scale vectors). posexplode over
    the cast-to-double array, ONE aggregate pass for count / decimal
    sums / extrema per dim (64 groups); float->double widening is
    exact in both engines, sums use the round-9dp decimal recipe,
    variance is the one-pass (E[x^2] - E[x]^2) form with identical
    double op order, clamped at 0 before sqrt."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "e")
    )
    st = emb.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("e"), 9).cast("decimal(20,9)"))
        .cast("string")
        .cast("double")
        .alias("s"),
        F.sum(F.round(F.col("e") * F.col("e"), 9).cast("decimal(20,9)"))
        .cast("string")
        .cast("double")
        .alias("sq"),
        F.min("e").alias("min_v"),
        F.max("e").alias("max_v"),
    )
    var = (F.col("sq") - F.col("s") * F.col("s") / F.col("n")) / F.col("n")
    return st.select(
        "dim",
        F.round(F.col("s") / F.col("n"), 9).alias("mean"),
        F.round(F.sqrt(F.greatest(F.lit(0.0), var)), 9).alias("std"),
        "min_v",
        "max_v",
    ).orderBy("dim")


def q_embedding_dim_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix over the first 8 embedding
    dimensions: [dim_i, dim_j, n, r] for i < j (28 pairs) -- the
    feature-redundancy screen run before whitening/PCA decisions,
    extending embedding_dim_stats' per-dim moments to CROSS moments.
    Determinism: float->double widening is exact, each product is
    rounded 9dp and summed as DECIMAL(20,9) (the dim_stats recipe,
    order-independent), the five sufficient statistics are
    string-routed doubles, and r is one fixed-shape IEEE expression
    (num / sqrt(varx * vary)) on identical inputs. Shapes: one
    posexplode restricted to dims < 8, a vec_id self-join (8 rows x
    8 rows per vector), one partial-agg'd groupBy to the 28-pair
    grain."""
    ex = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "dim", "e"
            ),
        )
        .filter(F.col("dim") < 8)
    )
    a = ex.select(
        "vec_id", F.col("dim").alias("dim_i"), F.col("e").alias("xi")
    )
    b = ex.select(
        "vec_id", F.col("dim").alias("dim_j"), F.col("e").alias("xj")
    )
    pairs = a.join(b, "vec_id").filter(F.col("dim_i") < F.col("dim_j"))

    def dsum(c):
        return (
            F.sum(F.round(c, 9).cast("decimal(20,9)"))
            .cast("string")
            .cast("double")
        )

    st = pairs.groupBy("dim_i", "dim_j").agg(
        F.count("*").alias("n"),
        dsum(F.col("xi")).alias("sx"),
        dsum(F.col("xj")).alias("sy"),
        dsum(F.col("xi") * F.col("xj")).alias("sxy"),
        dsum(F.col("xi") * F.col("xi")).alias("sxx"),
        dsum(F.col("xj") * F.col("xj")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = nd * F.col("syy") - F.col("sy") * F.col("sy")
    return st.select(
        "dim_i",
        "dim_j",
        "n",
        F.round(num / F.sqrt(varx * vary), 9).alias("r"),
    ).orderBy("dim_i", "dim_j")


def q_user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user: the
    day-grain gaps-and-islands (distinct active days; island anchor =
    day minus its per-user rank, constant exactly on consecutive
    runs). [user_id, n_active_days, longest_streak]. One user-keyed
    shuffle reused by the rank window and both aggregates."""
    from pyspark.sql import Window

    days = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    runs = islands.groupBy("user_id", "anchor").agg(
        F.count("*").alias("run_len")
    )
    return (
        runs.groupBy("user_id")
        .agg(
            F.sum("run_len").cast("long").alias("n_active_days"),
            F.max("run_len").alias("longest_streak"),
        )
        .orderBy(F.desc("longest_streak"), F.asc("user_id"))
    )


def q_funnel_strict_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict ORDERED funnel: signup -> first view strictly after ->
    first purchase strictly after that, with the purchase inside 7
    days of the signup. [stage, n_users, rate] where rate converts
    from the previous stage. Unlike signup_funnel's two-milestone
    form, each stage anchors on the PREVIOUS stage's first-qualifying
    timestamp: one user-keyed conditional min per stage, chained by
    user-keyed joins -- no event self-join, no window over the full
    stream; counts are 1-row aggregates broadcast into the 3-row
    report."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 7 DAYS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n1 = s.agg(F.count("*").alias("n1"))
    n2 = v.agg(F.count("*").alias("n2"))
    n3 = p.agg(F.count("*").alias("n3"))
    base = F.broadcast(n1).crossJoin(F.broadcast(n2)).crossJoin(F.broadcast(n3))
    return base.selectExpr(
        """stack(3,
           '1_signup', n1, CAST(1.0 AS DOUBLE),
           '2_view_after_signup', n2, n2 / n1,
           '3_purchase_within_7d', n3, n3 / n2
        ) AS (stage, n_users, rate)"""
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: [event_type, next_type, n_transitions, p] where p =
    P(next | current). One lead() window keyed on user (the
    sessionize shuffle, reused shape) + two tiny type-pair
    aggregates; the user-behavior model every funnel/anomaly
    analysis starts from. p is exact-integer division -> identical
    doubles both engines."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    nxt = ev.withColumn("next_type", F.lead("event_type").over(w)).filter(
        F.col("next_type").isNotNull()
    )
    c = nxt.groupBy("event_type", "next_type").agg(
        F.count("*").alias("n_transitions")
    )
    tot = c.groupBy("event_type").agg(F.sum("n_transitions").alias("t"))
    return (
        c.join(tot, "event_type")
        .select(
            "event_type",
            "next_type",
            "n_transitions",
            (F.col("n_transitions") / F.col("t")).alias("p"),
        )
        .orderBy("event_type", "next_type")
    )


def q_event_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state transition-entropy of the first-order Markov chain
    over per-user event sequences (the event_transitions matrix,
    reduced): H(state) = -sum_next p*ln(p) in nats -- how predictable
    a user's next action is given the current one (uniform next-state
    = max entropy; funnel-like flows = near 0). One lead() window
    (the sessionize shuffle), two type-pair aggregates; each entropy
    term rides as round(.,9) DECIMAL so the sum is order-independent
    (the doc_perplexity recipe) and is string-routed back to double.
    p itself is exact-integer division -> identical doubles both
    engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    nxt = ev.withColumn("next_type", F.lead("event_type").over(w)).filter(
        F.col("next_type").isNotNull()
    )
    c = nxt.groupBy("event_type", "next_type").agg(
        F.count("*").alias("_n")
    )
    tot = c.groupBy("event_type").agg(
        F.sum("_n").alias("_t"), F.count("*").alias("n_next_types")
    )
    p = F.col("_n") / F.col("_t")
    term = F.round(-(p * F.log(p)), 9).cast("decimal(12,9)")
    return (
        c.join(tot, "event_type")
        .groupBy("event_type")
        .agg(
            F.max("_t").alias("n_transitions"),
            F.max("n_next_types").alias("n_next_types"),
            F.sum(term).cast("string").cast("double").alias("entropy_nats"),
        )
        .orderBy("event_type")
    )


def q_purchase_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities over the bipartite purchase graph
    (operators/hits.py): 3 max-normalized rounds, decimal-summed
    contributions (pagerank recipe), [node_type, node_key, score].
    The oracle unrolls the 3 rounds as MATERIALIZED CTEs."""
    from .operators.hits import hits_scores

    return hits_scores(spark, sf_dir, iters=3)


def _hits_ctes(iters: int = 3) -> str:
    """Unrolled max-normalized HITS oracle (see operators/hits.py)."""
    parts = [
        """
  WITH e AS MATERIALIZED (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
  h0 AS MATERIALIZED (SELECT DISTINCT c, CAST(1.0 AS DOUBLE) AS h FROM e)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
  ar{i} AS MATERIALIZED (
    SELECT s, CAST(CAST(sum(CAST(round(h, 9) AS DECIMAL(20,9))) AS VARCHAR) AS DOUBLE) AS ar
    FROM e JOIN h{i-1} USING (c) GROUP BY s),
  a{i} AS MATERIALIZED (
    SELECT s, ar / (SELECT max(ar) FROM ar{i}) AS a FROM ar{i}),
  hr{i} AS MATERIALIZED (
    SELECT c, CAST(CAST(sum(CAST(round(a, 9) AS DECIMAL(20,9))) AS VARCHAR) AS DOUBLE) AS hr
    FROM e JOIN a{i} USING (s) GROUP BY c),
  h{i} AS MATERIALIZED (
    SELECT c, hr / (SELECT max(hr) FROM hr{i}) AS h FROM hr{i})"""
        )
    parts.append(
        f"""
  SELECT 'hub' AS node_type, c AS node_key, round(h, 9) AS score FROM h{iters}
  UNION ALL
  SELECT 'authority', s, round(a, 9) FROM a{iters}"""
    )
    return "".join(parts)


def q_cosupply_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-core of the thresholded co-supply graph
    (operators/graph_motifs.kcore): iterative peeling to fixpoint,
    loud on non-convergence. EAGER (each round pins + counts). The
    oracle unrolls 8 peeling rounds as CTEs — more than any tested
    SF needs (4 at sf0.01); extra rounds are no-ops at fixpoint, so
    the hash match proves the loop's stopping rule exact."""
    from .operators.graph_motifs import cosupply_kcore

    return cosupply_kcore(spark, sf_dir, k=8)


def _kcore_ctes(k: int = 8, rounds: int = 8) -> str:
    """Unrolled peeling oracle over the shared co-supply edge CTEs."""
    parts = [
        """
  WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
  w AS (SELECT a.s AS s1, b.s AS s2, count(*) AS c
        FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s GROUP BY 1, 2),
  t AS (SELECT CAST(sum(c) AS DOUBLE) / count(*) * 1.1 AS thr FROM w),
  e0 AS (SELECT s1, s2 FROM w, t WHERE c >= thr)"""
    ]
    for i in range(1, rounds + 1):
        # MATERIALIZED: each round references its predecessor 3x; an
        # inlined chain re-expands the base scan exponentially (4^8
        # lineitem reads blew the fd limit), a materialized one is
        # linear in rounds
        parts.append(
            f""",
  d{i} AS MATERIALIZED (SELECT v, count(*) AS dg FROM (SELECT s1 AS v FROM e{i-1}
           UNION ALL SELECT s2 FROM e{i-1}) GROUP BY 1),
  e{i} AS MATERIALIZED (SELECT s1, s2 FROM e{i-1}
           WHERE s1 IN (SELECT v FROM d{i} WHERE dg >= {k})
             AND s2 IN (SELECT v FROM d{i} WHERE dg >= {k}))"""
        )
    parts.append(
        f"""
  SELECT v AS suppkey, count(*) AS core_deg
  FROM (SELECT s1 AS v FROM e{rounds} UNION ALL SELECT s2 FROM e{rounds})
  GROUP BY 1"""
    )
    return "".join(parts)


REACH_NATION = "NATION_19"
REACH_HOPS = 3


def q_supplier_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blast-radius reachability: BFS hop distance over the co-supply
    graph from every supplier in one nation (the risk-contagion
    question: if NATION_19's suppliers fail, which suppliers are 1, 2,
    3 co-supply hops away?). operators/graph_motifs.bfs_hops --
    synchronous frontier BFS, node-sized joins, per-round
    materialization. EAGER (each round pins). Oracle unrolls the 3
    rounds as materialized CTEs."""
    from .operators.graph_motifs import bfs_hops, cosupply_edges

    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == REACH_NATION
    )
    sources = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("s_suppkey").alias("suppkey"))
    )
    return bfs_hops(
        cosupply_edges(spark, sf_dir), sources, max_hops=REACH_HOPS
    )


def _bfs_ctes(rounds: int = REACH_HOPS) -> str:
    """Unrolled frontier-BFS oracle over the shared co-supply edge
    CTEs (sources = REACH_NATION's suppliers)."""
    parts = [
        f"""
  WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
  w AS (SELECT a.s AS s1, b.s AS s2, count(*) AS c
        FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s GROUP BY 1, 2),
  t AS (SELECT CAST(sum(c) AS DOUBLE) / count(*) * 1.1 AS thr FROM w),
  e AS MATERIALIZED (SELECT s1, s2 FROM w, t WHERE c >= thr),
  und AS MATERIALIZED (SELECT s1 AS u, s2 AS v FROM e
                       UNION ALL SELECT s2, s1 FROM e),
  v0 AS MATERIALIZED (SELECT DISTINCT s_suppkey AS suppkey
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = '{REACH_NATION}'),
  seen0 AS MATERIALIZED (SELECT suppkey FROM v0)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
  f{i} AS MATERIALIZED (SELECT DISTINCT und.v AS suppkey
    FROM und JOIN {"v0" if i == 1 else f"f{i-1}"} fr ON und.u = fr.suppkey
    WHERE und.v NOT IN (SELECT suppkey FROM seen{i-1})),
  seen{i} AS MATERIALIZED (SELECT suppkey FROM seen{i-1}
    UNION ALL SELECT suppkey FROM f{i})"""
        )
    tail = "\n  UNION ALL\n".join(
        [f"  SELECT suppkey, CAST(0 AS BIGINT) AS hops FROM v0"]
        + [
            f"  SELECT suppkey, CAST({i} AS BIGINT) FROM f{i}"
            for i in range(1, rounds + 1)
        ]
    )
    return "".join(parts) + "\n" + tail


def q_supplier_cheapest_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted blast radius (graph_motifs.sssp_min_cost): cheapest
    <= 3-hop Bellman-Ford path cost from NATION_19's suppliers over
    the co-supply graph, edge cost = (max co-supply weight + 1) - c
    (strongest tie = cheapest hop). All-integer min-plus -- exact;
    the oracle unrolls the 3 relaxation rounds as MATERIALIZED
    CTEs."""
    from .operators.graph_motifs import cosupply_cheapest_reach

    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == REACH_NATION
    )
    sources = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("s_suppkey").alias("suppkey"))
    )
    return cosupply_cheapest_reach(
        spark, sf_dir, sources, rounds=REACH_HOPS
    )


def _sssp_ctes(rounds: int = REACH_HOPS) -> str:
    """Unrolled Bellman-Ford oracle over the weighted co-supply CTEs
    (sources = REACH_NATION's suppliers at cost 0)."""
    parts = [
        f"""
  WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
  w AS (SELECT a.s AS s1, b.s AS s2, count(*) AS c
        FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s GROUP BY 1, 2),
  t AS (SELECT CAST(sum(c) AS DOUBLE) / count(*) * 1.1 AS thr FROM w),
  e AS MATERIALIZED (SELECT s1, s2, c FROM w, t WHERE c >= thr),
  mx AS (SELECT max(c) + 1 AS mx FROM e),
  we AS MATERIALIZED (SELECT s1, s2, CAST(mx.mx - c AS BIGINT) AS wt
                      FROM e, mx),
  und AS MATERIALIZED (SELECT s1 AS u, s2 AS v, wt FROM we
                       UNION ALL SELECT s2, s1, wt FROM we),
  d0 AS MATERIALIZED (SELECT DISTINCT s_suppkey AS suppkey,
                             CAST(0 AS BIGINT) AS mc
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = '{REACH_NATION}')"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
  d{i} AS MATERIALIZED (
    SELECT suppkey, CAST(min(mc) AS BIGINT) AS mc FROM (
      SELECT suppkey, mc FROM d{i-1}
      UNION ALL
      SELECT und.v, d{i-1}.mc + und.wt FROM und
      JOIN d{i-1} ON und.u = d{i-1}.suppkey)
    GROUP BY 1)"""
        )
    parts.append(
        f"""
  SELECT suppkey, mc AS min_cost FROM d{rounds}"""
    )
    return "".join(parts)


def q_market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-priori pair stage with association metrics
    (operators/basket.py): top part pairs by lift among pairs
    co-ordered >= 2 times; support pruning applied before any metric
    join. All ratios are exact-integer inputs into double division,
    so the lift ordering is engine-identical."""
    from .operators.basket import market_basket_pairs

    return market_basket_pairs(spark, sf_dir)


def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association rules (operators/basket.association_rules):
    top-50 part rules by lift with support/confidence/lift/leverage/
    conviction; conviction is NULL for exact rules (confidence = 1),
    integer-equality guarded. The direction flip reuses the pruned
    pair aggregate -- no second pass over lineitem."""
    from .operators.basket import association_rules

    return association_rules(spark, sf_dir)


def q_cosupply_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction (operators/linkpred.py): top-20 NON-adjacent
    supplier pairs of the thresholded co-supply graph by Adamic-Adar,
    with common-neighbor count and Jaccard. Adamic-Adar is a 9dp
    decimal sum string-routed to double (order-independent); Jaccard
    is a single int/int IEEE division shipped unrounded. The oracle
    is the naive wedge-join in SQL; the hash match proves the
    anti-join + degree arithmetic exact."""
    from .operators.linkpred import cosupply_link_prediction

    return cosupply_link_prediction(spark, sf_dir, top_n=20)


def q_cosupply_link_prediction_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB wiring of link prediction (VERDICT r6 #5): wedge
    CENTERS with degree > 256 are dropped before the self-join, so
    per-center fan-out is bounded by C(256, 2) regardless of hub size
    -- tools/linkpred_probe.py measured one 8000-degree hub producing
    32M of 40M wedges (and an OOM at 4M edges) in the exact form, and
    11x speedup from a cap at 1M edges. Cap choice: the sf0.1
    co-supply graph's degree floor is 134 (min/median/max =
    134/296/559), so the r6-suggested 64 empties the benched result;
    256 keeps the sub-median half of centers while still bounding a
    100TB hub to 32k wedges. The cap is embedded in the oracle's
    wedge CTE, so the approximate-by-design path stays
    hash-checkable; `cosupply_link_prediction` remains the exact
    oracle-of-record twin."""
    from .operators.linkpred import cosupply_link_prediction

    return cosupply_link_prediction(spark, sf_dir, top_n=20, max_degree=256)


def q_score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-corrected ROC AUC (operators/evalmetrics.py) of the
    document-length score n_chars predicting lang='en' -- the
    quality-gate evaluation primitive. One row [n_pos, n_neg, u2,
    auc]; u2 = 2U stays exact-integer DECIMAL, auc is one fixed IEEE
    double chain. The oracle computes the same per-distinct-score
    aggregate form with a native window; the hash match proves the
    two-level bucketed cumulative sum exact."""
    from .operators.evalmetrics import auc_rank_sum

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )
    return auc_rank_sum(docs)


def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins (operators/evalmetrics.py) for the
    rational pseudo-probability p = n_chars / (n_chars + 300)
    predicting lang='en' (monotone in length, purely rational -- no
    transcendental, so both engines compute bit-identical p). 10
    bins; mean_p via 9dp-decimal accumulation string-routed to
    double."""
    from .operators.evalmetrics import calibration_bins

    docs = load_table(spark, sf_dir, "documents")
    p = F.col("n_chars").cast("double") / (
        F.col("n_chars") + F.lit(300)
    ).cast("double")
    return calibration_bins(docs, p, (F.col("lang") == "en").cast("int"))


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact directed set-containment join at C >= 9/10
    (operators/setjoin.containment_prefix_pairs): the asymmetric
    near-dup Jaccard cannot see -- a chunk quoted whole inside a
    larger document. Probe-side-only prefix filter (rarest tokens),
    integer threshold predicate. The oracle is the NAIVE all-pairs
    SQL; the hash match proves the prefix filter lossless."""
    from .operators.setjoin import containment_prefix_pairs

    return containment_prefix_pairs(load_table(spark, sf_dir, "documents"))


def q_lang_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of each language's unigram
    distribution: [lang, n_tokens, vocab, entropy_bits]. The
    compressibility/diversity gauge of a corpus slice (entropy is
    the lower bound on bits-per-token any tokenizer can reach). One
    tokenize pass (the shared with_token_array barrier), p = one
    int/int division per distinct (lang, word), -p*log2(p) rounded
    9dp into the order-independent decimal sum."""
    docs = with_token_array(load_table(spark, sf_dir, "documents"))
    cnt = (
        docs.select("lang", F.explode("toks").alias("w"))
        .groupBy("lang", "w")
        .agg(F.count("*").alias("c"))
    )
    tot = cnt.groupBy("lang").agg(
        F.sum("c").alias("n_tokens"), F.count("*").alias("vocab")
    )
    p = F.col("c").cast("double") / F.col("n_tokens").cast("double")
    term = F.round(-(p * F.log2(p)), 9).cast("decimal(12,9)")
    return (
        cnt.join(F.broadcast(tot), "lang")
        .groupBy("lang", "n_tokens", "vocab")
        .agg(
            F.sum(term).cast("string").cast("double").alias("entropy_bits")
        )
        .orderBy("lang")
    )


def q_lang_lexical_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-richness profile per language: [lang, n_tokens,
    n_types, n_hapax, ttr, hapax_share] -- type-token ratio and the
    hapax-legomena share (words seen exactly once), the classic
    corpus-linguistics vocabulary-growth gauges and the frequency-
    spectrum companions to lang_token_entropy (entropy summarizes
    the whole distribution; TTR/hapax read its head and tail). All
    counts are exact integers off the SAME one-tokenize-pass shape
    as the entropy query; the two ratios are single int/int IEEE
    divisions, identical cross-engine. Output grain |langs|."""
    docs = with_token_array(load_table(spark, sf_dir, "documents"))
    cnt = (
        docs.select("lang", F.explode("toks").alias("w"))
        .groupBy("lang", "w")
        .agg(F.count("*").alias("c"))
    )
    return (
        cnt.groupBy("lang")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_types"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_hapax"),
        )
        .select(
            "lang",
            "n_tokens",
            "n_types",
            "n_hapax",
            (F.col("n_types").cast("double") / F.col("n_tokens").cast("double")).alias(
                "ttr"
            ),
            (F.col("n_hapax").cast("double") / F.col("n_types").cast("double")).alias(
                "hapax_share"
            ),
        )
        .orderBy("lang")
    )


K_ANON = 10


def q_k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer table under the
    quasi-identifier (nation, market segment, balance rounded to
    1000): one row [k, n_groups, n_violating_groups, rows_at_risk,
    min_group_size] -- the privacy gate a training-data release runs
    before shipping joined user attributes. Pure integer aggregate
    over quasi-identifier groups (one partial-agg'd shuffle on the
    quasi key); rows_at_risk = rows in groups smaller than k, the
    re-identifiable population."""
    cust = load_table(spark, sf_dir, "customer")
    groups = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias("bal_k"),
    ).agg(F.count("*").alias("g"))
    return groups.agg(
        F.lit(K_ANON).alias("k"),
        F.count("*").alias("n_groups"),
        F.sum((F.col("g") < K_ANON).cast("long")).alias("n_violating_groups"),
        F.sum(F.when(F.col("g") < K_ANON, F.col("g")).otherwise(F.lit(0))).alias(
            "rows_at_risk"
        ),
        F.min("g").alias("min_group_size"),
    )


def q_parts_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto inventory classification: rank parts by revenue
    desc, class A = parts up to 80% cumulative revenue share, B to
    95%, C the tail; one row per class [abc_class, n_parts, revenue,
    revenue_share]. Exactness: per-item revenue in integer MICROS
    (the scale-6 decimal product x 1e6 is integral), the cumulative
    sum rides the two-level bucketed machinery (operators/ranking.py
    -- no part row crosses SinglePartition), and the 80/95 boundaries
    are INTEGER comparisons (5*cum <= 4*tot, 20*cum <= 19*tot): no
    division decides a class. ANSI mode makes a 2^63 overflow of the
    micro sums loud, not silent."""
    from .operators.ranking import bucket_offsets, bucketize_by_key

    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(8,4)") - F.col("l_discount").cast("decimal(8,4)")
    )
    pr = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum((rev * F.lit(1_000_000)).cast("long")).alias("micros")
    )
    bk = bucketize_by_key(pr, "micros", ascending=False)
    offs = bucket_offsets(bk, weight=F.col("micros"))
    w = (
        Window.partitionBy("_bkt")
        .orderBy(F.asc("_ak"), F.asc("partkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        bk.withColumn("_lc", F.sum("micros").over(w))
        .join(F.broadcast(offs), "_bkt")
        .select(
            "partkey",
            "micros",
            (F.col("_off") + F.col("_lc")).alias("cm"),
            F.col("_tot").alias("tot"),
        )
    )
    cls = F.when(F.lit(5) * F.col("cm") <= F.lit(4) * F.col("tot"), "A").when(
        F.lit(20) * F.col("cm") <= F.lit(19) * F.col("tot"), "B"
    ).otherwise("C")
    return (
        cum.groupBy(cls.alias("abc_class"))
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("micros").alias("_mi"),
            F.max("tot").alias("_tot"),
        )
        .select(
            "abc_class",
            "n_parts",
            (F.col("_mi").cast("double") / F.lit(1_000_000.0)).alias("revenue"),
            (F.col("_mi").cast("double") / F.col("_tot").cast("double")).alias(
                "revenue_share"
            ),
        )
        .orderBy("abc_class")
    )


def q_customer_spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini coefficient of customer spend concentration: one
    row [n_customers, total_cents, gini], G = (2*S - (n+1)*T) /
    (n*T) with S = sum of rank_i * spend_i (ranks ascending), all in
    exact integer/decimal arithmetic (rank x cents products as
    DECIMAL(38,0), the score_auc recipe) -- gini is one division of
    the two routed exact numbers. Ranks come from the two-level
    global row_number (operators/ranking.py): no customer row
    crosses SinglePartition. Ties in spend are rank-order-invariant
    for S (consecutive ranks times equal spend), tie-broken by
    custkey for determinism anyway."""
    from .operators.ranking import with_global_row_number

    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * F.lit(100))
                .cast("long")
            ).alias("cents")
        )
    )
    ranked = with_global_row_number(
        spend, "cents", tiebreaks=(F.asc("custkey"),), out_col="rn"
    )
    # 2*rn folded into the per-row term: a later 2 * S would need
    # precision 57 > 38; (2*rn) x cents stays dec(18)+dec(19) -> 38
    s2_term = (F.lit(2) * F.col("rn")).cast("decimal(18,0)") * F.col(
        "cents"
    ).cast("decimal(19,0)")
    agg = ranked.agg(
        F.count("*").alias("n_customers"),
        F.sum("cents").alias("total_cents"),
        F.sum(s2_term).cast("decimal(38,0)").alias("_s2"),
    )
    num = (
        F.col("_s2")
        - (F.col("n_customers") + F.lit(1)).cast("decimal(18,0)")
        * F.col("total_cents").cast("decimal(19,0)")
    )
    den = F.col("n_customers").cast("decimal(18,0)") * F.col(
        "total_cents"
    ).cast("decimal(19,0)")
    return agg.select(
        "n_customers",
        "total_cents",
        (
            num.cast("string").cast("double")
            / den.cast("string").cast("double")
        ).alias("gini"),
    )


def q_doc_length_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of document length across languages:
    each doc's n_chars is replaced by the GLOBAL length at the same
    quantile position -- rank r of m within its lang maps to the
    global order statistic at k = ceil(r*N/m) -- so every language's
    length distribution becomes the corpus-wide one while each doc
    keeps its within-language rank (the cross-batch feature
    alignment standard in ML preprocessing). Exactness: SELECTION,
    never interpolation -- k is integer ceiling arithmetic
    ((r*N + m - 1) div m, ANSI raises if r*N ever exceeds 2^63
    rather than wrapping), and the normalized value is a length that
    EXISTS in the corpus. Ranks break ties by doc_id on both sides,
    so the map is deterministic. Shapes: per-lang ranks are one
    lang-keyed window; the global rank table rides the two-level
    bucketed machinery (operators/ranking.py -- no doc row crosses
    SinglePartition); the final attach is one equi-join on k."""
    from .operators.ranking import with_global_row_number

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    wl = Window.partitionBy("lang").orderBy(F.asc("n_chars"), F.asc("doc_id"))
    wm = Window.partitionBy("lang")
    local = docs.withColumn("_r", F.row_number().over(wl)).withColumn(
        "_m", F.count("*").over(wm)
    )
    glob = with_global_row_number(
        docs.select(F.col("doc_id").alias("_gid"), F.col("n_chars").alias("_gv")),
        "_gv",
        tiebreaks=(F.asc("_gid"),),
        out_col="_k",
        total_col="_N",
    ).select("_k", F.col("_gv").alias("norm_n_chars"), "_N")
    n_total = glob.select(F.max("_N").alias("_N"))
    keyed = local.crossJoin(F.broadcast(n_total)).withColumn(
        "_k",
        F.expr("(_r * _N + _m - 1) div _m"),
    )
    return (
        keyed.join(glob.drop("_N"), "_k")
        .select("doc_id", "lang", "n_chars", "norm_n_chars")
        .orderBy("doc_id")
    )


def q_customer_spend_theil(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of customer spend: one row
    [n_customers, total_cents, theil], T = sum_i s_i * ln(s_i * n)
    with s_i = spend_i / total -- the entropy-based inequality
    measure that DECOMPOSES across subgroups (unlike
    customer_spend_gini), completing the concentration family
    gini / lorenz / theil. Determinism: s_i and s_i*n are divisions
    and products of exact longs (identical doubles cross-engine);
    the one transcendental ln is rounded 9dp per row, the per-row
    term again 9dp, and the terms sum EXACTLY as DECIMAL(20,9)
    (the lang_token_entropy recipe) -- string-routed out. One
    partial-agg'd pass to customer grain, a broadcast 1-row totals
    join, one final partial-agg'd sum. Zero-spend rows are excluded
    by construction (x ln x -> 0)."""
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * F.lit(100))
                .cast("long")
            ).alias("cents")
        )
    )
    tot = spend.agg(
        F.count("*").alias("n_customers"),
        F.sum("cents").alias("total_cents"),
    )
    cd = F.col("cents").cast("double")
    nd = F.col("n_customers").cast("double")
    td = F.col("total_cents").cast("double")
    lr = F.round(F.log(cd * nd / td), 9)
    term9 = F.round((cd / td) * lr, 9).cast("decimal(20,9)")
    return (
        spend.filter(F.col("cents") > 0)
        .crossJoin(F.broadcast(tot))
        .groupBy("n_customers", "total_cents")
        .agg(
            F.sum(term9).cast("string").cast("double").alias("theil")
        )
        .select("n_customers", "total_cents", "theil")
    )


def q_customer_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-D skyline (Pareto frontier) of customers over (total spend,
    order count, recency): no customer in the answer is beaten on all
    three axes by another (operators/skyline.py, grid-pruned exact
    form). All dims are exact integers (cents, counts, epoch days) so
    dominance is engine-independent; the quadratic NOT-EXISTS oracle
    doubles as the proof that grid pruning is lossless."""
    from .operators.skyline import skyline

    agg = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * F.lit(100))
                .cast("long")
            ).alias("spend_cents"),
            F.count("*").alias("n_orders"),
            F.datediff(
                F.max(F.col("o_orderdate").cast("date")),
                F.lit("1970-01-01").cast("date"),
            ).cast("long").alias("last_day"),
        )
    )
    return skyline(agg, ["spend_cents", "n_orders", "last_day"]).orderBy(
        F.desc("spend_cents"), "custkey"
    )


def q_part_sales_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline of parts over (units shipped, revenue): the
    sort/staircase form (operators/skyline.skyline_2d) -- two window
    functions over the part-grain aggregate, zero self-joins. The
    windowed pass runs at part grain (already reduced rows); the
    grid-pruned `skyline` is the scale path when even the aggregate
    grain is too large for a global sort."""
    from .operators.skyline import skyline_2d

    agg = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,0)"))
            .cast("long").alias("total_qty"),
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,2)") * F.lit(100))
                .cast("long")
            ).alias("revenue_cents"),
        )
    )
    return skyline_2d(agg, "total_qty", "revenue_cents").orderBy(
        F.desc("total_qty"), "partkey"
    )


def q_cosupply_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per supplier in the co-supply
    graph (graph_motifs.clustering_coefficients): triangle side
    reuses the degree-oriented O(E^1.5) enumeration, coefficient is
    one long/long IEEE division shipped unrounded."""
    from .operators.graph_motifs import clustering_coefficients, cosupply_edges

    return clustering_coefficients(cosupply_edges(spark, sf_dir))


def q_nation_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation monthly-revenue trend: closed-form OLS slope /
    intercept / r^2 over (month index, revenue micros) via
    operators/regression.ols_fit -- one aggregation pass computes the
    sufficient statistics for every nation at once; no per-group
    iteration. Revenue lands as exact integer micros (per-row
    decimal product x 1e6), month index is integral, so all six OLS
    sums are exact and both engines divide identical routed doubles.
    The nation dim is broadcast; the orders->customer join flows into
    the one groupBy shuffle."""
    from .operators.regression import ols_fit

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev_micros = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(8,4)") - F.col("l_discount").cast("decimal(8,4)"))
        * F.lit(1000000).cast("decimal(7,0)")
    ).cast("decimal(25,0)")
    monthly = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            (
                (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
                - F.lit(1992 * 12 + 1)
            ).cast("long").alias("month_idx"),
        )
        .agg(F.sum(rev_micros).cast("decimal(25,0)").alias("rev_micros"))
    )
    return ols_fit(monthly, ["nation"], "month_idx", "rev_micros").orderBy(
        "nation"
    )


def q_zipf_word_fit(spark: SparkSession, sf_dir: str, top_n: int = 500) -> DataFrame:
    """Zipf's-law fit of the corpus: OLS slope of ln(count) on
    ln(rank) over the top-N words -- the standard log-log diagnostic
    (slope near -1 on natural text). Ranks come from a window over
    the LIMITed top-N (reduced rows -- the full vocab never crosses a
    global sort); ln terms are rounded to 9dp and summed as DECIMAL
    (order-independent), and slope/intercept/r2 are IEEE expressions
    over the string-routed exact sums, identical in both engines."""
    wc = q_wordcount(spark, sf_dir)
    top = wc.orderBy(F.desc("cnt"), "word").limit(top_n)
    w = Window.orderBy(F.desc("cnt"), "word")
    pts = top.select(
        F.round(F.log(F.row_number().over(w).cast("double")), 9)
        .cast("decimal(12,9)").alias("lx"),
        F.round(F.log(F.col("cnt").cast("double")), 9)
        .cast("decimal(12,9)").alias("ly"),
    )
    agg = pts.agg(
        F.count("*").alias("n_words"),
        F.sum("lx").cast("decimal(22,9)").alias("_sx"),
        F.sum("ly").cast("decimal(22,9)").alias("_sy"),
        F.sum(F.col("lx") * F.col("ly")).cast("decimal(32,18)").alias("_sxy"),
        F.sum(F.col("lx") * F.col("lx")).cast("decimal(32,18)").alias("_sxx"),
        F.sum(F.col("ly") * F.col("ly")).cast("decimal(32,18)").alias("_syy"),
    )

    def sdbl(c):
        return c.cast("string").cast("double")

    n = F.col("n_words").cast("double")
    sx, sy = sdbl(F.col("_sx")), sdbl(F.col("_sy"))
    sxy, sxx, syy = sdbl(F.col("_sxy")), sdbl(F.col("_sxx")), sdbl(F.col("_syy"))
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    return agg.select(
        "n_words",
        (num / den).alias("slope"),
        ((sy * sxx - sx * sxy) / den).alias("intercept"),
        (num * num / (den * (n * syy - sy * sy))).alias("r2"),
    )


def q_heaps_law_fit(spark: SparkSession, sf_dir: str, n_buckets: int = 256) -> DataFrame:
    """Heaps'-law fit of vocabulary growth: OLS of ln(cumulative
    distinct types) on ln(cumulative tokens) over the corpus in
    doc_id order -- V = K * n^beta, the standard sublinear
    vocabulary-growth diagnostic (beta ~ 0.4-0.6 on natural text)
    and zipf_word_fit's companion. One row [n_docs, total_tokens,
    total_types, heaps_beta, heaps_ln_k, r2].

    Scale shape: tokens shuffle once on word for first-occurrence
    docs (min(doc_id) per type -- the dedup_exact shuffle), once on
    doc_id for per-doc counts; the cumulative curve uses the
    two-level bucketed cumsum (ranking.bucket_offsets) so NO
    doc-grain row crosses a single partition -- the same machinery
    score_auc rides. ln terms are 9dp-decimal (order-independent
    sums, string-routed) and the fit is the zipf IEEE chain."""
    from .operators.normalize import normalized_col
    from .operators.ranking import bucket_offsets, bucketize_by_key
    from .operators.tokenize import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(tokens_col(normalized_col(F.col("text")))).alias("word"),
    )
    per_doc = toks.groupBy("doc_id").agg(F.count("*").alias("tok_n"))
    firsts = toks.groupBy("word").agg(F.min("doc_id").alias("doc_id"))
    newt = firsts.groupBy("doc_id").agg(F.count("*").alias("types_new"))
    base = per_doc.join(newt, "doc_id", "left").select(
        "doc_id",
        "tok_n",
        F.coalesce("types_new", F.lit(0)).alias("types_new"),
    )
    bk = bucketize_by_key(base, "doc_id", n_buckets=n_buckets)
    off_t = bucket_offsets(bk, weight=F.col("tok_n")).select(
        "_bkt", F.col("_off").alias("_offt")
    )
    off_v = bucket_offsets(bk, weight=F.col("types_new")).select(
        "_bkt", F.col("_off").alias("_offv")
    )
    w = (
        Window.partitionBy("_bkt")
        .orderBy(F.asc("_ak"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        bk.withColumn("_ctl", F.sum("tok_n").over(w))
        .withColumn("_cvl", F.sum("types_new").over(w))
        .join(F.broadcast(off_t), "_bkt")
        .join(F.broadcast(off_v), "_bkt")
        .select(
            (F.col("_offt") + F.col("_ctl")).alias("ct"),
            (F.col("_offv") + F.col("_cvl")).alias("cv"),
        )
    )
    pts = cum.select(
        "ct",
        "cv",
        F.round(F.log(F.col("ct").cast("double")), 9)
        .cast("decimal(12,9)")
        .alias("lx"),
        F.round(F.log(F.col("cv").cast("double")), 9)
        .cast("decimal(12,9)")
        .alias("ly"),
    )
    agg = pts.agg(
        F.count("*").alias("n_docs"),
        F.max("ct").alias("total_tokens"),
        F.max("cv").alias("total_types"),
        F.sum("lx").cast("decimal(22,9)").alias("_sx"),
        F.sum("ly").cast("decimal(22,9)").alias("_sy"),
        F.sum(F.col("lx") * F.col("ly")).cast("decimal(32,18)").alias("_sxy"),
        F.sum(F.col("lx") * F.col("lx")).cast("decimal(32,18)").alias("_sxx"),
        F.sum(F.col("ly") * F.col("ly")).cast("decimal(32,18)").alias("_syy"),
    )

    def sdbl(c):
        return c.cast("string").cast("double")

    n = F.col("n_docs").cast("double")
    sx, sy = sdbl(F.col("_sx")), sdbl(F.col("_sy"))
    sxy, sxx, syy = sdbl(F.col("_sxy")), sdbl(F.col("_sxx")), sdbl(F.col("_syy"))
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    return agg.select(
        "n_docs",
        "total_tokens",
        "total_types",
        (num / den).alias("heaps_beta"),
        ((sy * sxx - sx * sxy) / den).alias("heaps_ln_k"),
        (num * num / (den * (n * syy - sy * sy))).alias("r2"),
    )


def q_ngram_novelty(spark: SparkSession, sf_dir: str, n: int = 4) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's DISTINCT
    word 4-grams never seen in any earlier document (doc_id order) --
    the within-corpus contamination/memorization screen a training
    pipeline runs before trusting "new" data (low novelty = the doc
    is stitched from text already in the corpus; the span-level
    sibling of duplicate_spans). [doc_id, n_grams, n_seen_before,
    novelty], docs with >= n tokens only.

    Scale shape: gram construction is a JVM-side HOF over the token
    array (no Python); one shuffle on the gram key for
    first-occurrence (min doc_id), one gram-keyed join back, one
    doc-grain aggregate. novelty = exact-int difference over
    exact-int count -> one IEEE division."""
    from .operators.normalize import normalized_col
    from .operators.tokenize import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", tokens_col(normalized_col(F.col("text"))).alias("t")
    ).filter(F.size("t") >= n)
    grams = sized.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {n - 1}),"
                f" i -> concat_ws(' ', slice(t, i, {n})))"
            )
        ).alias("gram"),
    ).distinct()
    first = grams.groupBy("gram").agg(F.min("doc_id").alias("_fd"))
    return (
        grams.join(first, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(F.col("_fd") < F.col("doc_id"), 1).otherwise(0)
            ).cast("long").alias("n_seen_before"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_seen_before",
            (
                (F.col("n_grams") - F.col("n_seen_before")).cast("double")
                / F.col("n_grams")
            ).alias("novelty"),
        )
        # no presentation orderBy: a corpus-sized output would pay a
        # full range exchange for nothing (gate hash is order-free)
    )


def q_events_acf(spark: SparkSession, sf_dir: str, max_lag: int = 7) -> DataFrame:
    """Exact daily-count autocorrelogram per event type at lags 1..7
    (operators/acf.py): counts land on a dense zero-filled day spine
    (types x days -- metadata-sized), then the mean-cleared integer
    form makes every numerator/denominator an exact decimal; one IEEE
    division per (type, lag). The spine guarantees the complete-series
    contract the ACF formula assumes."""
    from .operators.acf import autocorrelation

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("y"))
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("_d0"), F.max(F.to_date("ts")).alias("_d1")
    )
    days = bounds.select(
        F.explode(F.sequence(F.col("_d0"), F.col("_d1"))).alias("day"), "_d0"
    )
    types = ev.select("event_type").distinct()
    series = (
        types.crossJoin(F.broadcast(days))
        .join(counts, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.datediff("day", "_d0").cast("long").alias("t"),
            F.coalesce("y", F.lit(0)).cast("long").alias("y"),
        )
    )
    return autocorrelation(series, "event_type", "t", "y", max_lag=max_lag)


def q_user_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier user-churn survival table
    (operators/survival.py): lifetimes = first->last active day per
    user, censored within 7 days of the corpus edge; the curve ships
    in log form (9dp-rounded ln factors summed as DECIMAL) -- the one
    unguarded cross-engine exp() is deliberately left to callers."""
    from .operators.survival import kaplan_meier, user_lifetimes

    return kaplan_meier(user_lifetimes(load_table(spark, sf_dir, "events")))


def q_user_hazard_na(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative churn hazard
    (operators/survival.nelson_aalen) over the SAME right-censored
    user lifetimes as the KM query: H(t) = sum d/n over event times
    <= t -- the hazard-rate companion (-ln KM ~ H). Every increment
    is one long/long IEEE division, 12dp-decimal cumulative sum,
    no transcendental anywhere; duration-grain windows only."""
    from .operators.survival import nelson_aalen, user_lifetimes

    return nelson_aalen(user_lifetimes(load_table(spark, sf_dir, "events")))


def q_score_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-aware average precision
    (operators/evalmetrics.average_precision) of the document-length
    score n_chars predicting lang='en' -- the PR-curve companion of
    score_auc (AP weights the head of the ranking; AUC weights every
    pair). Block convention: rows tied at a score are ONE operating
    point, so the metric is deterministic without any within-tie
    order. One row [n_pos, n_total, ap]; descending cumulatives ride
    the two-level bucketed cumsum."""
    from .operators.evalmetrics import average_precision

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )
    return average_precision(docs)


def q_score_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gain/lift deciles (operators/evalmetrics.lift_table) of the
    n_chars score predicting lang='en': [decile, n_rows, n_pos,
    resp_rate, lift, cum_capture] with decile 0 the highest-scored
    slice -- the campaign-targeting readout of the same ranking
    score_auc grades. Deciles are block-assigned by integer division
    of the strictly-above count (ties never split; no per-row global
    rank anywhere)."""
    from .operators.evalmetrics import lift_table

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )
    return lift_table(docs)


def q_term_chi2_keywords(
    spark: SparkSession, sf_dir: str, top_k: int = 10, min_count: int = 5
) -> DataFrame:
    """Top-k chi-square keyword terms per language -- the classic
    feature-selection / keyness screen (Manning & Schuetze ch. 5)
    over token-instance contingency tables: for each (lang, word),
    a = count(w in lang), b = count(w elsewhere), with lang/word
    marginals lt/wt and corpus total N,

        chi2 = N * (a*d - b*c)^2 / (wt * (N-wt) * lt * (N-lt))

    -- every input an EXACT integer count, the statistic one fixed
    IEEE chain, identical cross-engine. [lang, rank, word, n_in_lang,
    chi2] for the top_k terms per language (chi2 desc, word asc
    tie-break), candidates pruned to a >= min_count.

    Scale shape: one tokenize pass to (lang, word) grain; word
    marginals are a vocab-grain groupBy joined back on word; lang
    marginals broadcast. The final per-lang top-k window sorts
    vocab-grain rows partitioned by lang -- bounded by vocabulary,
    never the corpus."""
    docs = with_token_array(load_table(spark, sf_dir, "documents"))
    cnt = (
        docs.select("lang", F.explode("toks").alias("w"))
        .groupBy("lang", "w")
        .agg(F.count("*").alias("a"))
    )
    ltot = cnt.groupBy("lang").agg(F.sum("a").alias("lt"))
    wtot = cnt.groupBy("w").agg(F.sum("a").alias("wt"))
    ntot = ltot.agg(F.sum("lt").alias("nn"))
    j = (
        cnt.filter(F.col("a") >= min_count)
        .join(F.broadcast(ltot), "lang")
        .join(wtot, "w")
        .crossJoin(F.broadcast(ntot))
    )
    ad = F.col("a").cast("double") * (
        F.col("nn") - F.col("lt") - (F.col("wt") - F.col("a"))
    ).cast("double")
    bc = (F.col("wt") - F.col("a")).cast("double") * (
        F.col("lt") - F.col("a")
    ).cast("double")
    diff = ad - bc
    chi2 = (
        F.col("nn").cast("double")
        * (diff * diff)
        / (
            F.col("wt").cast("double")
            * (F.col("nn") - F.col("wt")).cast("double")
            * F.col("lt").cast("double")
            * (F.col("nn") - F.col("lt")).cast("double")
        )
    )
    ranked = j.withColumn("chi2", chi2).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(F.desc("chi2"), F.asc("w"))
        ),
    )
    return (
        ranked.filter(F.col("rank") <= top_k)
        .select(
            "lang",
            F.col("rank").cast("long").alias("rank"),
            F.col("w").alias("word"),
            F.col("a").alias("n_in_lang"),
            "chi2",
        )
        .orderBy("lang", "rank")
    )


def q_lang_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence (nats) between the unigram
    distributions of every language pair: [lang_a, lang_b, n_words,
    jsd_nats] -- the symmetric, bounded (<= ln 2) corpus-distance
    matrix behind mixture design and drift review (Lin 1991). For
    each pair, JSD = 0.5 KL(P||M) + 0.5 KL(Q||M), M = (P+Q)/2;
    absent words contribute p*ln(2)/2 via the same expression (q=0
    branch guarded to 0). Each word's contribution is one fixed IEEE
    chain rounded 12dp into an order-independent DECIMAL sum.

    Scale shape: one tokenize pass to (lang, word) grain; the pair
    matrix is |langs|^2/2 rows broadcast against it, so the working
    grain is vocab x pairs -- bounded by vocabulary times a constant,
    never corpus rows."""
    docs = with_token_array(load_table(spark, sf_dir, "documents"))
    cnt = (
        docs.select("lang", F.explode("toks").alias("w"))
        .groupBy("lang", "w")
        .agg(F.count("*").alias("c"))
    )
    tot = cnt.groupBy("lang").agg(F.sum("c").alias("n"))
    p = cnt.join(F.broadcast(tot), "lang").select(
        "lang", "w", (F.col("c").cast("double") / F.col("n").cast("double")).alias("p")
    )
    langs = tot.select("lang")
    pairs = langs.select(F.col("lang").alias("la")).join(
        F.broadcast(langs.select(F.col("lang").alias("lb"))),
        F.col("la") < F.col("lb"),
    )
    a = p.join(F.broadcast(pairs), F.col("lang") == F.col("la")).select(
        "la", "lb", "w", F.col("p").alias("pa")
    )
    b = p.join(F.broadcast(pairs), F.col("lang") == F.col("lb")).select(
        "la", "lb", "w", F.col("p").alias("pb")
    )
    j = (
        a.join(b, ["la", "lb", "w"], "full")
        .withColumn("pa", F.coalesce("pa", F.lit(0.0)))
        .withColumn("pb", F.coalesce("pb", F.lit(0.0)))
    )
    m = (F.col("pa") + F.col("pb")) / F.lit(2.0)
    contrib = (
        F.when(
            F.col("pa") > 0.0,
            F.lit(0.5) * F.col("pa") * F.log(F.col("pa") / m),
        ).otherwise(F.lit(0.0))
        + F.when(
            F.col("pb") > 0.0,
            F.lit(0.5) * F.col("pb") * F.log(F.col("pb") / m),
        ).otherwise(F.lit(0.0))
    )
    term = F.round(contrib, 12).cast("decimal(16,12)")
    return (
        j.groupBy(F.col("la").alias("lang_a"), F.col("lb").alias("lang_b"))
        .agg(
            F.count("*").alias("n_words"),
            F.sum(term).cast("string").cast("double").alias("jsd_nats"),
        )
        .orderBy("lang_a", "lang_b")
    )


def q_linkage_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood linkage
    (operators/linkage.sorted_neighborhood_pairs) over the SAME
    FEBRL-style master/corrupted-contacts pair as record_linkage_fs:
    one global bal-sorted sequence (two-level bucketed ranks), pairs
    within 10 rank positions scored with the shared FS weights. The
    point is the documented recall hole of the blocking join --
    balance nudges that cross a floor(bal) boundary -- which this
    query recovers and flags via cross_block. Top-100 report."""
    from .operators.linkage import sorted_neighborhood_pairs

    master, contacts = _linkage_frames(spark, sf_dir)
    return sorted_neighborhood_pairs(master, contacts)


def q_nation_revenue_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear (double) exponential smoothing per nation over the
    SAME exact monthly integer-micros revenue series as the OLS and
    Theil-Sen trend queries -- the classic adaptive level+trend
    forecaster (Holt 1957). alpha = beta = 0.5 (exact binary) and
    every recursion step rounds to the thousand-micros grain
    (round(x, -3)): each state value is an exact-integer-valued
    double below 2^53, every multiply-by-0.5 and add is EXACT IEEE,
    so the whole recursion is bit-identical cross-engine with no
    libm, no rounding-mode edge, and no decimal accumulator. Output
    [nation, n_months, level, trend, forecast_next] (forecast = one
    exact add), nations with >= 2 observed months; gaps in the
    calendar are treated as consecutive observations (documented
    smoothing-over-observations convention).

    Scale shape: the fact-scale work is the one monthly groupBy; the
    recursion folds a <= calendar-months array per nation via
    F.aggregate, JVM-side, no driver loop and no per-step shuffle.
    The oracle is a recursive CTE stepping the same arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev_micros = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(8,4)") - F.col("l_discount").cast("decimal(8,4)"))
        * F.lit(1000000).cast("decimal(7,0)")
    ).cast("decimal(25,0)")
    monthly = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            (
                (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
                - F.lit(1992 * 12 + 1)
            ).cast("long").alias("x"),
        )
        .agg(
            F.sum(rev_micros)
            .cast("decimal(25,0)")
            .cast("string")
            .cast("double")
            .alias("yd")
        )
    )
    arr = F.sort_array(F.collect_list(F.struct("x", "yd")))
    g = (
        monthly.groupBy("nation")
        .agg(F.count("*").alias("n_months"), arr.alias("_a"))
        .filter(F.col("n_months") >= 2)
    )
    half = F.lit(0.5)

    def lvl(acc, e):
        return F.round(half * e["yd"] + half * (acc["l"] + acc["b"]), -3)

    init = F.struct(
        F.element_at(F.col("_a"), 2)["yd"].alias("l"),
        (
            F.element_at(F.col("_a"), 2)["yd"]
            - F.element_at(F.col("_a"), 1)["yd"]
        ).alias("b"),
    )
    rest = F.slice(F.col("_a"), F.lit(3), F.size(F.col("_a")) - F.lit(2))
    folded = F.aggregate(
        rest,
        init,
        lambda acc, e: F.struct(
            lvl(acc, e).alias("l"),
            F.round(
                half * (lvl(acc, e) - acc["l"]) + half * acc["b"], -3
            ).alias("b"),
        ),
    )
    return (
        g.withColumn("_h", folded)
        .select(
            "nation",
            "n_months",
            F.col("_h.l").alias("level"),
            F.col("_h.b").alias("trend"),
            (F.col("_h.l") + F.col("_h.b")).alias("forecast_next"),
        )
        .orderBy("nation")
    )


def q_feature_information_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information gain (mutual information, nats) of three document
    features for predicting lang='en' -- the feature-selection
    primitive of a quality-classifier pipeline: which cheap signals
    carry label information at all. Features: len_bucket
    (least(9, n_chars DIV 200), a fixed INTEGER bucketing -- no
    data-driven boundary), has_digit (regex class presence), and the
    source column as-is. IG = H(Y) - H(Y|X) with every entropy term
    -(k/n) ln(k/n) computed from exact integer counts, rounded 9dp
    into order-independent DECIMAL sums, string-routed.

    Scale shape: stack() fans each row into 3 (feature, val) rows
    once; one partial-agg'd groupBy to (feature, val, y) cell grain;
    marginals are re-aggregations of the cell table (category-
    cardinality-sized). Output 3 rows [feature, h_y, h_y_given_x,
    ig_nats]."""
    docs = load_table(spark, sf_dir, "documents")
    f = docs.select(
        F.expr(
            "stack(3,"
            " 'has_digit', CASE WHEN text RLIKE '[0-9]' THEN 'y' ELSE 'n' END,"
            " 'len_bucket', CAST(least(9, n_chars DIV 200) AS STRING),"
            " 'source', source) AS (feature, val)"
        ),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    cells = f.groupBy("feature", "val", "y").agg(F.count("*").alias("nxy"))
    nx = cells.groupBy("feature", "val").agg(F.sum("nxy").alias("nx"))
    nf = cells.groupBy("feature").agg(F.sum("nxy").alias("n"))
    term = F.round(
        -(F.col("nxy").cast("double") / F.col("n").cast("double"))
        * F.log(F.col("nxy").cast("double") / F.col("nx").cast("double")),
        9,
    ).cast("decimal(12,9)")
    hyx = (
        cells.join(nx, ["feature", "val"])
        .join(F.broadcast(nf), "feature")
        .groupBy("feature")
        .agg(F.sum(term).alias("_hyx"))
    )
    lab = docs.groupBy((F.col("lang") == "en").cast("int").alias("y")).agg(
        F.count("*").alias("ny")
    )
    ntot = lab.agg(F.sum("ny").alias("n"))
    hterm = F.round(
        -(F.col("ny").cast("double") / F.col("n").cast("double"))
        * F.log(F.col("ny").cast("double") / F.col("n").cast("double")),
        9,
    ).cast("decimal(12,9)")
    hy = lab.crossJoin(F.broadcast(ntot)).agg(F.sum(hterm).alias("_hy"))

    def sdbl(c):
        return c.cast("string").cast("double")

    return (
        hyx.crossJoin(F.broadcast(hy))
        .select(
            "feature",
            sdbl(F.col("_hy")).alias("h_y"),
            sdbl(F.col("_hyx")).alias("h_y_given_x"),
            (sdbl(F.col("_hy")) - sdbl(F.col("_hyx"))).alias("ig_nats"),
        )
        .orderBy("feature")
    )


def q_term_keyness_g2(
    spark: SparkSession, sf_dir: str, top_k: int = 10, min_count: int = 5
) -> DataFrame:
    """Top-k keyness terms per language by the Dunning log-likelihood
    ratio G2 = 2 * sum over the 2x2 table of O ln(O/E) (Dunning 1993,
    "Accurate Methods for the Statistics of Surprise and
    Coincidence") -- the low-count-honest companion of
    term_chi2_keywords (chi-square overstates rare-event surprise;
    G2 is the likelihood-ratio form). Same exact token-instance
    contingency counts; each of the four O ln(O/E) terms (zero cells
    contribute 0) is rounded 9dp into a DECIMAL per-word G2, and the
    per-lang ranking happens ON that exact decimal -- ulp-identical
    ordering cross-engine with word-asc tie-break. [lang, rank, word,
    n_in_lang, g2]; candidates pruned to a >= min_count.

    Scale shape: identical to term_chi2_keywords -- everything after
    the tokenize pass lives at (lang, word) / vocab grain."""
    docs = with_token_array(load_table(spark, sf_dir, "documents"))
    cnt = (
        docs.select("lang", F.explode("toks").alias("w"))
        .groupBy("lang", "w")
        .agg(F.count("*").alias("a"))
    )
    ltot = cnt.groupBy("lang").agg(F.sum("a").alias("lt"))
    wtot = cnt.groupBy("w").agg(F.sum("a").alias("wt"))
    ntot = ltot.agg(F.sum("lt").alias("nn"))
    j = (
        cnt.filter(F.col("a") >= min_count)
        .join(F.broadcast(ltot), "lang")
        .join(wtot, "w")
        .crossJoin(F.broadcast(ntot))
        .withColumn("b", F.col("wt") - F.col("a"))
        .withColumn("c", F.col("lt") - F.col("a"))
        .withColumn("d", F.col("nn") - F.col("lt") - (F.col("wt") - F.col("a")))
    )

    def gterm(o, r, cc):
        e = (r.cast("double") * cc.cast("double")) / F.col("nn").cast("double")
        return F.when(
            o > 0,
            F.round(
                F.lit(2.0) * o.cast("double") * F.log(o.cast("double") / e), 9
            ),
        ).otherwise(F.lit(0.0)).cast("decimal(20,9)")

    lt, wt, nn = F.col("lt"), F.col("wt"), F.col("nn")
    g2d = (
        gterm(F.col("a"), lt, wt)
        + gterm(F.col("b"), nn - lt, wt)
        + gterm(F.col("c"), lt, nn - wt)
        + gterm(F.col("d"), nn - lt, nn - wt)
    )
    ranked = j.withColumn("_g2", g2d).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(F.desc("_g2"), F.asc("w"))
        ),
    )
    return (
        ranked.filter(F.col("rank") <= top_k)
        .select(
            "lang",
            F.col("rank").cast("long").alias("rank"),
            F.col("w").alias("word"),
            F.col("a").alias("n_in_lang"),
            F.col("_g2").cast("string").cast("double").alias("g2"),
        )
        .orderBy("lang", "rank")
    )


def q_nation_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per nation over the SAME monthly
    revenue series as nation_revenue_trend's OLS: the median of all
    pairwise slopes (rev_j - rev_i) / (month_j - month_i) -- the
    29%-breakdown estimator a single promo-spike month cannot drag
    (Theil 1950, Sen 1968). [nation, n_months, n_pairs,
    theil_sen_slope]; the median is the LOWER median by integer-rank
    selection over exact pair-slope doubles (the events_anomaly_mad
    convention -- no midpoint interpolation to diverge cross-engine).

    Scale shape: the fact-scale work is the one monthly-revenue
    groupBy (exact integer micros); pair enumeration and median
    selection happen at nation x month grain (C(n_months, 2) pairs
    per nation, bounded by the calendar, never row counts). The pair
    self-join is an equi-join on nation."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev_micros = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(8,4)") - F.col("l_discount").cast("decimal(8,4)"))
        * F.lit(1000000).cast("decimal(7,0)")
    ).cast("decimal(25,0)")
    monthly = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            (
                (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
                - F.lit(1992 * 12 + 1)
            ).cast("long").alias("x"),
        )
        .agg(F.sum(rev_micros).cast("decimal(25,0)").alias("y"))
    )
    lhs = monthly.select(
        "nation", F.col("x").alias("x1"), F.col("y").alias("y1")
    )
    rhs = monthly.select(
        "nation", F.col("x").alias("x2"), F.col("y").alias("y2")
    )
    slopes = (
        lhs.join(rhs, "nation")
        .filter(F.col("x1") < F.col("x2"))
        .select(
            "nation",
            (
                (F.col("y2") - F.col("y1"))
                .cast("decimal(26,0)")
                .cast("string")
                .cast("double")
                / (F.col("x2") - F.col("x1")).cast("double")
            ).alias("slope"),
        )
    )
    sc = slopes.groupBy("nation", "slope").agg(F.count("*").alias("cnt"))
    tot = sc.groupBy("nation").agg(F.sum("cnt").alias("np"))
    w_cm = (
        Window.partitionBy("nation")
        .orderBy("slope")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    med = (
        sc.withColumn("cm", F.sum("cnt").over(w_cm))
        .join(F.broadcast(tot), "nation")
        .filter(
            F.col("cm")
            >= F.floor((F.col("np") + 1) / F.lit(2.0)).cast("long")
        )
        .groupBy("nation")
        .agg(F.min("slope").alias("theil_sen_slope"))
    )
    months = monthly.groupBy("nation").agg(F.count("*").alias("n_months"))
    return (
        months.join(F.broadcast(tot), "nation")
        .join(med, "nation")
        .select(
            "nation",
            "n_months",
            F.col("np").alias("n_pairs"),
            "theil_sen_slope",
        )
        .orderBy("nation")
    )


def q_lang_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased Simpson concentration per language: D = sum c(c-1) /
    (n(n-1)) -- the probability two tokens drawn WITHOUT replacement
    are the same type -- plus the inverse-Simpson effective
    vocabulary 1/D (Hill number of order 2), the concentration-side
    companions of lang_token_entropy (entropy reads the whole
    distribution; Simpson squares the head). ALL arithmetic is exact
    integers (c(c-1) products as DECIMAL(38,0)) until the one final
    division chain -- no transcendental, no rounding convention
    needed. [lang, n_tokens, vocab, simpson, inv_simpson]; n <= 1
    languages ship NULL (undefined without-replacement draw)."""
    docs = with_token_array(load_table(spark, sf_dir, "documents"))
    cnt = (
        docs.select("lang", F.explode("toks").alias("w"))
        .groupBy("lang", "w")
        .agg(F.count("*").alias("c"))
    )
    s2 = (
        F.col("c").cast("decimal(19,0)")
        * (F.col("c") - F.lit(1)).cast("decimal(19,0)")
    ).cast("decimal(38,0)")
    g = cnt.groupBy("lang").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("vocab"),
        F.sum(s2).cast("decimal(38,0)").alias("_s2"),
    )
    simpson = F.when(
        F.col("n_tokens") > 1,
        F.col("_s2").cast("string").cast("double")
        / (
            F.col("n_tokens").cast("double")
            * (F.col("n_tokens") - F.lit(1)).cast("double")
        ),
    )
    return g.select(
        "lang",
        "n_tokens",
        "vocab",
        simpson.alias("simpson"),
        F.when(
            (F.col("n_tokens") > 1) & (F.col("_s2") > 0),
            F.lit(1.0) / simpson,
        ).alias("inv_simpson"),
    ).orderBy("lang")


def q_brand_revenue_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration audit per supplier nation: the Herfindahl
    -Hirschman index over part-brand revenue shares (HHI = sum
    share_i^2, the antitrust-screening statistic) plus the CR4
    four-brand concentration ratio. Shares never materialize:
    HHI = sum(rev_i^2) / (sum rev_i)^2 on exact integer micros
    (DECIMAL(38,0) squares, HUGEINT twin), so the only IEEE work is
    one fixed division chain; CR4's top-4 pick is a brand-grain
    window with rev-desc brand-asc deterministic tie-break.
    [nation, n_brands, hhi, cr4].

    Scale shape: one fact-scale groupBy to (nation, brand) grain
    after broadcast dim joins; everything else (windows, squares,
    ratios) lives on that nations x brands table."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    rev_micros = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(8,4)") - F.col("l_discount").cast("decimal(8,4)"))
        * F.lit(1000000).cast("decimal(7,0)")
    ).cast("decimal(25,0)")
    nb = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("p_brand").alias("brand"))
        .agg(F.sum(rev_micros).cast("decimal(25,0)").alias("rev"))
    )
    w_rank = Window.partitionBy("nation").orderBy(
        F.desc("rev"), F.asc("brand")
    )
    ranked = nb.withColumn("_rk", F.row_number().over(w_rank))
    # Square at the native decimal(25,0) grain, capped to decimal(38,0).
    # A per-cell revenue >= 1e19 micros would overflow the 38-digit
    # square; rather than letting non-ANSI Spark null it (and the sum
    # silently skip the cell), raise loudly at the offending row. The
    # DuckDB oracle's HUGEINT square survives past this bound, so a
    # silent null here would surface as a confusing hash mismatch.
    _hhi_sq_bound = F.lit("9999999999999999999").cast("decimal(25,0)")
    sq = F.when(
        F.col("rev") <= _hhi_sq_bound,
        (F.col("rev") * F.col("rev")).cast("decimal(38,0)"),
    ).otherwise(
        F.raise_error(
            F.lit(
                "brand_revenue_hhi: per-(nation,brand) revenue >= 1e19 "
                "micros overflows the decimal(38,0) square"
            )
        ).cast("decimal(38,0)")
    )
    g = ranked.groupBy("nation").agg(
        F.count("*").alias("n_brands"),
        F.sum("rev").cast("decimal(35,0)").alias("_s1"),
        F.sum(sq).cast("decimal(38,0)").alias("_s2"),
        F.sum(F.when(F.col("_rk") <= 4, F.col("rev")).otherwise(F.lit(0)))
        .cast("decimal(35,0)")
        .alias("_t4"),
    )

    def sdbl(c):
        return c.cast("string").cast("double")

    return g.select(
        "nation",
        "n_brands",
        (
            sdbl(F.col("_s2")) / (sdbl(F.col("_s1")) * sdbl(F.col("_s1")))
        ).alias("hhi"),
        (sdbl(F.col("_t4")) / sdbl(F.col("_s1"))).alias("cr4"),
    ).orderBy("nation")


def q_events_run_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length profile of each event type: consecutive same-type
    runs inside each user's stream (the gaps-and-islands pattern at
    event grain -- user_activity_streaks' twin on the type axis, the
    repetition diagnostic behind rage-click / retry-storm review).
    Boundary = type change or stream start (one lag() on the
    user-keyed total order), run id = running boundary count, runs
    collapse via one (user, run, type) groupBy. [event_type, n_runs,
    longest_run, mean_run_len]; mean = exact total/runs division
    (every event is in exactly one run)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    b = ev.withColumn("_prev", F.lag("event_type").over(w)).withColumn(
        "_bnd",
        (
            F.col("_prev").isNull() | (F.col("_prev") != F.col("event_type"))
        ).cast("long"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = (
        b.withColumn("_run", F.sum("_bnd").over(w_run))
        .groupBy("user_id", "_run", "event_type")
        .agg(F.count("*").alias("_len"))
    )
    return (
        runs.groupBy("event_type")
        .agg(
            F.count("*").alias("n_runs"),
            F.max("_len").alias("longest_run"),
            (
                F.sum("_len").cast("double") / F.count("*").cast("double")
            ).alias("mean_run_len"),
        )
        .orderBy("event_type")
    )


def q_events_ewma_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart (Roberts 1959) over each event type's
    daily value volume: z_t = round(0.5 x_t + 0.5 z_{t-1}) with x_t
    the day's total value in exact integer MICROS -- the same
    all-exact recursion discipline as nation_revenue_holt (alpha
    exact-binary, states integer-valued doubles < 2^53, tie rounding
    probed identical cross-engine), so the smoothing is bit-identical
    with no decimal accumulator and no libm. Output [event_type,
    n_days, ewma_last_micros, max_abs_dev_micros] where max_abs_dev
    is the largest one-step |x_t - z_{t-1}| surprise the chart saw --
    the control-limit numerator.

    Scale shape: one fact-scale groupBy to (type, day) grain (value
    6dp-decimal-summed exactly, scaled to BIGINT micros); the
    recursion folds a <= calendar-days array per type JVM-side."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            (
                F.sum(F.round("value", 6).cast("decimal(18,6)"))
                .cast("decimal(20,6)")
                * F.lit(1000000).cast("decimal(7,0)")
            )
            .cast("long")
            .cast("double")
            .alias("x")
        )
    )
    arr = F.sort_array(F.collect_list(F.struct("day", "x")))
    g = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"), arr.alias("_a")
    )
    half = F.lit(0.5)
    init = F.struct(
        F.element_at(F.col("_a"), 1)["x"].alias("z"),
        F.lit(0.0).alias("md"),
    )
    rest = F.slice(F.col("_a"), F.lit(2), F.size(F.col("_a")) - F.lit(1))
    folded = F.aggregate(
        rest,
        init,
        lambda acc, e: F.struct(
            F.round(half * e["x"] + half * acc["z"], 0).alias("z"),
            F.greatest(acc["md"], F.abs(e["x"] - acc["z"])).alias("md"),
        ),
    )
    return (
        g.withColumn("_f", folded)
        .select(
            "event_type",
            "n_days",
            F.col("_f.z").alias("ewma_last_micros"),
            F.col("_f.md").alias("max_abs_dev_micros"),
        )
        .orderBy("event_type")
    )


def q_segment_order_gap_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-cadence profile per market segment: the distribution
    of days between a customer's consecutive orders -- median and p90
    by INTEGER-RANK SELECTION (the shipping_delay_profile /
    events_anomaly_mad convention: no interpolation, no float rank),
    mean from exact integer day sums. The replenishment-cycle readout
    behind inventory and win-back timing. [segment, n_gaps,
    mean_gap_days, median_gap_days, p90_gap_days].

    Scale shape: consecutive-order gaps are one lag() on the
    custkey-keyed total order (uniform key, one shuffle); the
    segment attach is a customer-grain equi-join; percentiles ride
    the (segment, distinct-gap) grain -- bounded by the calendar,
    never order rows."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    gaps = (
        orders.withColumn("_prev", F.lag("o_orderdate").over(w))
        .filter(F.col("_prev").isNotNull())
        .select(
            "o_custkey",
            F.datediff("o_orderdate", "_prev").cast("long").alias("gap"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("segment", "gap")
        .agg(F.count("*").alias("cnt"))
    )
    tot = gaps.groupBy("segment").agg(
        F.sum("cnt").alias("n_gaps"),
        F.sum(F.col("gap") * F.col("cnt")).alias("_sum_gap"),
    )
    w_cm = (
        Window.partitionBy("segment")
        .orderBy("gap")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = gaps.withColumn("cm", F.sum("cnt").over(w_cm)).join(
        F.broadcast(tot), "segment"
    )
    p50 = (
        cum.filter(
            F.col("cm")
            >= F.floor((F.col("n_gaps") + 1) / F.lit(2.0)).cast("long")
        )
        .groupBy("segment")
        .agg(F.min("gap").alias("median_gap_days"))
    )
    p90 = (
        cum.filter(F.col("cm") * 10 >= F.col("n_gaps") * 9)
        .groupBy("segment")
        .agg(F.min("gap").alias("p90_gap_days"))
    )
    return (
        tot.join(p50, "segment")
        .join(p90, "segment")
        .select(
            "segment",
            "n_gaps",
            (
                F.col("_sum_gap").cast("double")
                / F.col("n_gaps").cast("double")
            ).alias("mean_gap_days"),
            "median_gap_days",
            "p90_gap_days",
        )
        .orderBy("segment")
    )


def q_customer_value_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year value-quintile migration matrix: customers
    ranked into spend quintiles within 1995 and within 1996 (exact
    integer cents, rank by spend desc with custkey tie-break,
    quintile = 5*(rn-1) DIV n -- an INTEGER boundary, no ntile() and
    no float), then the 1995 -> 1996 transition counts over customers
    active in both years -- the churn-risk migration table of CRM
    practice (diagonal = retained tier, below-diagonal = upgraded).
    [q_1995, q_1996, n_customers] ordered by both tiers.

    Scale shape: per-year ranks ride the GROUP-SCOPED two-level
    bucketed machinery (bucketize group_cols=[yr]: per-year
    1024-bucket ladders, windows partitioned by (yr, bucket) -- no
    per-year SinglePartition sort of the customer grain); the pivot
    is one self-equi-join on custkey at customer grain."""
    from .operators.ranking import bucket_offsets, bucketize_by_key

    orders = load_table(spark, sf_dir, "orders")
    spend = (
        orders.filter(F.year("o_orderdate").isin(1995, 1996))
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                    "decimal(25,0)"
                )
            )
            .cast("decimal(25,0)")
            .cast("string")
            .cast("double")
            .alias("cents")
        )
    )
    bk = bucketize_by_key(spend, "cents", ascending=False, group_cols=["yr"])
    offs = bucket_offsets(bk, group_cols=["yr"])
    w_loc = Window.partitionBy("yr", "_bkt").orderBy(
        F.asc("_ak"), F.asc("custkey")
    )
    ranked = (
        bk.withColumn("_lrn", F.row_number().over(w_loc))
        .join(offs, ["yr", "_bkt"])
        .select(
            "custkey",
            "yr",
            F.least(
                F.lit(4),
                F.expr("5 * (_off + _lrn - 1) DIV _tot"),
            ).cast("long").alias("q"),
        )
    )
    a = ranked.filter(F.col("yr") == 1995).select(
        "custkey", F.col("q").alias("q_1995")
    )
    b = ranked.filter(F.col("yr") == 1996).select(
        "custkey", F.col("q").alias("q_1996")
    )
    return (
        a.join(b, "custkey")
        .groupBy("q_1995", "q_1996")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("q_1995", "q_1996")
    )


def q_customer_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: customers grouped by
    first-order month, cumulative revenue per cohort member tracked
    over cohort age in months -- the user_retention counting curve
    upgraded to money (the LTV readout subscription finance runs).
    Revenue is exact integer CENTS (o_totalprice is 2dp by
    construction); the cumulative sum is a window over the
    (cohort, age) grain -- bounded by calendar^2/2, never orders --
    and the per-member division is the only IEEE op.
    [cohort_month, age_months, n_active, cohort_size, rev_cents,
    cum_ltv_cents_per_customer].

    Scale shape: first-order month is one min() groupBy on custkey
    (uniform key); the order->cohort attach is an equi-join flowing
    into the one (cohort, age) groupBy; windows never touch order
    rows."""
    orders = load_table(spark, sf_dir, "orders")
    midx = (
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        - F.lit(1992 * 12 + 1)
    ).cast("long")
    om = orders.select(
        "o_custkey",
        midx.alias("_m"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("_cents"),
    )
    firsts = om.groupBy("o_custkey").agg(F.min("_m").alias("cohort"))
    sizes = firsts.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
    cells = (
        om.join(firsts, "o_custkey")
        .groupBy("cohort", (F.col("_m") - F.col("cohort")).alias("age_months"))
        .agg(
            F.countDistinct("o_custkey").alias("n_active"),
            F.sum(F.col("_cents").cast("decimal(25,0)"))
            .cast("decimal(25,0)")
            .alias("_rev"),
        )
    )
    w_cum = (
        Window.partitionBy("cohort")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cells.join(F.broadcast(sizes), "cohort")
        .withColumn("_cum", F.sum("_rev").over(w_cum))
        .select(
            F.col("cohort").alias("cohort_month"),
            "age_months",
            "n_active",
            "cohort_size",
            F.col("_rev").cast("string").cast("double").alias("rev_cents"),
            (
                F.col("_cum").cast("string").cast("double")
                / F.col("cohort_size").cast("double")
            ).alias("cum_ltv_cents_per_customer"),
        )
        .orderBy("cohort_month", "age_months")
    )


def q_session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce-rate profile by session ENTRY event type: sessionize
    each user's stream on the repo's 30-minute gap convention (the
    events_sessionize lag shape), take each session's first event
    type as its landing page, and report how often that entry ends
    the session immediately (n_events = 1) -- the funnel-entry
    quality readout. [entry_type, n_sessions, n_bounces, bounce_rate,
    mean_events_per_session]; both ratios exact long/long IEEE
    divisions.

    Scale shape: the sessionize lag and the session-id running count
    share ONE user-keyed window shuffle; sessions collapse via one
    (user, session) groupBy with a min(struct) entry pick (no second
    window)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = ev.withColumn(
        "_st", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).withColumn("_sid", F.sum("_st").over(w_run))
    sess = s.groupBy("user_id", "_sid").agg(
        F.count("*").alias("_n"),
        F.min(
            F.struct(
                F.col("ts").alias("t"),
                F.col("event_id").alias("e"),
                F.col("event_type").alias("v"),
            )
        )["v"].alias("entry_type"),
    )
    return (
        sess.groupBy("entry_type")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum((F.col("_n") == 1).cast("long")).alias("n_bounces"),
            (
                F.sum((F.col("_n") == 1).cast("long")).cast("double")
                / F.count("*").cast("double")
            ).alias("bounce_rate"),
            (
                F.sum("_n").cast("double") / F.count("*").cast("double")
            ).alias("mean_events_per_session"),
        )
        .orderBy("entry_type")
    )


def q_shipping_delay_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship delay distribution per order month: exact mean
    plus p50/p90 by INTEGER-RANK SELECTION over the (month, distinct
    delay-days) grain -- the late_shipments count query upgraded to a
    full latency profile, with the repo's interpolation-free
    percentile convention (events_anomaly_mad): p50 = smallest delay
    with cum >= (n+1) div 2, p90 = smallest with 10*cum >= 9*n, all
    integer comparisons, no float decides a rank. [month, n_items,
    mean_delay_days, p50_delay_days, p90_delay_days].

    Scale shape: one equi-join on the uniform orderkey, one groupBy
    to (month, delay) grain (bounded by calendar x delay range);
    the percentile windows never touch lineitem rows."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    month = (
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        - F.lit(1992 * 12 + 1)
    ).cast("long")
    d = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            month.alias("month"),
            F.datediff("l_shipdate", "o_orderdate").cast("long").alias("dd"),
        )
        .groupBy("month", "dd")
        .agg(F.count("*").alias("cnt"))
    )
    tot = d.groupBy("month").agg(
        F.sum("cnt").alias("n_items"),
        F.sum(F.col("dd") * F.col("cnt")).alias("_sum_dd"),
    )
    w_cm = (
        Window.partitionBy("month")
        .orderBy("dd")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = d.withColumn("cm", F.sum("cnt").over(w_cm)).join(
        F.broadcast(tot), "month"
    )
    p50 = (
        cum.filter(
            F.col("cm")
            >= F.floor((F.col("n_items") + 1) / F.lit(2.0)).cast("long")
        )
        .groupBy("month")
        .agg(F.min("dd").alias("p50_delay_days"))
    )
    p90 = (
        cum.filter(F.col("cm") * 10 >= F.col("n_items") * 9)
        .groupBy("month")
        .agg(F.min("dd").alias("p90_delay_days"))
    )
    return (
        tot.join(p50, "month")
        .join(p90, "month")
        .select(
            "month",
            "n_items",
            (
                F.col("_sum_dd").cast("double")
                / F.col("n_items").cast("double")
            ).alias("mean_delay_days"),
            "p50_delay_days",
            "p90_delay_days",
        )
        .orderBy("month")
    )


def q_embedding_mutual_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal nearest-neighbor pairs over the embedding corpus
    (similarity.mutual_nearest_pairs): candidates come from the
    thresholded pair scan, the reciprocity filter is two node-grain
    argmax windows + one equi-join. The high-precision subset of
    embedding_dup_pairs."""
    from .operators.similarity import mutual_nearest_pairs

    pairs = embedding_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), min_cosine=0.35
    )
    return mutual_nearest_pairs(pairs)


def q_embedding_mutual_nn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB wiring of mutual-NN (VERDICT r6 #4): candidates come
    from the LSH-bucketed pair scan (pairs only form inside a
    hyperplane-sign bucket -- the embedding_dup_pairs_lsh path)
    instead of the global O(n^2) scan; the reciprocity filter
    (mutual_nearest_pairs) is unchanged node-grain windows. Recall<1
    by design but deterministic: the LCG planes are embedded in the
    oracle, so the approximate path hash-checks exactly.
    `embedding_mutual_nn` remains the exact small-corpus twin."""
    from .operators.similarity import mutual_nearest_pairs

    pairs = embedding_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), min_cosine=0.35, use_lsh=True
    )
    return mutual_nearest_pairs(pairs)


def _markov_transitions(spark: SparkSession, sf_dir: str):
    """Shared first-order event-chain pieces: (events, transition
    matrix [_s, _t2, _T], state list) -- the one corpus-scale pass is
    the lead() window; everything downstream is event-TYPE grain."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
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
    return ev, tr, states


def _absorb_p(
    tr: DataFrame, states: DataFrame, steps: int, absorb_state: str = "purchase"
) -> DataFrame:
    """`steps` unrolled value-iteration rounds of p(reach absorb_state
    within k steps) with the absorbing state clamped to 1; 12dp
    decimal per-step contributions (bit-identical cross-engine). All
    work at state grain."""
    absorb = F.when(F.col("node") == absorb_state, F.lit(1.0))

    def sdbl(col):
        return col.cast("string").cast("double")

    p = states.select("node", absorb.otherwise(F.lit(0.0)).alias("p"))
    for _ in range(steps):
        stepped = (
            tr.join(F.broadcast(p), F.col("_t2") == F.col("node"))
            .groupBy(F.col("_s").alias("node"))
            .agg(
                sdbl(
                    F.sum(
                        F.round(F.col("_T") * F.col("p"), 12).cast(
                            "decimal(24,12)"
                        )
                    )
                ).alias("_sm")
            )
        )
        p = states.join(stepped, "node", "left").select(
            "node",
            absorb.otherwise(F.coalesce("_sm", F.lit(0.0))).alias("p"),
        )
    return p


def q_event_conversion_absorption(
    spark: SparkSession, sf_dir: str, steps: int = 8
) -> DataFrame:
    """Absorbing-chain conversion probability: for each event type,
    the probability that a user's Markov walk (first-order, the
    event_transitions matrix) reaches 'purchase' within `steps`
    steps -- the attribution-modeling primitive behind Markov
    removal-effect analysis, computed by `steps` unrolled
    value-iteration rounds p_k(s) = sum_t T[s,t] * p_{k-1}(t) with
    'purchase' clamped to 1 (absorbing). ALL iteration work happens
    at event-TYPE grain (a k x k matrix, k = |event types|): the one
    corpus-scale pass is the lead() window that builds the
    transition counts. Per-step contributions are 12dp-decimal
    summed (the pagerank recipe) so every round is bit-identical
    cross-engine. [event_type, p_convert]."""
    _, tr, states = _markov_transitions(spark, sf_dir)
    p = _absorb_p(tr, states, steps)
    return p.select(
        F.col("node").alias("event_type"), F.col("p").alias("p_convert")
    ).orderBy("event_type")


# Single source of truth for the Markov removal-effect channel
# universe: the oracle SQL unrolls one absorbing-chain CTE per channel
# at authoring time, and the Spark query asserts its data-derived set
# equals this tuple (loud desync detection, advice r7).
MARKOV_ORACLE_CHANNELS = ("click", "error", "signup", "view")


def q_attribution_markov_removal(
    spark: SparkSession, sf_dir: str, steps: int = 8
) -> DataFrame:
    """Markov removal-effect channel attribution (Anderl et al.,
    "Mapping the customer journey"): credit each non-converting event
    type by how much the 8-step conversion reach drops when walks can
    no longer ENTER it. p_base = sum_s pi(s) p(s) with pi the
    first-event (journey-start) distribution and p the absorbing-
    chain reach of q_event_conversion_absorption; for each channel c,
    p_removed(c) re-runs the SAME value iteration on the transition
    matrix with every edge INTO c dropped (that probability mass
    walks to nowhere = null, the standard removal semantics) and
    drops journeys STARTING at c. Output [channel, p_base, p_removed,
    removal_effect, attribution_share] with effect = 1 - p_rm/p_base
    rounded 12dp (a nonneg decimal -- removal only deletes paths) and
    share = effect / sum(effects) on the exact decimal total
    (NULL when no channel has any effect).

    Scale shape: the two corpus passes are the transition lead()
    window and the first-event row_number -- both one user-keyed
    shuffle; EVERYTHING else (4 channels x 8 unrolled rounds) runs at
    event-TYPE grain. The |channels|-sized collect() is model state
    (the Lloyd-centroid convention), not data."""
    ev, tr, states = _markov_transitions(spark, sf_dir)

    def sdbl(col):
        return col.cast("string").cast("double")

    w_first = Window.partitionBy("user_id").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
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

    def reach(p: DataFrame, skip: str | None = None) -> DataFrame:
        src = pi if skip is None else pi.filter(F.col("node") != skip)
        return src.join(p, "node").agg(
            sdbl(
                F.sum(
                    F.round(F.col("pi") * F.col("p"), 12).cast(
                        "decimal(24,12)"
                    )
                )
            ).alias("val")
        )

    base = reach(_absorb_p(tr, states, steps)).select(
        F.col("val").alias("p_base")
    )
    channels = sorted(
        r.node for r in states.collect() if r.node != "purchase"
    )
    # The oracle pins this channel universe at authoring time (it is
    # unrolled into the SQL); if the generator's event-type set ever
    # drifts, fail HERE with both sets named instead of surfacing as
    # an inscrutable oracle hash mismatch (advice r7). Crafted-fixture
    # universes (disjoint channel names, oracle not in play) skip the
    # check; any drift of the REAL universe still overlaps and trips.
    if set(channels) & set(MARKOV_ORACLE_CHANNELS) and tuple(
        channels
    ) != MARKOV_ORACLE_CHANNELS:
        raise RuntimeError(
            "attribution_markov_removal: data-derived channel set "
            f"{tuple(channels)} != oracle's pinned universe "
            f"{MARKOV_ORACLE_CHANNELS}; regenerate the oracle via "
            "_markov_removal_sql with the new tuple"
        )
    per_channel = []
    for ch in channels:
        p_rm = _absorb_p(tr.filter(F.col("_t2") != ch), states, steps)
        per_channel.append(
            reach(p_rm, skip=ch).select(
                F.lit(ch).alias("channel"), F.col("val").alias("p_removed")
            )
        )
    rem = per_channel[0]
    for nxt_df in per_channel[1:]:
        rem = rem.unionByName(nxt_df)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    out = (
        rem.crossJoin(F.broadcast(base))
        .withColumn(
            "_eff",
            F.round(
                F.lit(1.0) - F.col("p_removed") / F.col("p_base"), 12
            ).cast("decimal(24,12)"),
        )
        .withColumn("_te", F.sum("_eff").over(w_all))
    )
    return out.select(
        "channel",
        "p_base",
        "p_removed",
        sdbl(F.col("_eff")).alias("removal_effect"),
        F.when(
            F.col("_te") != F.lit(0), sdbl(F.col("_eff")) / sdbl(F.col("_te"))
        ).alias("attribution_share"),
    ).orderBy("channel")


def _absorption_ctes(steps: int = 8) -> str:
    """Unrolled value-iteration oracle for q_event_conversion_absorption."""
    parts = ["""nxt AS (
    SELECT event_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events),
  c AS (SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS nn
        FROM nxt WHERE next_type IS NOT NULL GROUP BY 1, 2),
  tot AS (SELECT event_type, CAST(sum(nn) AS BIGINT) AS t
          FROM c GROUP BY 1),
  tr AS (SELECT c.event_type AS s, next_type AS t2, nn / t AS T
         FROM c JOIN tot ON c.event_type = tot.event_type),
  st AS (SELECT s AS node FROM tr UNION SELECT t2 FROM tr),
  p0 AS (SELECT node,
                CASE WHEN node = 'purchase' THEN CAST(1.0 AS DOUBLE)
                     ELSE CAST(0.0 AS DOUBLE) END AS p
         FROM st)"""]
    for k in range(1, steps + 1):
        parts.append(f"""p{k} AS (
    SELECT st.node,
           CASE WHEN st.node = 'purchase' THEN CAST(1.0 AS DOUBLE)
                ELSE coalesce(x.sm, CAST(0.0 AS DOUBLE)) END AS p
    FROM st LEFT JOIN (
      SELECT s AS node,
             CAST(CAST(sum(CAST(round(T * p, 12) AS DECIMAL(24,12)))
                       AS VARCHAR) AS DOUBLE) AS sm
      FROM tr JOIN p{k - 1} ON tr.t2 = p{k - 1}.node GROUP BY 1) x
    USING (node))""")
    return ",\n  ".join(parts) + f"""
  SELECT node AS event_type, p AS p_convert FROM p{steps} ORDER BY node"""


def q_label_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette per label over the
    embedding corpus: s_i = (b_i - a_i) / max(a_i, b_i) with a_i the
    SQUARED distance to the own-label centroid and b_i the minimum
    over other labels' centroids -- the O(n*k) silhouette every
    clustering-quality dashboard uses when the O(n^2) medoid form is
    unaffordable (Hruschka et al.'s simplified silhouette; also the
    nearest_centroid_confusion's quality twin). [label, n_vecs,
    mean_silhouette], silhouette terms 9dp-decimal-summed
    (order-independent) and string-routed.

    Scale shape: identical to nearest_centroid_confusion -- broadcast
    k x dims centroids, per-(vec, label) squared distance via
    ||v||^2 - 2<v,c> + ||c||^2 from the same decimal-exact dot/norm
    aggregates, one vec-grain window for the b_i argmin."""
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "v")
    ).withColumn("v", F.col("v").cast("double"))

    def sdbl(c):
        return c.cast("string").cast("double")

    cent = flat.groupBy(F.col("label").alias("clabel"), "pos").agg(
        F.round(
            sdbl(F.sum(F.col("v").cast("decimal(27,12)"))) / F.count("*"), 6
        ).alias("c")
    )
    cn = cent.groupBy("clabel").agg(
        sdbl(F.sum((F.col("c") * F.col("c")).cast("decimal(24,12)"))).alias(
            "cnorm2"
        )
    )
    vn = flat.groupBy("vec_id").agg(
        sdbl(F.sum((F.col("v") * F.col("v")).cast("decimal(24,12)"))).alias(
            "vnorm2"
        )
    )
    dots = (
        flat.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            sdbl(
                F.sum((F.col("v") * F.col("c")).cast("decimal(24,12)"))
            ).alias("dot")
        )
    )
    d2 = (
        dots.join(vn, "vec_id")
        .join(F.broadcast(cn), "clabel")
        .withColumn(
            "_d2",
            F.col("vnorm2") - F.lit(2.0) * F.col("dot") + F.col("cnorm2"),
        )
    )
    a = d2.filter(F.col("label") == F.col("clabel")).select(
        "vec_id", "label", F.col("_d2").alias("_a")
    )
    b = (
        d2.filter(F.col("label") != F.col("clabel"))
        .groupBy("vec_id")
        .agg(F.min("_d2").alias("_b"))
    )
    s = a.join(b, "vec_id").withColumn(
        "_s",
        F.round(
            (F.col("_b") - F.col("_a")) / F.greatest("_a", "_b"), 9
        ).cast("decimal(12,9)"),
    )
    return (
        s.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            (sdbl(F.sum("_s")) / F.count("*")).alias("mean_silhouette"),
        )
        .orderBy("label")
    )


def q_cosupply_nation_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the NATION partition over the thresholded
    co-supply graph: per nation, Q_c = intra_c/m - (d_c/(2m))^2 --
    "is co-supply structured by geography?" A positive term means the
    nation's suppliers co-supply each other more than a degree-
    preserving random rewiring predicts. No clustering is run: the
    partition is a dimension attribute, so the whole operator is
    exact integers (m, intra-edge counts, degree sums) into one fixed
    IEEE chain per nation.

    Scale shape: the edge list is node-pair-sized and joined twice to
    the supplier->nation map (node-table-sized, AQE-broadcastable);
    m is a 1-row broadcast; everything else is nation-grain.
    [nation, n_suppliers, degree_sum, intra_edges, modularity_term]."""
    from .operators.graph_motifs import cosupply_edges

    e = materialize(cosupply_edges(spark, sf_dir))
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("sk"), "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation")
    sn = sup.join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("sk", F.col("n_name").alias("nation"))
    m1 = e.agg(F.count("*").alias("m"))
    und = e.select(F.col("s1").alias("node")).unionByName(
        e.select(F.col("s2").alias("node"))
    )
    dnat = (
        und.join(sn, F.col("node") == F.col("sk"))
        .groupBy("nation")
        .agg(
            F.count("*").alias("degree_sum"),
            F.count_distinct("node").alias("n_suppliers"),
        )
    )
    intra = (
        e.join(
            sn.select(F.col("sk").alias("_k1"), F.col("nation").alias("_n1")),
            F.col("s1") == F.col("_k1"),
        )
        .join(
            sn.select(F.col("sk").alias("_k2"), F.col("nation").alias("_n2")),
            F.col("s2") == F.col("_k2"),
        )
        .filter(F.col("_n1") == F.col("_n2"))
        .groupBy(F.col("_n1").alias("nation"))
        .agg(F.count("*").alias("intra_edges"))
    )
    md = F.col("m").cast("double")
    half = F.col("degree_sum").cast("double") / (F.lit(2) * F.col("m")).cast(
        "double"
    )
    return (
        dnat.join(intra, "nation", "left")
        .crossJoin(F.broadcast(m1))
        .select(
            "nation",
            "n_suppliers",
            "degree_sum",
            F.coalesce("intra_edges", F.lit(0)).alias("intra_edges"),
            (
                F.coalesce("intra_edges", F.lit(0)).cast("double") / md
                - half * half
            ).alias("modularity_term"),
        )
        .orderBy("nation")
    )


def q_cosupply_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman) of the co-supply graph: Pearson
    correlation of endpoint degrees across all directed edge
    instances -- do high-degree suppliers co-supply with each other
    (r > 0, social-network-like) or with the periphery (r < 0,
    internet-like)? One row [m_directed, sum_j, assortativity].
    Moments accumulate as exact DECIMAL (the ols_fit cast family --
    j*k products dec(18)x dec(19) -> dec(38)), so a 10^9-edge hub
    graph widens instead of wrapping; r is one IEEE chain over the
    string-routed exact moments (sum_j == sum_k by symmetry, both
    orientations counted)."""
    from .operators.graph_motifs import cosupply_edges

    e = materialize(cosupply_edges(spark, sf_dir))
    und = e.select(F.col("s1").alias("src"), F.col("s2").alias("dst")).unionByName(
        e.select(F.col("s2").alias("src"), F.col("s1").alias("dst"))
    )
    deg = und.groupBy(F.col("src").alias("_n")).agg(F.count("*").alias("_d"))
    ed = (
        und.join(deg.select(F.col("_n").alias("src"), F.col("_d").alias("j")), "src")
        .join(deg.select(F.col("_n").alias("dst"), F.col("_d").alias("k")), "dst")
    )
    agg = ed.agg(
        F.count("*").alias("m_directed"),
        F.sum("j").alias("sum_j"),
        F.sum(F.col("j").cast("decimal(18,0)") * F.col("k").cast("decimal(19,0)"))
        .cast("decimal(38,0)")
        .alias("_sjk"),
        F.sum(F.col("j").cast("decimal(18,0)") * F.col("j").cast("decimal(19,0)"))
        .cast("decimal(38,0)")
        .alias("_sjj"),
    )

    def sdbl(c):
        return c.cast("string").cast("double")

    num = sdbl(
        F.col("m_directed").cast("decimal(8,0)") * F.col("_sjk").cast("decimal(30,0)")
        - F.col("sum_j").cast("decimal(18,0)") * F.col("sum_j").cast("decimal(19,0)")
    )
    den = sdbl(
        F.col("m_directed").cast("decimal(8,0)") * F.col("_sjj").cast("decimal(30,0)")
        - F.col("sum_j").cast("decimal(18,0)") * F.col("sum_j").cast("decimal(19,0)")
    )
    return agg.select(
        "m_directed", "sum_j", (num / den).alias("assortativity")
    )


def q_events_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interarrival-time burstiness per event type: gaps between a
    user's consecutive events of the same type (exact microseconds
    via one lag window on the sessionize shuffle), then per-type
    exact moments -> mean, sample variance, coefficient of variation,
    and the Goh-Barabasi burstiness B = (sigma - mu)/(sigma + mu)
    (B ~ -1 periodic, 0 Poisson, -> 1 bursty). Variance numerator
    n*s2 - s^2 rides the ols_fit decimal family (gap us as dec(18),
    squares to dec(38)); the only IEEE ops are the final chain.
    [event_type, n_gaps, mean_gap_us, var_gap_us, cv, burstiness]."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("_gap", us - F.lag(us).over(w))
        .filter(F.col("_gap").isNotNull())
    )
    agg = gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.sum("_gap").alias("_s"),
        F.sum(
            F.col("_gap").cast("decimal(18,0)") * F.col("_gap").cast("decimal(19,0)")
        )
        .cast("decimal(38,0)")
        .alias("_s2"),
    )

    def sdbl(c):
        return c.cast("string").cast("double")

    n = F.col("n_gaps")
    mean = F.col("_s").cast("double") / n.cast("double")
    num = sdbl(
        n.cast("decimal(8,0)") * F.col("_s2").cast("decimal(30,0)")
        - F.col("_s").cast("decimal(18,0)") * F.col("_s").cast("decimal(19,0)")
    )
    var = num / (n * (n - F.lit(1))).cast("double")
    sd = F.sqrt(var)
    return (
        agg.filter(F.col("n_gaps") >= 2)
        .select(
            "event_type",
            "n_gaps",
            mean.alias("mean_gap_us"),
            var.alias("var_gap_us"),
            (sd / mean).alias("cv"),
            ((sd - mean) / (sd + mean)).alias("burstiness"),
        )
        .orderBy("event_type")
    )


def q_nearest_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classification of the embedding corpus against
    its own per-label centroids, reported as a confusion matrix
    [label, pred_label, n_vecs] -- the cheapest embedding-space
    sanity check of labels (Rocchio classification): if the corpus
    labels are coherent, the diagonal dominates; off-diagonal mass
    localizes label noise. Centroids use the label_centroids recipe
    (exact decimal sums, 6dp means); every dot/norm accumulates
    12dp-decimal terms (order-independent) string-routed to double,
    so cosine is one deterministic IEEE chain; argmax tie-breaks on
    label asc.

    Scale shape: centroids are a k x dims aggregate BROADCAST to the
    flat (vec, pos, v) table; the k-way fan-out is per-element with
    k = |labels| (small by construction). One shuffle on vec_id for
    the per-(vec, label) dot aggregate; the confusion matrix is a
    k x k aggregate."""
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "v")
    ).withColumn("v", F.col("v").cast("double"))

    def sdbl(c):
        return c.cast("string").cast("double")

    cent = flat.groupBy(F.col("label").alias("clabel"), "pos").agg(
        F.round(
            sdbl(F.sum(F.col("v").cast("decimal(27,12)"))) / F.count("*"), 6
        ).alias("c")
    )
    cn = cent.groupBy("clabel").agg(
        sdbl(F.sum((F.col("c") * F.col("c")).cast("decimal(24,12)"))).alias(
            "cnorm2"
        )
    )
    vn = flat.groupBy("vec_id").agg(
        sdbl(F.sum((F.col("v") * F.col("v")).cast("decimal(24,12)"))).alias(
            "vnorm2"
        )
    )
    dots = (
        flat.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            sdbl(
                F.sum((F.col("v") * F.col("c")).cast("decimal(24,12)"))
            ).alias("dot")
        )
    )
    scored = (
        dots.join(vn, "vec_id")
        .join(F.broadcast(cn), "clabel")
        .withColumn(
            "csim",
            F.col("dot") / (F.sqrt("vnorm2") * F.sqrt("cnorm2")),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("clabel"))
    pred = scored.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    return (
        pred.groupBy("label", F.col("clabel").alias("pred_label"))
        .agg(F.count("*").alias("n_vecs"))
        .orderBy("label", "pred_label")
    )


def q_nation_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period league table: each nation's revenue rank in
    1995 vs 1996 and the rank delta (positive = climbed). Ranks are
    per-year windows over the 25-row nation aggregate (reduced rows);
    revenue is exact integer micros so ranking and deltas are
    engine-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1995, 1996)
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev_micros = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(8,4)") - F.col("l_discount").cast("decimal(8,4)"))
        * F.lit(1000000).cast("decimal(7,0)")
    ).cast("decimal(25,0)")
    yearly = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(F.sum(rev_micros).cast("decimal(25,0)").alias("rev_micros"))
    )
    w = Window.partitionBy("yr").orderBy(F.desc("rev_micros"), F.asc("nation"))
    ranked = yearly.withColumn("rnk", F.row_number().over(w).cast("long"))
    a = ranked.filter(F.col("yr") == 1995).select(
        "nation",
        F.col("rnk").alias("rank_1995"),
        F.col("rev_micros").cast("string").cast("double").alias("rev_1995"),
    )
    b = ranked.filter(F.col("yr") == 1996).select(
        "nation",
        F.col("rnk").alias("rank_1996"),
        F.col("rev_micros").cast("string").cast("double").alias("rev_1996"),
    )
    return (
        a.join(b, "nation")
        .select(
            "nation",
            "rank_1995",
            "rank_1996",
            (F.col("rank_1995") - F.col("rank_1996")).alias("rank_delta"),
            "rev_1995",
            "rev_1996",
        )
        .orderBy(F.desc("rank_delta"), "nation")
    )


def q_nation_rank_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-agreement between the 1995 and 1996 nation revenue league
    tables: one row [n_nations, sum_d2, spearman, n_concordant,
    n_discordant, kendall_tau]. Spearman rho = 1 - 6*sum(d^2) /
    (n(n^2-1)) on the exact integer rank deltas; Kendall tau-a from
    the concordant/discordant pair counts (row_number ranks are
    tie-free, so tau-a == tau-b). The pair enumeration is a theta
    self-join of the 25-row NATION-GRAIN aggregate -- O(nations^2)
    pairs at aggregate grain, never at fact grain, so the shape is
    scale-free in the corpus size (the skyline/ztest stance). Both
    correlation chains are single IEEE expressions over exact longs,
    bit-identical cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1995, 1996)
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev_micros = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(8,4)") - F.col("l_discount").cast("decimal(8,4)"))
        * F.lit(1000000).cast("decimal(7,0)")
    ).cast("decimal(25,0)")
    yearly = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(F.sum(rev_micros).cast("decimal(25,0)").alias("rev_micros"))
    )
    w = Window.partitionBy("yr").orderBy(F.desc("rev_micros"), F.asc("nation"))
    ranked = yearly.withColumn("rnk", F.row_number().over(w).cast("long"))
    a = ranked.filter(F.col("yr") == 1995).select(
        "nation", F.col("rnk").alias("r95")
    )
    b = ranked.filter(F.col("yr") == 1996).select(
        F.col("nation").alias("_nb"), F.col("rnk").alias("r96")
    )
    both = a.join(b, F.col("nation") == F.col("_nb")).select(
        "nation", "r95", "r96"
    )
    d = F.col("r95") - F.col("r96")
    s = both.agg(
        F.count("*").alias("n_nations"),
        F.sum(d * d).alias("sum_d2"),
    )
    lhs = both.select(
        F.col("nation").alias("_na"),
        F.col("r95").alias("_a95"),
        F.col("r96").alias("_a96"),
    )
    rhs = both.select(
        F.col("nation").alias("_nb2"),
        F.col("r95").alias("_b95"),
        F.col("r96").alias("_b96"),
    )
    prod = (F.col("_a95") - F.col("_b95")) * (F.col("_a96") - F.col("_b96"))
    # broadcast the build side: the theta join then plans as
    # BroadcastNestedLoopJoin over the 25-row NATION-GRAIN aggregate
    # (never a shuffled CartesianProduct -- plan-lint enforced)
    pairs = lhs.join(F.broadcast(rhs), F.col("_na") < F.col("_nb2")).agg(
        F.sum(F.when(prod > 0, 1).otherwise(0)).cast("long").alias(
            "n_concordant"
        ),
        F.sum(F.when(prod < 0, 1).otherwise(0)).cast("long").alias(
            "n_discordant"
        ),
    )
    n = F.col("n_nations")
    spearman = F.lit(1.0) - (
        F.lit(6.0) * F.col("sum_d2").cast("double")
    ) / (n * (n * n - F.lit(1))).cast("double")
    kendall = (
        F.col("n_concordant") - F.col("n_discordant")
    ).cast("double") / F.expr("(n_nations * (n_nations - 1)) div 2").cast(
        "double"
    )
    return s.crossJoin(F.broadcast(pairs)).select(
        "n_nations",
        "sum_d2",
        spearman.alias("spearman"),
        "n_concordant",
        "n_discordant",
        kendall.alias("kendall_tau"),
    )


def q_user_wallet_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floor-at-zero running balance per user (credits on purchase,
    debits on click) WITHOUT iteration: the Lindley recursion
    B_t = max(0, B_{t-1} + x_t) looks inherently sequential, but its
    closed form is B_t = S_t - min(0, min_{u<=t} S_u) (the reflected
    random walk), so the whole operator is two per-user cumulative
    windows sharing ONE exchange+sort -- the same rewrite class as
    the CUSUM/decay operators (registry events_cusum). Everything is
    exact integer cents; ordering is the unique (ts, event_id)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    sign = F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(
        F.lit(-1)
    )
    flow = sign * (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = ev.select(
        "user_id", "event_id", "ts", flow.alias("flow_cents")
    ).withColumn("_run", F.sum("flow_cents").over(w))
    return base.withColumn(
        "balance_cents",
        F.col("_run") - F.least(F.lit(0), F.min("_run").over(w)),
    ).select("user_id", "event_id", "flow_cents", "balance_cents")


def q_record_linkage_fs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter record linkage (operators/linkage.py) between
    customers and a deterministically-corrupted contacts copy (the
    FEBRL-style benchmark construction: every 5th contact's name is
    truncated, every 3rd's balance nudged +0.01). Blocking on
    (nation, floor(balance)); per-field log-likelihood weights as
    PRE-COMPUTED double literals shared with the oracle. Pairs with
    two corrupted fields fall below threshold -- the documented FS
    false-negative class, visible in the output as is_match=false
    true pairs."""
    from .operators.linkage import fs_score_pairs

    master, contacts = _linkage_frames(spark, sf_dir)
    return fs_score_pairs(master, contacts, ["nat", "blk"])


def _linkage_frames(spark: SparkSession, sf_dir: str):
    """The FEBRL-style master/corrupted-contacts pair shared by the
    linkage report and the golden-record merge."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.lower(F.col("c_name")).alias("nm"),
        F.col("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nat"),
    )
    master = cust.withColumn("blk", F.floor("bal"))
    contacts = cust.select(
        (F.col("custkey") + F.lit(10_000_000)).alias("contact_id"),
        F.when(
            F.col("custkey") % 5 == 0,
            F.expr("substring(nm, 1, length(nm) - 3)"),
        )
        .otherwise(F.col("nm"))
        .alias("nm"),
        F.when(F.col("custkey") % 3 == 0, F.col("bal") + F.lit(0.01))
        .otherwise(F.col("bal"))
        .alias("bal"),
        "seg",
        "nat",
    ).withColumn("blk", F.floor("bal"))
    return master, contacts


def q_linkage_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record survivorship over the FS linkage matches
    (operators/linkage.golden_records): master-anchored clusters,
    longest-name / most-frequent-value survivorship as min(struct)
    argmax aggregates -- no iteration, no window over fact rows. The
    repair is REAL on this data: truncated contact names lose to the
    master's full name, nudged balances are outvoted back to the
    original cents."""
    from .operators.linkage import fs_match_pairs, golden_records

    master, contacts = _linkage_frames(spark, sf_dir)
    matches = fs_match_pairs(master, contacts, ["nat", "blk"])
    return golden_records(master, contacts, matches)


def q_corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mixture drift between two corpus halves
    (operators/drift.categorical_drift): even doc_ids are the frozen
    baseline, odd the current snapshot; per-lang PSI and KL terms.
    Proportions are int/int divisions; each ln ratio is rounded to
    9dp (one value per row, never cross-engine-summed). A lang with
    zero mass on either side raises loudly."""
    from .operators.drift import categorical_drift

    docs = load_table(spark, sf_dir, "documents")
    return categorical_drift(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "lang",
    )


def q_value_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic
    (operators/drift.ks_test) between purchase and click value
    distributions: the numeric-feature drift monitor. Cumulative
    fractions ride the two-level bucketed cumsum (no row table
    crosses SinglePartition); the statistic is a TakeOrdered(1) with
    a smallest-value tie-break. Oracle = native-window CDF SQL."""
    from .operators.drift import ks_test

    ev = load_table(spark, sf_dir, "events")
    return ks_test(
        ev.filter(F.col("event_type") == "purchase").select(
            F.col("value").alias("v")
        ),
        ev.filter(F.col("event_type") == "click").select(
            F.col("value").alias("v")
        ),
    )


def q_events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier report (operators/robust.mad_outliers):
    exact lower-median + MAD + Hampel cut (k=3, sigma scale 1.4826).
    The robust twin of events_anomaly_zscore -- judged against the
    median, so the outliers can't inflate their own yardstick. Lower
    medians are integer-rank SELECTION (no midpoint interpolation to
    diverge cross-engine)."""
    from .operators.robust import mad_outliers

    return mad_outliers(load_table(spark, sf_dir, "events"))


def q_events_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal profile per event type: [event_type, dow
    (0=Sunday), n, mean_value, seasonal_index = dow mean / overall
    type mean]. The classical seasonal-index decomposition at the
    weekly grain -- the monitoring companion to revenue_forecast's
    trend fit. Means accumulate 9dp-decimal terms (order-independent)
    string-routed to double; the index is one division of those
    deterministic doubles. Two partial-agg'd passes collapse to
    |types| x 7 rows; the per-type totals broadcast back."""
    ev = load_table(spark, sf_dir, "events")
    dec = F.round(F.col("value"), 9).cast("decimal(20,9)")
    per = ev.groupBy(
        "event_type", (F.dayofweek("ts") - F.lit(1)).alias("dow")
    ).agg(F.count("*").alias("n"), F.sum(dec).alias("_sv"))
    tot = ev.groupBy("event_type").agg(
        F.count("*").alias("_nt"), F.sum(dec).alias("_st")
    )
    mean_dow = F.col("_sv").cast("string").cast("double") / F.col("n").cast(
        "double"
    )
    mean_typ = F.col("_st").cast("string").cast("double") / F.col(
        "_nt"
    ).cast("double")
    return (
        per.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "dow",
            "n",
            mean_dow.alias("mean_value"),
            (mean_dow / mean_typ).alias("seasonal_index"),
        )
        .orderBy("event_type", "dow")
    )


def q_frequent_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining (operators/seqmine.py): top-20
    contiguous event-type trigrams by distinct-user support. One
    user-keyed window (total order via the unique event_id tiebreak)
    chains two lead()s; exact distinct support via the two-phase
    (gram, user) -> (gram) groupBy. Oracle = native lead() SQL."""
    from .operators.seqmine import contiguous_sequences

    return contiguous_sequences(
        load_table(spark, sf_dir, "events"), n=3, top_n=20
    )


def q_user_day_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reload reconciliation via operators/diffing.snapshot_diff: the
    OLD per-(user, day) rollup was built from a load that missed every
    10th event (late data); the NEW reload has all events but starts
    at Jan 5 (retention purge). The diff is the changeset a downstream
    consumer must apply: 'delete' = purged days, 'insert' = days whose
    events were ALL late, 'update' = days where stragglers changed the
    aggregates (changed_cols says which); untouched days don't appear.
    One full-outer join on (user_id, day); both rollups use the
    decimal-sum recipe so equality compares are engine-exact."""
    from .operators.diffing import snapshot_diff

    ev = load_table(spark, sf_dir, "events")

    def snap(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "user_id", F.date_trunc("day", F.col("ts")).alias("day")
        ).agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("string")
                .cast("double"),
                6,
            ).alias("sum_value"),
        )

    old = snap(ev.filter(F.col("event_id") % 10 != 0))
    new = snap(ev.filter(F.col("ts") >= F.expr("TIMESTAMP_NTZ '2024-01-05 00:00:00'")))
    d = snapshot_diff(
        old, new, keys=["user_id", "day"], compare_cols=["n_events", "sum_value"]
    )
    return d.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day_s"),
        "change",
        "changed_cols",
        "old_n_events",
        "new_n_events",
        "old_sum_value",
        "new_sum_value",
    )


def q_market_basket_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-priori level-3 triple mining (operators/basket.py): frequent
    pairs extended per order, downward-closure pruned; naive
    all-triples oracle proves the pruning lossless."""
    from .operators.basket import market_basket_triples

    return market_basket_triples(spark, sf_dir)


# RAKE delimiter set for the synthetic corpus: the two true function
# words plus the high-frequency modifier vocabulary, so candidate
# phrases are short noun runs. Real corpora swap in a full stopword
# list -- the operator shape (delimit -> islands -> deg/freq -> sum)
# is unchanged. Mirrored literally in the SQL oracle.
RAKE_STOPWORDS = ("the", "a", "join", "merge", "small", "fast", "slow", "big")


def q_rake_keyphrases(spark: SparkSession, sf_dir: str, max_len: int = 4,
                      topn: int = 20) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-delimited token runs (capped at max_len, the
    standard RAKE cut); word score = deg(w)/freq(w) where deg counts
    phrase-mate co-occurrence including self; phrase score = sum of
    member word scores. Returns the top phrases by score with their
    corpus frequency -- the cheap unsupervised 'what is this corpus
    about' report.

    Scale: one doc-keyed window builds the islands (running stopword
    count); word stats are one groupBy over phrase members; the
    per-phrase score sum uses the round-9dp decimal-sum recipe so
    member order can't move the hash. Everything is token-count
    linear."""
    from pyspark.sql import Window

    from .functions.text_stats import with_token_array

    docs = with_token_array(load_table(spark, sf_dir, "documents"))
    words = docs.select(
        "doc_id", F.posexplode("toks").alias("pos", "word")
    ).withColumn("is_stop", F.col("word").isin(*RAKE_STOPWORDS).cast("long"))
    wd = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    members = (
        words.withColumn("phrase_id", F.sum("is_stop").over(wd))
        .filter(F.col("is_stop") == 0)
        .select("doc_id", "phrase_id", "pos", "word")
    )
    members = materialize(members)  # word stats + phrase build share it
    phr = members.groupBy("doc_id", "phrase_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda x: x["word"],
            ),
        ).alias("phrase"),
        F.count("*").alias("plen"),
    ).filter(F.col("plen") <= max_len)
    wstat = (
        members.join(
            phr.select("doc_id", "phrase_id", "plen"), ["doc_id", "phrase_id"]
        )
        .groupBy("word")
        .agg(
            F.count("*").alias("freq"),
            F.sum("plen").alias("deg"),
        )
        .select(
            "word", (F.col("deg") / F.col("freq")).alias("wscore")
        )
    )
    pscore = (
        members.join(phr.select("doc_id", "phrase_id", "plen"), ["doc_id", "phrase_id"])
        .join(wstat, "word")
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.sum(
                F.round(F.col("wscore"), 9).cast("decimal(20,9)")
            ).cast("string").cast("double").alias("score")
        )
    )
    agg = (
        phr.join(pscore, ["doc_id", "phrase_id"])
        .groupBy("phrase")
        .agg(F.count("*").alias("n"), F.max("score").alias("score"))
    )
    return (
        agg.select("phrase", "n", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("phrase"))
        .limit(topn)
    )


def q_training_negatives(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Deterministic negative sampling for (customer, part) training
    pairs -- the contrastive-training data op: every positive
    interaction gets k pseudo-random negative parts, drawn by portable
    hash (seeded, reproducible across runs AND engines) over the DENSE
    part id space, then FALSE negatives (parts the customer actually
    bought) are dropped by one anti-join against the positive set --
    rejection without iteration, the scale-safe form (retry loops
    serialize; an anti-join is one shuffle). Expected loss is
    |positives per user| / |parts| -- negligible, and exactly
    reproducible.

    Plan: positives = one distinct over the order->part join; the k
    slots are a bounded explode; the candidate draw is map-only
    hashing; the anti-join is the only extra shuffle. Output keeps the
    slot so the (pos, slot) -> negative mapping is stable for epoch
    replay."""
    from .operators.dedup import portable_hash32

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), F.col("o_custkey").alias("custkey")
    )
    pos = li.join(orders, "okey").select("custkey", "part").distinct()
    pos = materialize(pos)  # consumed by the explode AND the anti-join
    n_parts = load_table(spark, sf_dir, "part").agg(
        F.count("*").alias("n_parts")
    )
    cand = (
        pos.crossJoin(F.broadcast(n_parts))
        .select(
            "custkey",
            F.col("part").alias("pos_part"),
            F.explode(F.sequence(F.lit(1), F.lit(k))).alias("slot"),
            "n_parts",
        )
        .withColumn(
            "neg_part",
            portable_hash32(
                F.concat_ws(
                    ":",
                    F.lit("neg1"),
                    F.col("custkey").cast("string"),
                    F.col("pos_part").cast("string"),
                    F.col("slot").cast("string"),
                )
            )
            % F.col("n_parts"),
        )
    )
    return cand.join(
        pos.select("custkey", F.col("part").alias("neg_part")),
        ["custkey", "neg_part"],
        "left_anti",
    ).select("custkey", "pos_part", F.col("slot").cast("long").alias("slot"), "neg_part")


def q_item_item_cf(spark: SparkSession, sf_dir: str, min_pair: int = 2,
                   topn: int = 5) -> DataFrame:
    """Item-item collaborative filtering (Sarwar et al., WWW'01) over
    binary order baskets: cosine sim(p1, p2) = c12 / sqrt(c1 * c2),
    top-5 neighbors per part -- the 'customers who bought this also
    bought' table. Reuses the A-priori pair machinery: support-pruned
    pair counts symmetrized, then a per-item window over the pruned
    neighbor lists (never the full item x item matrix).

    Exactness: c1*c2 is an exact integer < 2^53 at every tested SF,
    so sqrt and the division are engine-identical; round 6; ties on
    neighbor id."""
    from pyspark.sql import Window

    b = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    b = materialize(b)
    item = b.groupBy("p").agg(F.count("*").alias("item_n"))
    a1 = b.select("o", F.col("p").alias("p1"))
    a2 = b.select("o", F.col("p").alias("p2"))
    pairs = (
        a1.join(a2, "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("c12"))
        .filter(F.col("c12") >= min_pair)
    )
    sym = pairs.unionByName(
        pairs.select(
            F.col("p2").alias("p1"), F.col("p1").alias("p2"), "c12"
        )
    )
    scored = (
        sym.join(item.select(F.col("p").alias("p1"), F.col("item_n").alias("c1")), "p1")
        .join(item.select(F.col("p").alias("p2"), F.col("item_n").alias("c2")), "p2")
        .select(
            F.col("p1").alias("part"),
            F.col("p2").alias("neighbor"),
            "c12",
            F.round(
                F.col("c12")
                / F.sqrt((F.col("c1") * F.col("c2")).cast("double")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("part").orderBy(F.desc("cosine"), F.asc("neighbor"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topn)
    )


def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse-wide data-quality audit (operators/dq.py): 17
    checks — domain, PK uniqueness, referential integrity, decimal
    reconciliation — one row [check_name, n_checked, n_violations]
    each, all row-local checks sharing one scan per table. The audit
    DOES fire on this data: 257 childless orders and a totalprice
    column that never reconciles with its lineitems."""
    from .operators.dq import dq_audit

    return dq_audit(spark, sf_dir)


def q_brand_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-weighted median quantity per part brand
    (operators/robust.weighted_median): the quantity level below
    which half of each brand's extended-price mass sits -- the
    aggregation-weighted generalization of the median ("where does
    half the MONEY trade", not "what does the middle ROW order").
    Weights are exact integer CENTS (double -> decimal(12,2) -> *100
    -> long), so the 2*cum >= total tie-break is decided by integer
    comparisons and the answer is a value that EXISTS in the data:
    SELECTION, not interpolation, the same portability stance as the
    MAD medians. lineitem collapses to (brand, distinct quantity)
    grain in one partial-agg'd groupBy after a broadcast part join;
    windows run over that ~|brands| x 50 grain, never fact rows."""
    from .operators.robust import weighted_median

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li.l_partkey == part.p_partkey,
    ).select(
        "p_brand",
        F.col("l_quantity").cast("decimal(12,2)").cast("long").alias("qty"),
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    return weighted_median(j, "p_brand", "qty", "cents")


def q_segment_nation_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between market segment and
    nation (operators/evalmetrics.chi_square_cells): per observed
    contingency cell [c_mktsegment, n_name, observed, expected,
    term, chi2, dof] -- "does segment mix differ by nation" asked
    exactly, the categorical-drift sibling of corpus_drift_psi /
    value_drift_ks. Every input to the IEEE arithmetic is an exact
    integer (counts and their products, decimal-routed): the term is
    (o*n - r*c)^2 / (r*c*n), so both engines square and divide
    bit-identical doubles; the summed statistic is a 9dp-decimal
    accumulation string-routed out. One groupBy collapses customer
    x nation (broadcast dim join) to the |segments| x |nations| cell
    grain; everything after runs on that metadata-sized table."""
    from .operators.evalmetrics import chi_square_cells

    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    j = cust.join(
        F.broadcast(nat), cust.c_nationkey == nat.n_nationkey
    ).select("c_mktsegment", "n_name")
    return chi_square_cells(j, "c_mktsegment", "n_name")


def q_orders_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals
    (operators/drift.benford_first_digit): first-digit distribution
    of o_totalprice in exact integer cents vs log10(1 + 1/d), with
    the Pearson deviation per digit and the summed chi2 -- the
    fabricated-amounts detector, and the theoretical-distribution
    twin of corpus_drift_psi. Digit extraction is by string head
    (never log-bucketing, whose boundary ulps could disagree); the
    one transcendental (benford_p) is 9dp-frozen as a decimal before
    any arithmetic touches it. One partial-agg'd groupBy collapses
    orders to <= 9 rows; everything after is constant-size."""
    from .operators.drift import benford_first_digit

    orders = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    return benford_first_digit(
        orders.select(cents.alias("cents")), "cents"
    )


def q_customer_spend_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve by customer decile: rank customers by lifetime
    spend ascending, split into 10 equal-population deciles, report
    [decile, n_customers, cents, share_of_total, cum_share] -- the
    curve whose area complement is customer_spend_gini, shown as the
    10-point table an analyst actually reads ("the top decile holds
    X% of revenue"). Spend is exact integer cents; the global rank
    rides the two-level bucketed machinery (operators/ranking.py --
    no customer row crosses SinglePartition) and the decile boundary
    is INTEGER arithmetic ((rn-1)*10 div n, the ABC-class stance: no
    float decides a bucket). Shares divide exact longs; the only
    unpartitioned windows run over the 10-row decile aggregate."""
    from .operators.ranking import with_global_row_number

    orders = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    spend = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(cents).alias("cents")
    )
    ranked = with_global_row_number(
        spend,
        "cents",
        tiebreaks=[F.asc("custkey")],
        out_col="rn",
        total_col="n",
    )
    per = ranked.groupBy(
        F.expr("((rn - 1) * 10) div n").alias("decile")
    ).agg(F.count("*").alias("n_customers"), F.sum("cents").alias("cents"))
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per.select(
        "decile",
        "n_customers",
        "cents",
        (F.col("cents").cast("double") / F.sum("cents").over(w_all).cast("double")).alias(
            "share_of_total"
        ),
        (F.sum("cents").over(w_cum).cast("double") / F.sum("cents").over(w_all).cast("double")).alias(
            "cum_share"
        ),
    ).orderBy("decile")


def q_events_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5% two-sided trimmed mean of event value per type
    (operators/robust.trimmed_mean): the robust location estimate
    between events_anomaly_mad's median and the raw mean -- drop the
    k = n*5 div 100 cheapest and dearest rows by exact integer rank,
    average the rest. Values ride as exact integer cents; the only
    IEEE ops are two final divisions of exact longs. The (type,
    distinct cents) grain collapses ~5.6x below the facts before any
    window runs."""
    from .operators.robust import trimmed_mean

    ev = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("long")
    return trimmed_mean(
        ev.select("event_type", cents.alias("cents")), "event_type", "cents"
    )


def q_events_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5% two-sided winsorized mean of event value per type
    (operators/robust.winsorized_mean): trimmed_mean's sibling that
    CLAMPS the k = n*5 div 100 cheapest/dearest rows to the exact
    rank-(k+1) / rank-(n-k) fence values instead of dropping them.
    Same (type, distinct cents) grain, same single per-group
    cumulative window; fences are SELECTED integer cents and the
    winsorized sum is exact longs -- one final IEEE division."""
    from .operators.robust import winsorized_mean

    ev = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("long")
    return winsorized_mean(
        ev.select("event_type", cents.alias("cents")), "event_type", "cents"
    )


def q_ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on 24h activation between a
    deterministic 50/50 user split (variant = user_id % 2):
    population = users with a signup event, conversion = a purchase
    within 24 hours of their FIRST signup ("does the variant
    activate users faster") -- one row [n_a, conv_a, p_a, n_b,
    conv_b, p_b, z_score], the classical pooled-variance test and
    the experimentation sibling of segment_nation_chisq /
    value_drift_ks. (Lifetime any-purchase saturates to p=1 on this
    data -- a degenerate pooled rate the guard below rejects; the
    windowed funnel is the honest metric.) Every input to the float
    arithmetic is an exact integer count over exact microsecond
    timestamp comparisons, so p's, the pooled rate, and the variance
    are identical doubles cross-engine; sqrt is
    IEEE-correctly-rounded, so z matches to the last bit. Shapes:
    signup firsts collapse at user grain, one hash join back to
    events on user_id (both sides user-partitioned; never
    broadcast -- the user dimension scales with the corpus), then
    per-user flags -> 2 variant rows -> 1."""
    ev = load_table(spark, sf_dir, "events")
    s0 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s0"))
    )
    per_user = (
        s0.join(ev, "user_id")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("s0"))
                    & (F.col("ts") < F.col("s0") + F.expr("INTERVAL 24 HOURS")),
                    1,
                ).otherwise(0)
            ).alias("conv")
        )
    )
    by_var = per_user.groupBy(
        (F.col("user_id") % 2).alias("variant")
    ).agg(F.count("*").alias("n"), F.sum("conv").cast("long").alias("c"))
    one = by_var.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 0, F.col("c"))).alias("conv_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 1, F.col("c"))).alias("conv_b"),
    )
    degenerate = (
        F.col("n_a").isNull()
        | F.col("n_b").isNull()
        | (F.col("conv_a") + F.col("conv_b") <= 0)
        | (F.col("conv_a") + F.col("conv_b") >= F.col("n_a") + F.col("n_b"))
    )
    guard = F.when(
        degenerate,
        F.raise_error(
            F.lit(
                "ab_conversion_ztest: degenerate split (empty arm or "
                "pooled rate 0/1) -- the z statistic is undefined; "
                "check the assignment and conversion event"
            )
        ).cast("double"),
    )
    p_a = guard.otherwise(
        F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    )
    p_b = guard.otherwise(
        F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    )
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    z = (p_a - p_b) / F.sqrt(
        pool
        * (F.lit(1.0) - pool)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    return one.select(
        "n_a",
        "conv_a",
        p_a.alias("p_a"),
        "n_b",
        "conv_b",
        p_b.alias("p_b"),
        z.alias("z_score"),
    )


def q_events_trailing_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day OLS revenue slope per event type
    (operators/regression.trailing_ols): for every (type, day), the
    least-squares trend in cents/day over the trailing calendar week
    -- the per-row "is this series accelerating NOW" detector, the
    windowed sibling of nation_revenue_trend's one-fit-per-group.
    The frame is a RANGE over the epoch-day index, so a missing day
    shrinks the fit's n instead of stretching the window into stale
    history. Facts collapse to the (type, day) grain first; the
    window sums exact DECIMAL statistics over that grain (days, not
    events cross the sort); slope_num/den are exact integers
    string-routed to double, one IEEE division; warm-up rows keep a
    NULL slope."""
    from .operators.regression import trailing_ols

    ev = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("long")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(cents).alias("cents"))
        .withColumn(
            "x",
            F.datediff(
                F.col("day"), F.to_date(F.lit("1970-01-01"))
            ).cast("long"),
        )
    )
    return (
        trailing_ols(daily, ["event_type"], "x", "cents", 7)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "cents",
            "n_points",
            "slope",
        )
        .orderBy("event_type", "day")
    )


def q_duplicate_charge_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-charge detection: CONSECUTIVE events by the same
    user, same type, same EXACT cent amount within 7 days -- the
    classic double-billing screen, the record-linkage sibling of
    orders_benford's digit audit. One lag() per (user, type, cents)
    partition finds adjacent repeats (a same-key self-join would
    emit O(m^2) pairs per hot key for the same finding;
    consecutiveness bounds output at one row per repeat, and a chain
    of m duplicates surfaces as m-1 adjacent pairs). Exact integer
    cents and exact microsecond gaps decide everything; event_id
    breaks equal-timestamp ties so the pairing is deterministic.
    Legitimately SPARSE on clean data (3 hits at sf0.01, 29 at
    sf0.1, exact-amount collisions are the anomaly being screened
    for) -- pytest injects a synthetic duplicate chain for the
    structural check, and streaming/pipelines.py carries the
    O(1)-state online twin (parity-pinned). Output: [user_id,
    event_type, cents, first_event_id, second_event_id, gap_us]."""
    from .operators.dq import duplicate_charge_pairs

    return duplicate_charge_pairs(load_table(spark, sf_dir, "events"))


def q_events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per observed day, with
    same-day actives and the DAU/WAU stickiness ratio -- the product
    health metric every event pipeline serves. Sliding DISTINCT
    counts don't decompose into window sums, so the scale-correct
    plan is the contribute-forward expansion: collapse events to the
    (user, day) grain ONCE (the only fact-sized shuffle), explode
    each row into the <=7 window-end days it contributes to, and
    count distinct per day -- cost is 7x the user-day grain, never
    7x the events, and never a per-day rescan of the fact table.
    Window-end days are restricted to OBSERVED days (broadcast day
    spine): trailing windows never invent days past the data, and a
    silent zero-DAU day would surface as a missing row, not a fake
    0/x ratio. Output: [day, dau, wau, stickiness], day formatted
    (the date-vs-timestamp dtype trap)."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    days = ud.select("d").distinct().withColumnRenamed("d", "dx")
    expanded = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        "d",
    ).select("user_id", F.date_add(F.col("d"), F.col("i")).alias("dx"))
    wau = (
        expanded.join(F.broadcast(days), "dx")
        .groupBy("dx")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    dau = ud.groupBy("d").agg(F.countDistinct("user_id").alias("dau"))
    return (
        dau.join(wau, dau.d == wau.dx)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


def q_stratified_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10% stratified document sample with largest-remainder
    (Hamilton) apportionment (operators/curation.stratified_sample):
    per-lang quotas q_h = (n*N_h) div N plus +1 for the largest
    remainders, so the sample size is EXACTLY N div 10 and every
    stratum is within 1 doc of its ideal share -- the
    fixed-token-budget mixing rule mixture_sample's Bernoulli filter
    only achieves in expectation. Membership is the quota-first md5
    (doc_id) hex order within each lang: a pure function of the
    data, mirrored exactly by the oracle."""
    from .operators.curation import stratified_sample

    return stratified_sample(load_table(spark, sf_dir, "documents"))


def q_nation_top_brands_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N-with-OTHERS report: per supplier nation, the 3 highest-
    revenue part brands by exact micros plus ONE 'OTHERS' row
    rolling up the tail -- [n_name, brand, n_brands, revenue,
    share], the report shape every BI tool renders (plain top-k
    queries drop the tail; the OTHERS row is what makes shares sum
    to 1). Rank ties break deterministically (micros desc, brand
    asc). Facts collapse to the |nations| x |brands| grain in ONE
    partial-agg'd groupBy after two broadcast dim joins; the rank
    window and the re-aggregation run on that metadata-sized grain;
    share divides exact longs by the nation total (a window over the
    post-rollup <= 4-rows-per-nation grain)."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nat = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(8,4)") - F.col("l_discount").cast("decimal(8,4)")
    )
    base = (
        li.join(
            F.broadcast(
                sup.join(
                    F.broadcast(nat),
                    sup.s_nationkey == nat.n_nationkey,
                ).select("s_suppkey", "n_name")
            ),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li.l_partkey == part.p_partkey,
        )
        .groupBy("n_name", "p_brand")
        .agg(F.sum((rev * F.lit(1_000_000)).cast("long")).alias("micros"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.desc("micros"), F.asc("p_brand")
    )
    rolled = (
        base.withColumn("_rk", F.row_number().over(w))
        .groupBy(
            "n_name",
            F.when(F.col("_rk") <= 3, F.col("p_brand"))
            .otherwise(F.lit("OTHERS"))
            .alias("brand"),
        )
        .agg(
            F.count("*").alias("n_brands"),
            F.sum("micros").alias("_mi"),
            F.min("_rk").alias("_ord"),
        )
    )
    wn = Window.partitionBy("n_name")
    return rolled.select(
        "n_name",
        "brand",
        "n_brands",
        (F.col("_mi").cast("double") / F.lit(1_000_000.0)).alias("revenue"),
        (
            F.col("_mi").cast("double")
            / F.sum("_mi").over(wn).cast("double")
        ).alias("share"),
        F.col("_ord"),
    ).select(
        "n_name", "brand", "n_brands", "revenue", "share"
    ).orderBy("n_name", F.desc("share"), "brand")


ORACLES: dict[str, str] = {
    # faithful surface
    "wordcount": _SQL_WORDCOUNT,
    "wordcount_textfile": f"""
      WITH lines AS (
        SELECT unnest(string_split(content, chr(10))) AS line
        FROM read_text('{_CORPUS_TXT}')),
      words AS (
        SELECT unnest(string_split_regex(trim(lower(
                 regexp_replace(line, '[^a-zA-Z0-9\\s]', '', 'g'))), '\\s+')) AS word
        FROM lines)
      SELECT word, count(*) AS cnt FROM words WHERE word <> '' GROUP BY word
    """,
    "wordcount_topn": f"SELECT * FROM ({_SQL_WORDCOUNT}) ORDER BY cnt DESC, word ASC LIMIT 100",
    "wordcount_rdd": _SQL_WORDCOUNT,
    "corpus_stats": f"""
      SELECT w.n_tokens, w.n_distinct_words, d.n_lines
      FROM (SELECT count(*) AS n_tokens, count(DISTINCT word) AS n_distinct_words
            FROM ({_SQL_WORDS}) WHERE word <> '') w,
           (SELECT count(*) AS n_lines FROM documents) d
    """,
    "map_task_stats": """
      WITH w AS (
        SELECT CAST(doc_id % 4 AS INT) AS task_id,
               unnest(string_split_regex(trim(lower(
                 regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))), '\\s+')) AS word
        FROM documents)
      SELECT task_id, count(DISTINCT word) AS n_distinct_words, count(*) AS n_tokens
      FROM w WHERE word <> '' GROUP BY task_id
    """,
    # text analysis
    "text_stats": f"""
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
        round(len(list_distinct(toks)) / greatest(len(toks), 1), 6) AS distinct_ratio,
        round(coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
              / greatest(len(toks), 1), 6) AS avg_token_len,
        round((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))
              / greatest(length(text), 1), 6) AS punct_ratio
      FROM ({_SQL_TOKS})
    """,
    "quality_score": f"""
      SELECT doc_id, round(
        least(len(toks) / 50.0, 1.0) * 0.35
        + (1.0 - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))
                 / greatest(length(text), 1)) * 0.25
        + (len(list_distinct(toks)) / greatest(len(toks), 1)) * 0.2
        + least(len(list_filter(toks, t -> t IN ('the','a','and','of','is'))) / 5.0, 1.0) * 0.2
      , 6) AS quality
      FROM ({_SQL_TOKS})
    """,
    "lang_id": _lang_hits_sql(),
    "token_counts": f"""
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_ws_tokens,
        CAST(coalesce(list_sum(list_transform(toks,
              t -> CAST(floor((length(t) + 3) / 4.0) AS BIGINT))), 0) AS BIGINT) AS n_bpe_tokens
      FROM ({_SQL_TOKS})
    """,
    "doc_fingerprint": f"""
      SELECT doc_id,
        md5(trim(lower(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))) AS fp_md5,
        sha256(trim(lower(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))) AS fp_sha256,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(toks, t -> CAST(ascii(t) * length(t) AS BIGINT))),
          (acc, v) -> (acc * 31 + v) % 1000000007) AS fp_rolling
      FROM ({_SQL_TOKS})
    """,
    # training-data shaping
    "doc_chunks": f"""
      WITH t AS ({_SQL_TOKS}),
      nz AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0),
      s AS (SELECT doc_id, toks,
                   unnest(range(1, greatest(len(toks) - 1, 0) + 2, 24)) AS start1
            FROM nz),
      c AS (SELECT doc_id,
                   CAST((start1 - 1) // 24 AS BIGINT) AS chunk_id,
                   list_slice(toks, start1, start1 + 31) AS chunk
            FROM s)
      SELECT doc_id, chunk_id,
             CAST(len(chunk) AS BIGINT) AS n_tokens,
             array_to_string(chunk, ' ') AS chunk_text
      FROM c
    """,
    "pack_sequences": """
      WITH n AS (
        SELECT doc_id, source,
               CAST(coalesce(list_sum(list_transform(
                 list_filter(string_split_regex(trim(lower(
                   regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))), '\\s+'),
                   w -> w <> ''),
                 t -> CAST(floor((length(t) + 3) / 4.0) AS BIGINT))), 0) AS BIGINT) AS n_tokens
        FROM documents),
      p AS (
        SELECT doc_id, source, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
                    ORDER BY doc_id ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prefix
        FROM n)
      SELECT doc_id, source, n_tokens,
             CAST(prefix // 256 AS BIGINT) AS bin_id,
             CAST(prefix % 256 AS BIGINT) AS offset
      FROM p
    """,
    "ngram_counts": f"""
      WITH t AS ({_SQL_TOKS}),
      g AS (SELECT unnest(list_transform(range(1, len(toks)),
                   i -> toks[i] || ' ' || toks[i + 1])) AS gram
            FROM t)
      SELECT gram, count(*) AS cnt FROM g GROUP BY gram
      ORDER BY cnt DESC, gram ASC LIMIT 100
    """,
    "vocab_ids": f"""
      SELECT word, cnt,
             CAST(row_number() OVER (ORDER BY cnt DESC, word ASC) AS BIGINT) AS vocab_id
      FROM ({_SQL_WORDCOUNT}) WHERE cnt >= 5
    """,
    "bpe_pair_counts": f"""
      WITH {_bpe_ctes(1)}
      SELECT l AS "left", r AS "right", cnt AS pair_freq
      FROM p0 ORDER BY pair_freq DESC, "left", "right" LIMIT 50
    """,
    "bpe_merges": f"""
      WITH {_bpe_ctes(BPE_MERGES)}
      SELECT * FROM (
        {" UNION ALL ".join(
            f'SELECT CAST({i + 1} AS BIGINT) AS "rank", l AS "left", r AS "right", '
            f'l || r AS merged, cnt AS pair_freq FROM b{i}'
            for i in range(BPE_MERGES))}
      ) ORDER BY "rank"
    """,
    "bpe_encode": _bpe_encode_sql(BPE_MERGES),
    "bpe_compression_by_lang": _bpe_compression_sql(BPE_MERGES),
    "pack_sequences_bpe": _bpe_pack_sql(BPE_MERGES),
    "bm25_topk": f"""
      WITH t AS ({_SQL_TOKS}),
      pd AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
               CAST(len(list_filter(toks, x -> x = 'spark')) AS BIGINT) AS tf_0,
               CAST(len(list_filter(toks, x -> x = 'join')) AS BIGINT) AS tf_1,
               CAST(len(list_filter(toks, x -> x = 'fast')) AS BIGINT) AS tf_2
             FROM t),
      st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl,
              CAST(sum(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_0,
              CAST(sum(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_1,
              CAST(sum(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_2
             FROM pd)
      SELECT doc_id, round(CAST(0.0 AS DOUBLE) + (round(ln((CAST(n_docs AS DOUBLE) - CAST(df_0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) / (CAST(df_0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)), 9) * (CAST(tf_0 AS DOUBLE) * CAST(2.2 AS DOUBLE)) / (CAST(tf_0 AS DOUBLE) + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + (CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE)) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))) + round(ln((CAST(n_docs AS DOUBLE) - CAST(df_1 AS DOUBLE) + CAST(0.5 AS DOUBLE)) / (CAST(df_1 AS DOUBLE) + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)), 9) * (CAST(tf_1 AS DOUBLE) * CAST(2.2 AS DOUBLE)) / (CAST(tf_1 AS DOUBLE) + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + (CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE)) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))) + round(ln((CAST(n_docs AS DOUBLE) - CAST(df_2 AS DOUBLE) + CAST(0.5 AS DOUBLE)) / (CAST(df_2 AS DOUBLE) + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)), 9) * (CAST(tf_2 AS DOUBLE) * CAST(2.2 AS DOUBLE)) / (CAST(tf_2 AS DOUBLE) + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + (CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE)) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))), 6) AS bm25
      FROM pd CROSS JOIN st
      ORDER BY bm25 DESC, doc_id ASC LIMIT 50
    """,
    "inverted_index": f"""
      WITH s AS ({_SQL_SHINGLES}),
      p AS (SELECT DISTINCT doc_id, unnest(shset) AS phrase FROM s)
      SELECT phrase, count(*) AS df,
             array_to_string(list_sort(list(doc_id)), ',') AS postings
      FROM p GROUP BY phrase HAVING count(*) BETWEEN 2 AND 20
    """,
    "bigram_pmi": f"""
      WITH t AS ({_SQL_TOKS}),
      u AS (SELECT w, count(*) AS c
            FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
      b AS (SELECT pr[1] AS w1, pr[2] AS w2, count(*) AS cnt
            FROM (SELECT unnest(list_transform(range(1, len(toks)),
                        i -> [toks[i], toks[i + 1]])) AS pr FROM t)
            GROUP BY 1, 2 HAVING count(*) >= 5),
      tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n_tok_total FROM u),
      nbt AS (SELECT CAST(sum(greatest(len(toks) - 1, 0)) AS DOUBLE) AS n_big_total
              FROM t)
      SELECT w1 || ' ' || w2 AS gram, CAST(cnt AS BIGINT) AS cnt,
             round(ln((CAST(cnt AS DOUBLE) * n_tok_total * n_tok_total)
                  / (n_big_total * CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))), 6) AS pmi
      FROM b
      JOIN (SELECT w AS w1, c AS c1 FROM u) USING (w1)
      JOIN (SELECT w AS w2, c AS c2 FROM u) USING (w2), tot, nbt
    """,
    "top_terms_per_lang": f"""
      WITH t AS ({_SQL_TOKS}),
      cc AS (SELECT lang, word, count(*) AS cnt
             FROM (SELECT lang, unnest(toks) AS word FROM t) GROUP BY 1, 2)
      SELECT lang, word, cnt, rn FROM (
        SELECT lang, word, cnt,
               CAST(row_number() OVER (PARTITION BY lang
                    ORDER BY cnt DESC, word ASC) AS BIGINT) AS rn
        FROM cc) WHERE rn <= 5
    """,
    "incremental_dedup": """
      WITH fp AS (
        SELECT doc_id,
               md5(trim(lower(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))) AS fp_md5
        FROM documents)
      SELECT doc_id, fp_md5 FROM fp
      WHERE doc_id % 10 = 0
        AND fp_md5 NOT IN (SELECT fp_md5 FROM fp WHERE doc_id % 10 <> 0)
    """,
    # curation / filtering
    "cms_heavy_hitters": f"""
      WITH wc AS ({_SQL_WORDCOUNT}),
      h AS (SELECT word, cnt,
                   CAST(concat('0x', substr(md5(word), 1, 15)) AS BIGINT) AS hv
            FROM wc),
      {", ".join(
        f"s{j} AS (SELECT (hv >> {10 * j}) % 1024 AS b{j}, "
        f"CAST(sum(cnt) AS BIGINT) AS c{j} FROM h GROUP BY 1)"
        for j in range(4))},
      top AS (SELECT word, cnt, hv FROM h ORDER BY cnt DESC, word ASC LIMIT 20)
      SELECT top.word, top.cnt AS true_cnt,
             least(s0.c0, s1.c1, s2.c2, s3.c3) AS est_cnt,
             least(s0.c0, s1.c1, s2.c2, s3.c3) - top.cnt AS overcount
      FROM top
      JOIN s0 ON s0.b0 = (top.hv >> 0) % 1024
      JOIN s1 ON s1.b1 = (top.hv >> 10) % 1024
      JOIN s2 ON s2.b2 = (top.hv >> 20) % 1024
      JOIN s3 ON s3.b3 = (top.hv >> 30) % 1024
    """,
    "hll_users_portable": """
      WITH h AS (
        SELECT event_type, user_id,
               CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        FROM events),
      r AS (SELECT event_type, hv % 256 AS reg,
                   CASE WHEN (hv >> 8) = 0 THEN 53
                        ELSE 53 - length(bin(hv >> 8)) END AS rho
            FROM h),
      m AS (SELECT event_type, reg, max(rho) AS mj FROM r GROUP BY 1, 2),
      g AS (SELECT event_type, count(*) AS n_filled,
                   CAST(sum(1::BIGINT << CAST(53 - mj AS INTEGER)) AS BIGINT) AS s_filled
            FROM m GROUP BY 1),
      e AS (SELECT event_type, n_filled,
                   4.2399330249068963e+20
                   / CAST(s_filled + (256 - n_filled) * (1::BIGINT << 53) AS DOUBLE) AS e_raw
            FROM g),
      est AS (SELECT event_type,
                     round(CASE WHEN e_raw <= 640.0 AND n_filled < 256
                           THEN 256.0 * ln(256.0 / CAST(256 - n_filled AS DOUBLE))
                           ELSE e_raw END, 6) AS est_distinct
              FROM e),
      ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
             FROM events GROUP BY 1)
      SELECT est.event_type, est_distinct, exact_distinct,
             round((est_distinct - exact_distinct) / exact_distinct, 6) AS rel_err
      FROM est JOIN ex USING (event_type)
    """,
    "bloom_decontaminate": f"""
      WITH toks AS ({_SQL_TOKS}),
      sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
                 range(1, len(toks) - 4),
                 i -> array_to_string(list_slice(toks, i, i + 5), ' ')))) AS sh
        FROM toks WHERE len(toks) >= 6),
      ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 20 = 0),
      tr AS (SELECT DISTINCT doc_id, sh FROM sh WHERE doc_id % 20 <> 0),
      evp AS (SELECT CAST(concat('0x', substr(md5(sh), 1, 15)) AS BIGINT) AS h FROM ev),
      bits AS (
        SELECT p >> 5 AS slot, bit_or(1::BIGINT << CAST(p % 32 AS INTEGER)) AS bits
        FROM (SELECT unnest([h % 131072, (h >> 17) % 131072, (h >> 34) % 131072]) AS p FROM evp)
        GROUP BY 1),
      trp AS (SELECT doc_id, sh,
                     CAST(concat('0x', substr(md5(sh), 1, 15)) AS BIGINT) AS h
              FROM tr),
      probed AS (
        SELECT t.doc_id,
               coalesce(((b0.bits >> CAST((t.h % 131072) % 32 AS INTEGER)) % 2) = 1, FALSE)
               AND coalesce(((b1.bits >> CAST(((t.h >> 17) % 131072) % 32 AS INTEGER)) % 2) = 1, FALSE)
               AND coalesce(((b2.bits >> CAST(((t.h >> 34) % 131072) % 32 AS INTEGER)) % 2) = 1, FALSE)
                 AS maybe
        FROM trp t
        LEFT JOIN bits b0 ON b0.slot = (t.h % 131072) >> 5
        LEFT JOIN bits b1 ON b1.slot = ((t.h >> 17) % 131072) >> 5
        LEFT JOIN bits b2 ON b2.slot = ((t.h >> 34) % 131072) >> 5),
      pd AS (SELECT doc_id, max(maybe) AS bloom_hit FROM probed GROUP BY 1),
      ex AS (SELECT DISTINCT tr.doc_id FROM tr JOIN ev USING (sh))
      SELECT pd.bloom_hit, ex.doc_id IS NOT NULL AS exact_hit,
             count(*) AS n_docs
      FROM pd LEFT JOIN ex ON pd.doc_id = ex.doc_id
      GROUP BY 1, 2
    """,
    "decontaminate": f"""
      WITH toks AS ({_SQL_TOKS}),
      sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
                 range(1, len(toks) - 4),
                 i -> array_to_string(list_slice(toks, i, i + 5), ' ')))) AS sh
        FROM toks WHERE len(toks) >= 6),
      ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 20 = 0),
      tr AS (SELECT doc_id, sh FROM sh WHERE doc_id % 20 <> 0)
      SELECT tr.doc_id, count(*) AS n_shared_ngrams
      FROM tr JOIN ev USING (sh) GROUP BY tr.doc_id
    """,
    "eval_overlap_report": f"""
      WITH toks AS ({_SQL_TOKS}),
      sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
                 range(1, len(toks) - 4),
                 i -> array_to_string(list_slice(toks, i, i + 5), ' ')))) AS sh
        FROM toks WHERE len(toks) >= 6),
      ev AS (SELECT doc_id, sh FROM sh WHERE doc_id % 20 = 0),
      tr AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 20 <> 0)
      SELECT ev.doc_id, count(*) AS n_shingles,
             CAST(count(tr.sh) AS BIGINT) AS n_shared,
             round(CAST(count(tr.sh) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
               AS leak_frac
      FROM ev LEFT JOIN tr ON ev.sh = tr.sh
      GROUP BY ev.doc_id
    """,
    "segment_affinity_suppliers": f"""
      WITH {_pagerank_ctes(PAGERANK_ITERS, seeds_sql=(
          "SELECT DISTINCT 'c' || c_custkey AS node FROM customer "
          "WHERE c_mktsegment = '" + PPR_SEGMENT + "'"))}
      SELECT node, round(r, 6) AS "rank"
      FROM r{PAGERANK_ITERS} WHERE node LIKE 's%'
      ORDER BY r DESC, node ASC LIMIT 50
    """,
    "fuzzy_word_pairs": f"""
      WITH t AS ({_SQL_TOKS}),
      u AS (SELECT w, count(*) AS c
            FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1)
      SELECT a.w AS w1, b.w AS w2,
             CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist,
             a.c AS c1, b.c AS c2
      FROM u a JOIN u b ON a.w < b.w
      WHERE levenshtein(a.w, b.w) <= 2
    """,
    "purchase_pagerank": f"""
      WITH {_pagerank_ctes(PAGERANK_ITERS)}
      SELECT node, round(r, 6) AS "rank"
      FROM r{PAGERANK_ITERS} ORDER BY r DESC, node ASC LIMIT 100
    """,
    "repetition_stats": f"""
      WITH toks AS ({_SQL_TOKS}),
      t AS (SELECT doc_id, unnest(toks) AS tok,
                   unnest(range(1, len(toks) + 1)) AS pos
            FROM toks WHERE len(toks) > 0),
      tc AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2),
      ts AS (SELECT doc_id, sum(c) AS n_tokens, max(c) AS top_tok FROM tc GROUP BY 1),
      bgc AS (SELECT doc_id, g, count(*) AS c FROM (
                SELECT doc_id,
                       tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS g
                FROM t) WHERE g IS NOT NULL GROUP BY 1, 2),
      bs AS (SELECT doc_id, max(c) AS top_bg FROM bgc GROUP BY 1),
      runs AS (SELECT doc_id, run_id, count(*) AS run_len FROM (
                 SELECT doc_id, pos,
                        sum(CASE WHEN prev IS NULL OR prev <> tok THEN 1 ELSE 0 END)
                          OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
                 FROM (SELECT doc_id, pos, tok,
                              lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
                       FROM t)) GROUP BY 1, 2),
      rs AS (SELECT doc_id, max(run_len) AS max_run_len FROM runs GROUP BY 1)
      SELECT d.doc_id,
             CAST(coalesce(ts.n_tokens, 0) AS BIGINT) AS n_tokens,
             round(coalesce(ts.top_tok, 0) / greatest(coalesce(ts.n_tokens, 0), 1), 6)
               AS top_token_frac,
             round(coalesce(bs.top_bg, 0) / greatest(coalesce(ts.n_tokens, 0) - 1, 1), 6)
               AS top_bigram_frac,
             CAST(coalesce(rs.max_run_len, 0) AS BIGINT) AS max_run_len
      FROM documents d
      LEFT JOIN ts USING (doc_id) LEFT JOIN bs USING (doc_id) LEFT JOIN rs USING (doc_id)
    """,
    "token_budget_mixture": f"""
      WITH q AS (
        SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_toks, round(
          least(len(toks) / 50.0, 1.0) * 0.35
          + (1.0 - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))
                   / greatest(length(text), 1)) * 0.25
          + (len(list_distinct(toks)) / greatest(len(toks), 1)) * 0.2
          + least(len(list_filter(toks, t -> t IN ('the','a','and','of','is'))) / 5.0, 1.0) * 0.2
        , 6) AS quality
        FROM ({_SQL_TOKS})),
      c AS (
        SELECT *, coalesce(sum(n_toks) OVER (
                 PARTITION BY lang ORDER BY quality DESC, doc_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        FROM q)
      SELECT lang, count(*) AS n_docs_kept,
             CAST(sum(n_toks) AS BIGINT) AS tokens_kept,
             min(quality) AS min_quality
      FROM c WHERE cum_before < 3000 GROUP BY lang
    """,
    "mixture_sample": """
      WITH c AS (SELECT lang, count(*) AS n_g FROM documents GROUP BY 1),
      m AS (SELECT min(n_g) AS min_n FROM c)
      SELECT d.doc_id, d.lang, d.source
      FROM documents d JOIN c USING (lang), m
      WHERE CAST(concat('0x', substr(md5(trim(lower(
              regexp_replace(d.text, '[^a-zA-Z0-9\\s]', '', 'g')))), 1, 8)) AS BIGINT)
            / 4294967296.0 < min_n / n_g
    """,
    "shard_manifest": f"""
      WITH t AS (SELECT doc_id, len(toks) AS n_toks FROM ({_SQL_TOKS})),
      b AS (SELECT max(doc_id) AS max_id FROM documents)
      SELECT CAST(floor(doc_id / ceil((max_id + 1) / 8.0)) AS BIGINT) AS shard_id,
             count(*) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS n_tokens,
             min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
      FROM t, b GROUP BY 1
    """,
    "documents_sample": """
      SELECT doc_id, lang, source FROM documents
      WHERE substr(md5(trim(lower(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))), 1, 1)
            IN ('0', '1')
    """,
    # dedup
    "dedup_exact": """
      SELECT md5(trim(lower(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))) AS fp_md5,
             min(doc_id) AS keep_doc_id, count(*) AS n_dups
      FROM documents GROUP BY 1
    """,
    "dedup_keep_best": f"""
      WITH s AS (
        SELECT doc_id,
               md5(trim(lower(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))) AS fp_md5,
               round(
                 least(len(toks) / 50.0, 1.0) * 0.35
                 + (1.0 - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))
                          / greatest(length(text), 1)) * 0.25
                 + (len(list_distinct(toks)) / greatest(len(toks), 1)) * 0.2
                 + least(len(list_filter(toks, t -> t IN ('the','a','and','of','is'))) / 5.0, 1.0) * 0.2
               , 6) AS quality
        FROM ({_SQL_TOKS})),
      r AS (SELECT fp_md5, doc_id, quality,
                   row_number() OVER (PARTITION BY fp_md5 ORDER BY quality DESC, doc_id ASC) AS rn,
                   count(*) OVER (PARTITION BY fp_md5) AS n_dups
            FROM s)
      SELECT fp_md5, doc_id AS keep_doc_id, quality, n_dups FROM r WHERE rn = 1
    """,
    "events_unpivot": """
      WITH p AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        FROM events GROUP BY 1)
      UNPIVOT p ON click, error, purchase, signup, view INTO NAME event_type VALUE n
    """,
    "weighted_doc_sample": f"""
      WITH q AS (
        SELECT doc_id, lang,
               round(
                 least(len(toks) / 50.0, 1.0) * 0.35
                 + (1.0 - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))
                          / greatest(length(text), 1)) * 0.25
                 + (len(list_distinct(toks)) / greatest(len(toks), 1)) * 0.2
                 + least(len(list_filter(toks, t -> t IN ('the','a','and','of','is'))) / 5.0, 1.0) * 0.2
               , 6) AS quality,
               round(ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1)
                        / 4294967297.0), 9) AS lnu
        FROM ({_SQL_TOKS})),
      r AS (SELECT doc_id, lang, quality,
                   row_number() OVER (PARTITION BY lang
                     ORDER BY lnu / quality DESC, doc_id ASC) AS rn
            FROM q WHERE quality > 0)
      SELECT doc_id, lang, quality, CAST(rn AS BIGINT) AS "rank"
      FROM r WHERE rn <= 20
    """,
    "events_profile": """
      SELECT 'event_id' AS "column", count(*) AS n_rows,
             count(*) - count(event_id) AS n_nulls,
             count(DISTINCT event_id) AS n_distinct FROM events
      UNION ALL SELECT 'ts' AS "column", count(*) AS n_rows,
             count(*) - count(ts) AS n_nulls,
             count(DISTINCT ts) AS n_distinct FROM events
      UNION ALL SELECT 'user_id' AS "column", count(*) AS n_rows,
             count(*) - count(user_id) AS n_nulls,
             count(DISTINCT user_id) AS n_distinct FROM events
      UNION ALL SELECT 'event_type' AS "column", count(*) AS n_rows,
             count(*) - count(event_type) AS n_nulls,
             count(DISTINCT event_type) AS n_distinct FROM events
      UNION ALL SELECT 'value' AS "column", count(*) AS n_rows,
             count(*) - count(value) AS n_nulls,
             count(DISTINCT value) AS n_distinct FROM events
      UNION ALL SELECT 'props' AS "column", count(*) AS n_rows,
             count(*) - count(props) AS n_nulls,
             count(DISTINCT props) AS n_distinct FROM events
    """,
    "user_activity_decay": """
      WITH r AS (
        SELECT user_id, CAST(value AS DOUBLE) AS v,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      SELECT user_id, count(*) AS n_events,
             round(CAST(CAST(sum(CAST(round(v * power(0.5, rn), 9) AS DECIMAL(20,9)))
                        AS VARCHAR) AS DOUBLE), 6) AS decayed_value
      FROM r GROUP BY 1
    """,
    "user_activity_decay_fold": """
      SELECT user_id, count(*) AS n_events,
             round(list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                            list(CAST(value AS DOUBLE) ORDER BY ts, event_id)),
               (acc, v) -> (acc + v) * 0.5), 6) AS decayed_value
      FROM events GROUP BY 1
    """,
    # oracle = all-pairs scan, restricted ONLY by the size lemma
    # (J >= t  =>  t*|b| <= |a| <= |b|/t: intersect <= min size,
    # union >= max size, so J <= min/max), which is independent of
    # the prefix filter under test -- the hash match still proves the
    # prefix candidate generation lossless, and the 4x pair cut keeps
    # the quadratic oracle runnable at sweep SFs.
    "jaccard_prefix_pairs": f"""
      WITH g AS (SELECT doc_id, shset AS st FROM ({_SQL_SHINGLES})
                 WHERE len(shset) > 0),
      p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(len(list_intersect(a.st, b.st)) AS BIGINT) AS inter,
              CAST(len(a.st) + len(b.st) - len(list_intersect(a.st, b.st)) AS BIGINT)
                AS union_sz
            FROM g a JOIN g b ON a.doc_id < b.doc_id
            WHERE len(a.st) * 5 >= len(b.st) * 4
              AND len(b.st) * 5 >= len(a.st) * 4)
      SELECT doc_a, doc_b, inter, union_sz,
             round(CAST(inter AS DOUBLE) / union_sz, 6) AS jaccard
      FROM p WHERE 5 * inter >= 4 * union_sz
    """,
    "cluster_topics": f"""
      WITH km AS ({_kmeans_cells_sql()}),
      t AS ({_SQL_TOKS}),
      w AS (SELECT doc_id, unnest(toks) AS word FROM t),
      j AS (SELECT km.cell, w.word FROM w JOIN km ON w.doc_id = km.vec_id),
      cw AS (SELECT cell, word, count(*) AS cnt FROM j GROUP BY 1, 2),
      ct AS (SELECT cell, sum(cnt) AS ctot FROM cw GROUP BY 1),
      wt AS (SELECT word, sum(cnt) AS wtot FROM cw GROUP BY 1),
      g AS (SELECT sum(cnt) AS gtot FROM cw),
      s AS (SELECT cw.cell, cw.word, CAST(cw.cnt AS BIGINT) AS cnt,
              round((CAST(cnt AS DOUBLE) / ctot) / (CAST(wtot AS DOUBLE) / gtot), 6)
                AS lift
            FROM cw JOIN ct USING (cell) JOIN wt USING (word) CROSS JOIN g
            WHERE cnt >= 5),
      r AS (SELECT *, row_number() OVER (PARTITION BY cell
              ORDER BY lift DESC, word ASC) AS rn FROM s)
      SELECT cell, word, cnt, lift, CAST(rn AS BIGINT) AS "rank"
      FROM r WHERE rn <= 5
    """,
    "ngram_jaccard": f"""
      WITH sh AS ({_SQL_SHINGLES}),
      e AS (SELECT doc_id, unnest(shset) AS s FROM sh),
      rare AS (SELECT s FROM e GROUP BY s HAVING count(*) BETWEEN 2 AND 3),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM e a JOIN rare USING (s) JOIN e b USING (s)
               WHERE a.doc_id < b.doc_id),
      j AS (SELECT doc_a, doc_b,
                   round(len(list_intersect(sa.shset, sb.shset))
                         / len(list_distinct(list_concat(sa.shset, sb.shset))), 6) AS jaccard
            FROM cand
            JOIN sh sa ON sa.doc_id = cand.doc_a
            JOIN sh sb ON sb.doc_id = cand.doc_b)
      SELECT * FROM j WHERE jaccard >= 0.05
    """,
    "minhash_near_dup": _minhash_pairs_sql(),
    "simhash": _simhash_sql(),
    "simhash_pairs": _simhash_pairs_sql(),
    "dedup_clusters": _dedup_clusters_sql(),
    "curate_documents": _curate_documents_sql(),
    "kmeans_cells": _kmeans_cells_sql(),
    "ann_ivf_kmeans": _ann_ivf_kmeans_sql(),
    "pq_codes": _pq_codes_sql(),
    "pq_search": _pq_search_sql(),
    "ann_ivfpq": _ivfpq_sql(),
    "ann_ivfpq_residual": _ivfpq_residual_sql(),
    "semantic_dedup": _semantic_dedup_sql(),
    "dsir_weights": _dsir_sql(),
    "nb_lang_scores": """
      WITH t0 AS (SELECT doc_id, lang,
                         list_filter(string_split_regex(trim(lower(
                           regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))), '\\s+'),
                           w -> w <> '') AS toks
                  FROM documents),
      tr AS (SELECT doc_id, lang, unnest(toks) AS w FROM t0),
      tokm AS (SELECT doc_id, lang, w, count(*) AS m FROM tr GROUP BY 1, 2, 3),
      tokc AS (SELECT lang, w, count(*) AS c FROM tr GROUP BY 1, 2),
      cls AS (SELECT lang, count(*) AS nt FROM tr GROUP BY 1),
      nd AS (SELECT lang, count(*) AS nd FROM documents GROUP BY 1),
      ntot AS (SELECT count(*) AS n FROM documents),
      voc AS (SELECT DISTINCT w FROM tr),
      vv AS (SELECT count(*) AS v FROM voc),
      model AS (SELECT c2.lang AS cand, voc.w,
                       CAST(round(ln((coalesce(tc.c, 0) + 1.0)
                              / CAST(c2.nt + vv.v AS DOUBLE)), 9) AS DECIMAL(12,9)) AS lp
                FROM voc CROSS JOIN cls c2 CROSS JOIN vv
                LEFT JOIN tokc tc ON tc.lang = c2.lang AND tc.w = voc.w),
      priors AS (SELECT nd.lang AS cand,
                        CAST(round(ln(CAST(nd.nd AS DOUBLE) / CAST(ntot.n AS DOUBLE)), 9)
                             AS DECIMAL(12,9)) AS lp0
                 FROM nd CROSS JOIN ntot),
      sc AS (SELECT tm.doc_id, tm.lang, mo.cand,
                    sum(CAST(tm.m AS DECIMAL(10,0)) * mo.lp) AS s
             FROM tokm tm JOIN model mo ON mo.w = tm.w GROUP BY 1, 2, 3),
      tot AS (SELECT sc.doc_id, sc.lang, sc.cand, sc.s + p.lp0 AS total
              FROM sc JOIN priors p ON p.cand = sc.cand),
      r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                      ORDER BY total DESC, cand ASC) AS rk FROM tot)
      SELECT doc_id, lang, cand AS pred_lang,
             round(CAST(CAST(total AS VARCHAR) AS DOUBLE), 6) AS nb_score
      FROM r WHERE rk = 1
    """,
    "orders_grouping_sets": """
      SELECT CAST(grouping(o_orderpriority) * 2 + grouping(o_year) AS BIGINT) AS gid,
             o_orderpriority,
             CAST(o_year AS BIGINT) AS o_year,
             count(*) AS n_orders,
             round(CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE), 6)
               AS total_price
      FROM (SELECT o_orderpriority, year(o_orderdate) AS o_year, o_totalprice FROM orders)
      GROUP BY GROUPING SETS ((o_orderpriority), (o_year), ())
    """,
    "purchase_and_signup_users": """
      SELECT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'signup'
    """,
    "temperature_sample": _temperature_sql(),
    "customer_spend_percentiles": """
      WITH s AS (SELECT o_custkey,
                        CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS spend
                 FROM orders GROUP BY 1)
      SELECT o_custkey AS custkey, spend,
             round(percent_rank() OVER (ORDER BY spend ASC, o_custkey ASC), 6) AS pct_rank,
             round(cume_dist() OVER (ORDER BY spend ASC, o_custkey ASC), 6) AS cume
      FROM s
    """,
    "events_anomaly_zscore": """
      WITH e AS (SELECT event_id, event_type, CAST(value AS DOUBLE) AS v FROM events),
      st AS (SELECT event_type,
                    CAST(CAST(sum(CAST(v AS DECIMAL(27,12))) AS VARCHAR) AS DOUBLE) AS s1,
                    CAST(CAST(sum(CAST(v AS DECIMAL(18,6)) * CAST(v AS DECIMAL(18,6)))
                         AS VARCHAR) AS DOUBLE) AS s2,
                    count(*) AS n
             FROM e GROUP BY 1),
      m AS (SELECT event_type, s1 / n AS mu,
                   sqrt((s2 / n) - (s1 / n) * (s1 / n)) AS sd
            FROM st),
      o AS (SELECT e.event_id, e.event_type, e.v,
                   (e.v - m.mu) / nullif(m.sd, 0) AS zscore
            FROM e JOIN m USING (event_type))
      SELECT event_id, event_type, round(v, 6) AS value, round(zscore, 6) AS zscore
      FROM o WHERE abs(zscore) > 3.0
    """,
    "late_shipments": """
      SELECT o_orderpriority AS priority,
             count(*) AS n_lineitems,
             CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
             round(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                            THEN 1 ELSE 0 END) / count(*), 6) AS late_frac
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1
    """,
    "events_quantiles_binned": """
      WITH b AS (SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bin,
                        count(*) AS c
                 FROM events GROUP BY 1, 2),
      cum AS (SELECT *, sum(c) OVER (PARTITION BY event_type ORDER BY bin
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
              sum(c) OVER (PARTITION BY event_type) AS n FROM b)
      SELECT event_type,
             round(CAST(min(CASE WHEN cum >= ceil(0.5 * n) THEN bin END) AS DOUBLE) * CAST(10.0 AS DOUBLE), 6) AS p50_bin,
             round(CAST(min(CASE WHEN cum >= ceil(0.9 * n) THEN bin END) AS DOUBLE) * CAST(10.0 AS DOUBLE), 6) AS p90_bin,
             round(CAST(min(CASE WHEN cum >= ceil(0.99 * n) THEN bin END) AS DOUBLE) * CAST(10.0 AS DOUBLE), 6) AS p99_bin,
             CAST(max(n) AS BIGINT) AS n_events
      FROM cum GROUP BY event_type
    """,
    "duplicate_spans": _duplicate_spans_sql(),
    # similarity
    "embedding_quantize": """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      f AS (SELECT vec_id, unnest(v) AS x, unnest(range(1, len(v) + 1)) AS pos FROM e),
      st AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM f GROUP BY 1),
      arr AS (SELECT list(mn ORDER BY pos) AS mins, list(mx ORDER BY pos) AS maxs FROM st),
      c AS (SELECT vec_id, v, mins, maxs,
              list_transform(range(1, len(v) + 1), i ->
                CASE WHEN maxs[i] > mins[i]
                     THEN CAST(floor(((v[i] - mins[i]) * 255.0) / (maxs[i] - mins[i])) AS INT)
                     ELSE 0 END) AS codes
            FROM e, arr),
      er AS (SELECT vec_id, codes, len(v) AS nd,
               list_transform(range(1, len(v) + 1), i ->
                 CASE WHEN maxs[i] > mins[i]
                      THEN (v[i] - (mins[i] + ((CAST(codes[i] AS DOUBLE) + 0.5)
                             * (maxs[i] - mins[i])) / 255.0))
                      ELSE 0.0 END) AS err
             FROM c)
      SELECT vec_id,
             CAST(nd AS BIGINT) AS n_dims,
             CAST(list_sum(codes) AS BIGINT) AS code_sum,
             CAST(list_min(codes) AS BIGINT) AS code_min,
             CAST(list_max(codes) AS BIGINT) AS code_max,
             round(list_sum(list_transform(err, d -> d * d)) / nd, 6) AS mse
      FROM er
    """,
    "knn_cosine": """
      WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
                 FROM embeddings WHERE vec_id < 10),
      s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                   round(list_cosine_similarity(q.qvec, CAST(e.embedding AS DOUBLE[])), 6) AS cosine
            FROM q, embeddings e WHERE e.vec_id <> q.query_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM s)
      SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
      FROM r WHERE rank <= 5
    """,
    "ann_lsh": _ann_lsh_sql(),
    # IVF ANN: centroids are exact decimal-sum means, so the full
    # probe/serve plan is reproducible in SQL
    "ann_ivf": """
      WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS dvec FROM embeddings),
      i AS (SELECT label, dvec, unnest(range(1, len(dvec) + 1)) AS idx FROM v),
      m AS (SELECT label AS cell, idx,
                   CAST(CAST(sum(CAST(dvec[idx] AS DECIMAL(27,12))) AS VARCHAR) AS DOUBLE)
                   / count(*) AS c
            FROM i GROUP BY label, idx),
      cents AS (SELECT cell, list(c ORDER BY idx ASC) AS cvec FROM m GROUP BY cell),
      q AS (SELECT vec_id AS query_id, dvec AS qvec FROM v WHERE vec_id < 10),
      qc AS (SELECT q.query_id, q.qvec, c.cell,
                    list_cosine_similarity(q.qvec, c.cvec) AS csim
             FROM q CROSS JOIN cents c),
      probes AS (SELECT query_id, qvec, cell FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY csim DESC, cell ASC) AS pr FROM qc) WHERE pr <= 2),
      s AS (SELECT p.query_id, p.cell, e.vec_id AS neighbor_id,
                   round(list_cosine_similarity(p.qvec, e.dvec), 6) AS cosine
            FROM probes p JOIN v e ON e.label = p.cell
            WHERE e.vec_id <> p.query_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM s)
      SELECT query_id, cell, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
      FROM r WHERE rank <= 5
    """,
    # LSH-bucketed dup pairs: buckets are the deterministic LCG
    # planes, so the recall<1 scale path is still exactly-checkable
    "embedding_dup_pairs_lsh": f"""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dvec FROM embeddings),
      b AS (SELECT vec_id, dvec, CAST({_bucket_terms_sql()} AS BIGINT) AS bucket FROM v),
      p AS (SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
                   round(list_cosine_similarity(a.dvec, c.dvec), 6) AS cosine
            FROM b a JOIN b c USING (bucket)
            WHERE a.vec_id < c.vec_id)
      SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= 0.35
    """,
    "label_centroids": """
      WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS dvec FROM embeddings),
      i AS (SELECT label, dvec, unnest(range(1, len(dvec) + 1)) AS idx FROM e),
      f AS (SELECT label, CAST(idx - 1 AS BIGINT) AS pos, dvec[idx] AS v FROM i)
      SELECT label, pos,
             round(CAST(CAST(sum(CAST(v AS DECIMAL(27,12))) AS VARCHAR) AS DOUBLE)
                   / count(*), 6) AS centroid
      FROM f GROUP BY label, pos
    """,
    # connected components over the SQL-reproducible ngram-Jaccard
    # edges: recursive CTE = transitive min-label closure
    "leakage_safe_split": f"""
      WITH cl AS ({_dedup_clusters_sql()}),
      assigned AS (
        SELECT d.doc_id, coalesce(cl.cluster, d.doc_id) AS cluster
        FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id)
      SELECT doc_id, cluster,
             CASE WHEN substring(md5(CAST(cluster AS VARCHAR)), 1, 1) = '0'
                  THEN 'val' ELSE 'train' END AS split
      FROM assigned
    """,
    "dedup_clusters_jaccard": f"""
      WITH RECURSIVE base AS (
        WITH sh AS ({_SQL_SHINGLES}),
        e AS (SELECT doc_id, unnest(shset) AS s FROM sh),
        rare AS (SELECT s FROM e GROUP BY s HAVING count(*) BETWEEN 2 AND 3),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM e a JOIN rare USING (s) JOIN e b USING (s)
                 WHERE a.doc_id < b.doc_id),
        j AS (SELECT doc_a, doc_b,
                     round(len(list_intersect(sa.shset, sb.shset))
                           / len(list_distinct(list_concat(sa.shset, sb.shset))), 6) AS jaccard
              FROM cand
              JOIN sh sa ON sa.doc_id = cand.doc_a
              JOIN sh sb ON sb.doc_id = cand.doc_b)
        SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.05
      ),
      ee AS (SELECT doc_a, doc_b FROM base
             UNION ALL
             SELECT doc_b AS doc_a, doc_a AS doc_b FROM base),
      cc AS (
        SELECT doc_a AS doc_id, doc_a AS label FROM ee
        UNION
        SELECT ee.doc_a AS doc_id, cc.label FROM ee JOIN cc ON cc.doc_id = ee.doc_b
      )
      SELECT doc_id, min(label) AS cluster FROM cc GROUP BY doc_id
    """,
    "embedding_dup_pairs": """
      SELECT * FROM (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 6) AS cosine
        FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id
      ) WHERE cosine >= 0.35
    """,
    # multimodal: meta, plus the deterministic fake decode recomputed
    # from the UTF-8 bytes (hex -> per-byte ints) entirely in SQL
    "multimodal_decode": """
      WITH h AS (
        SELECT doc_id, octet_length(encode(text)) AS nb,
               lower(hex(encode(text))) AS hx
        FROM documents),
      b AS (
        SELECT doc_id, nb,
               list_transform(range(1, nb + 1),
                 i -> (strpos('0123456789abcdef', substr(hx, 2*i - 1, 1)) - 1) * 16
                    + (strpos('0123456789abcdef', substr(hx, 2*i, 1)) - 1)) AS bytes
        FROM h)
      SELECT doc_id, 'text' AS modality, CAST(nb AS BIGINT) AS n_bytes,
             CAST(nb AS DOUBLE) AS f_len,
             CAST(CASE WHEN nb > 0 THEN bytes[1] ELSE 0 END AS DOUBLE) AS f_first,
             CAST(CASE WHEN nb > 0 THEN bytes[nb] ELSE 0 END AS DOUBLE) AS f_last,
             CAST(coalesce(list_sum(bytes), 0) % 997 AS DOUBLE) AS f_sum_mod
      FROM b
    """,
    "multimodal_phash_dup": """
      WITH h AS (
        SELECT doc_id, octet_length(encode(text)) AS nb,
               lower(hex(encode(text))) AS hx
        FROM documents),
      b AS (
        SELECT doc_id, nb,
               list_transform(range(1, nb + 1),
                 i -> (strpos('0123456789abcdef', substr(hx, 2*i - 1, 1)) - 1) * 16
                    + (strpos('0123456789abcdef', substr(hx, 2*i, 1)) - 1)) AS bytes
        FROM h),
      f AS (
        SELECT doc_id, nb,
               CASE WHEN nb > 0 THEN bytes[1] ELSE 0 END AS f_first,
               CASE WHEN nb > 0 THEN bytes[nb] ELSE 0 END AS f_last,
               coalesce(list_sum(bytes), 0) % 997 AS f_sum_mod
        FROM b),
      p AS (
        SELECT doc_id,
               CAST((CASE WHEN nb >= 300 THEN 1 ELSE 0 END)
                  + (CASE WHEN f_first >= 128 THEN 2 ELSE 0 END)
                  + (CASE WHEN f_last >= 128 THEN 4 ELSE 0 END)
                  + (CASE WHEN f_sum_mod >= 498 THEN 8 ELSE 0 END) AS BIGINT) AS phash
        FROM f)
      SELECT phash, min(doc_id) AS keep_doc_id, count(*) AS n_docs
      FROM p GROUP BY 1
    """,
    "multimodal_frames": """
      WITH h AS (
        SELECT doc_id, octet_length(encode(text)) AS nb,
               lower(hex(encode(text))) AS hx
        FROM documents),
      f AS (SELECT doc_id, nb, hx,
                   unnest(range(0, ((nb + 15) // 16 + 3) // 4)) AS j
            FROM h WHERE nb > 0)
      SELECT doc_id, CAST(j AS BIGINT) AS frame_idx,
             substr(hx, 2 * j * 64 + 1, 2 * least(16, nb - j * 64)) AS frame,
             CAST(least(16, nb - j * 64) AS BIGINT) AS n_bytes
      FROM f
    """,
    "multimodal_resize": """
      WITH h AS (
        SELECT doc_id, octet_length(encode(text)) AS nb,
               lower(hex(encode(text))) AS hx
        FROM documents),
      s AS (SELECT doc_id, nb, hx, greatest(nb // 64, 1) AS step FROM h)
      SELECT doc_id, CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
             CASE WHEN nb = 0 THEN '' ELSE
               array_to_string(list_transform(
                 range(0, least(64, (nb + step - 1) // step)),
                 k -> substr(hx, 2 * k * step + 1, 2)), '') END AS thumb
      FROM s
    """,
    "multimodal_meta": """
      SELECT doc_id, 'text' AS modality,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             sha256(text) AS content_sha256
      FROM documents
    """,
    # salted wordcount + tf-idf
    "wordcount_salted": _SQL_WORDCOUNT,
    "wordcount_sql": _SQL_WORDCOUNT,
    "tfidf_top_terms": f"""
      WITH w AS (SELECT doc_id, word FROM (
             SELECT doc_id, unnest(string_split_regex(trim(lower(
               regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))), '\\s+')) AS word
             FROM documents) WHERE word <> ''),
      tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2),
      n AS (SELECT count(*) AS n_docs FROM documents),
      dfq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
      idf AS (SELECT word, ln((n_docs + 1.0) / (df + 1.0)) + 1.0 AS idf FROM dfq, n),
      s AS (SELECT doc_id, tf.word AS word, tf, round(tf * idf, 6) AS score
            FROM tf JOIN idf USING (word))
      SELECT doc_id, word, tf, score, CAST(rn AS BIGINT) AS rn FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, word ASC) AS rn FROM s)
      WHERE rn <= 3
    """,
    "word_skew_profile": f"""
      WITH w AS ({_SQL_WORDCOUNT})
      SELECT count(*) AS n_words,
             CAST(sum(cnt) AS BIGINT) AS n_tokens,
             CAST(max(cnt) AS BIGINT) AS max_cnt,
             round(quantile_cont(cnt, 0.5), 6) AS p50,
             round(quantile_cont(cnt, 0.9), 6) AS p90,
             round(quantile_cont(cnt, 0.99), 6) AS p99,
             round(max(cnt) / sum(cnt), 6) AS top1_share
      FROM w
    """,
    "doc_perplexity": f"""
      WITH t AS ({_SQL_TOKS}),
      tk AS (SELECT doc_id, unnest(toks) AS w FROM t),
      uni AS (SELECT w, count(*) AS c1 FROM tk GROUP BY 1),
      v AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM uni),
      db AS (
        SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2, count(*) AS m
        FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM t)
        GROUP BY 1, 2, 3),
      big AS (SELECT w1, w2, sum(m) AS c12 FROM db GROUP BY 1, 2),
      sc AS (
        SELECT db.doc_id, CAST(db.m AS DECIMAL(10,0)) AS m,
               CAST(round(ln((big.c12 + 1.0) / (uni.c1 + v.v)), 9)
                    AS DECIMAL(12,9)) AS term
        FROM db JOIN big USING (w1, w2) JOIN uni ON uni.w = db.w1, v)
      SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
             round(-(CAST(CAST(sum(m * term) AS VARCHAR) AS DOUBLE)) / sum(m), 6)
               AS cross_entropy
      FROM sc GROUP BY 1
    """,
    "doc_tf_cosine": f"""
      WITH t AS ({_SQL_TOKS}),
      tk AS (SELECT doc_id, unnest(toks) AS w FROM t),
      tf AS (SELECT doc_id, w, count(*) AS tf FROM tk GROUP BY 1, 2),
      dfq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
      kept AS (SELECT tf.doc_id, tf.w, tf.tf
               FROM tf JOIN dfq USING (w) WHERE df <= 100),
      nrm AS (SELECT doc_id, sum(tf * tf) AS n2 FROM kept GROUP BY 1),
      dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      count(*) AS n_shared_terms, sum(a.tf * b.tf) AS dot
               FROM kept a JOIN kept b USING (w)
               WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
      cos AS (SELECT doc_a, doc_b, CAST(n_shared_terms AS BIGINT) AS n_shared_terms,
                     round(dot / (sqrt(CAST(na.n2 AS DOUBLE))
                                  * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS cosine
              FROM dots JOIN nrm na ON na.doc_id = dots.doc_a
                        JOIN nrm nb ON nb.doc_id = dots.doc_b)
      SELECT * FROM cos WHERE cosine >= 0.3
    """,
    "events_range_join": """
      SELECT l.user_id, l.event_id AS purchase_id, r.event_id AS click_id,
             epoch_us(l.ts) - epoch_us(r.ts) AS gap_us
      FROM events l JOIN events r ON l.user_id = r.user_id
      WHERE l.event_type = 'purchase' AND r.event_type = 'click'
        AND r.ts <= l.ts
        AND epoch_us(r.ts) >= epoch_us(l.ts) - 86400000000
    """,
    "embedding_project": _projection_sql(),
    "events_hopping": """
      WITH e AS (SELECT epoch_us(ts) AS us, value FROM events),
      h AS (
        SELECT (us // 900000000) * 900 - i * 900 AS ws, value
        FROM e, (SELECT unnest(range(4)) AS i)
      )
      SELECT strftime(make_timestamp(ws * 1000000), '%Y-%m-%d %H:%M:%S') AS win_start,
             count(*) AS n_events,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
      FROM h GROUP BY 1
    """,
    # grouping sets / set ops / distinct / date histograms / as-of
    "events_rollup": """
      SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             count(*) AS n_events,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
      FROM events GROUP BY ROLLUP(event_type, day)
    """,
    "events_cube": """
      SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             count(*) AS n_events,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
      FROM events GROUP BY CUBE(event_type, day)
    """,
    "orders_price_deciles": """
      WITH t AS (SELECT o_totalprice,
                        ntile(10) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS decile
                 FROM orders)
      SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n_orders,
             min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
      FROM t GROUP BY decile
    """,
    "stratified_sample": """
      SELECT doc_id, lang, source FROM documents
      WHERE CASE WHEN CAST(regexp_replace(source, '[^0-9]', '', 'g') AS BIGINT) % 2 = 0
            THEN substr(md5(trim(lower(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))), 1, 1)
                 IN ('0', '1')
            ELSE substr(md5(trim(lower(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))), 1, 1)
                 IN ('0', '1', '2', '3') END
    """,
    "repeat_customers": """
      SELECT o_custkey AS custkey FROM (
        SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        INTERSECT
        SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        EXCEPT
        SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
    """,
    "distinct_users": """
      SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
      FROM events GROUP BY event_type
    """,
    "orders_monthly": """
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             count(*) AS n_orders,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue,
             round(CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
                   / count(*), 6) AS avg_order_value
      FROM orders GROUP BY 1
    """,
    "events_pivot": """
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
      FROM events GROUP BY 1
    """,
    "signup_funnel": """
      WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
               max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
        FROM events GROUP BY user_id)
      SELECT strftime(date_trunc('day', first_signup), '%Y-%m-%d') AS signup_day,
             count(*) AS n_signups,
             CAST(sum(CASE WHEN last_purchase > first_signup THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
             round(sum(CASE WHEN last_purchase > first_signup THEN 1 ELSE 0 END) / count(*), 6) AS conversion_rate
      FROM per_user WHERE first_signup IS NOT NULL
      GROUP BY 1
    """,
    "revenue_forecast": """
      SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                           * CAST(l_discount AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS revenue,
             count(*) AS n_items
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.04 AND 0.06
        AND l_quantity < 24
    """,
    "shipping_priority": """
      SELECT l_orderkey AS orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
             o_orderpriority AS priority,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS VARCHAR) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1996-06-30 00:00:00'
        AND l_shipdate > TIMESTAMP '1996-06-30 00:00:00'
      GROUP BY 1, 2, 3
      ORDER BY revenue DESC, orderdate ASC, orderkey ASC LIMIT 10
    """,
    "large_orders": """
      SELECT l_orderkey AS orderkey, c_name AS customer,
             strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
             o_totalprice AS totalprice, total_qty
      FROM (SELECT l_orderkey,
                   CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_qty
            FROM lineitem GROUP BY l_orderkey)
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE total_qty > 150.0
    """,
    "events_quantiles": """
      SELECT event_type,
             round(quantile_cont(value, 0.5), 6) AS p50,
             round(quantile_cont(value, 0.9), 6) AS p90,
             round(quantile_cont(value, 0.99), 6) AS p99,
             count(*) AS n_events
      FROM events GROUP BY event_type
    """,
    "events_trailing_hour": """
      SELECT event_id, user_id,
             count(*) OVER (PARTITION BY user_id
                            ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                            RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_trailing_hour
      FROM events
    """,
    "customers_without_orders": """
      SELECT c_custkey AS custkey, c_name AS name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    """,
    "brands_shipped": """
      SELECT p_brand, count(*) AS n_parts FROM part
      WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      GROUP BY p_brand
    """,
    "orders_running_total": """
      SELECT o_custkey AS custkey, o_orderkey AS orderkey,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR)
                  AS DOUBLE) AS running_revenue
      FROM orders
    """,
    # two-table point-in-time join: DuckDB's native ASOF JOIN is the
    # oracle for the union+window implementation
    "events_asof_features": """
      WITH h AS (
        SELECT user_id, date_trunc('hour', ts) + INTERVAL 1 HOUR AS fts,
               count(*) AS feat_n,
               round(CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE), 6) AS feat_value
        FROM events GROUP BY 1, 2)
      SELECT e.event_id, e.user_id, e.event_type,
             strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
             h.feat_n, h.feat_value
      FROM events e ASOF LEFT JOIN h
        ON e.user_id = h.user_id AND e.ts >= h.fts
    """,
    # nearest in either direction within tolerance; tie (equal
    # distance past vs future) prefers the past row -> at equal
    # |gap_us| the NEGATIVE gap sorts first
    "events_asof_nearest": """
      WITH p AS (SELECT user_id, ts, event_id AS purchase_id
                 FROM events WHERE event_type = 'purchase'),
      c AS (SELECT user_id, ts, min(event_id) AS click_id
            FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      pairs AS (SELECT p.purchase_id, c.click_id,
                       epoch_us(c.ts) - epoch_us(p.ts) AS gap_us
                FROM p JOIN c ON p.user_id = c.user_id
                 AND abs(epoch_us(c.ts) - epoch_us(p.ts)) <= 7200000000),
      best AS (SELECT purchase_id, click_id, gap_us FROM (
          SELECT *, row_number() OVER (PARTITION BY purchase_id
                    ORDER BY abs(gap_us) ASC, gap_us ASC) AS rn
          FROM pairs) WHERE rn = 1)
      SELECT p.purchase_id, p.user_id,
             strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
             best.click_id, best.gap_us
      FROM p LEFT JOIN best USING (purchase_id)
    """,
    "events_asof_error": """
      SELECT event_id, user_id, event_type,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
             strftime(max(CASE WHEN event_type = 'error' THEN ts END)
                      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      '%Y-%m-%d %H:%M:%S') AS last_error_ts
      FROM events
    """,
    # relational analytics
    "pricing_summary": """
      SELECT l_returnflag, l_linestatus,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
                 * (CAST(1 AS DECIMAL(8,4)) + CAST(l_tax AS DECIMAL(8,4)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
        round(CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(*), 6) AS avg_qty,
        round(CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / count(*), 6) AS avg_disc,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
    """,
    "large_volume_customers": """
      WITH big AS (SELECT l_orderkey,
                          sum(CAST(l_quantity AS DECIMAL(12,2))) AS tq
                   FROM lineitem GROUP BY 1
                   HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 180)
      SELECT c_custkey AS custkey, c_name AS name, o_orderkey AS orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
             CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS DOUBLE) AS totalprice,
             CAST(CAST(tq AS VARCHAR) AS DOUBLE) AS total_qty
      FROM orders JOIN big ON o_orderkey = l_orderkey
      JOIN customer ON o_custkey = c_custkey
    """,
    "disjunctive_revenue": """
      SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
             count(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#4' AND p_size <= 10 AND l_quantity BETWEEN 1 AND 20)
         OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity BETWEEN 10 AND 30)
         OR (p_brand = 'Brand#19' AND p_size <= 30 AND l_quantity BETWEEN 20 AND 40)
    """,
    "customer_distribution": """
      WITH pc AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN
          (SELECT o_orderkey, o_custkey FROM orders
           WHERE o_orderpriority <> '4-NOT SPECIFIED') o
          ON c_custkey = o_custkey
        GROUP BY c_custkey)
      SELECT c_count, count(*) AS custdist FROM pc GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC
    """,
    "top_supplier": """
      WITH r AS (SELECT l_suppkey AS supplier_no,
                        sum(CAST(l_extendedprice AS DECIMAL(12,2))
                            * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS total_rev
                 FROM lineitem
                 WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                   AND l_shipdate < TIMESTAMP '1996-04-01'
                 GROUP BY 1)
      SELECT s_suppkey AS suppkey, s_name AS name,
             CAST(CAST(total_rev AS VARCHAR) AS DOUBLE) AS total_revenue
      FROM r JOIN supplier ON s_suppkey = supplier_no
      WHERE total_rev = (SELECT max(total_rev) FROM r)
      ORDER BY suppkey
    """,
    "small_qty_revenue": """
      WITH j AS (SELECT l_partkey, CAST(l_quantity AS DECIMAL(12,2)) AS qty,
                        CAST(l_extendedprice AS DECIMAL(12,2)) AS ep
                 FROM lineitem JOIN part ON l_partkey = p_partkey
                 WHERE p_brand = 'Brand#3'),
      pp AS (SELECT l_partkey AS agg_partkey, sum(qty) AS sum_qty,
                    count(*) AS cnt_qty
             FROM j GROUP BY 1)
      SELECT CAST(CAST(sum(ep) AS VARCHAR) AS DOUBLE) / 7.0 AS avg_yearly,
             count(*) AS n_lines
      FROM j JOIN pp ON l_partkey = agg_partkey
      WHERE qty * CAST(5 AS DECIMAL(3,0)) * CAST(cnt_qty AS DECIMAL(10,0)) < sum_qty
    """,
    "waiting_suppliers": """
      WITH lo AS (SELECT l_orderkey, l_suppkey,
                         l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  WHERE o_orderstatus = 'F'),
      per AS (SELECT l_orderkey,
                     count(DISTINCT l_suppkey) AS n_supp,
                     count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late,
                     max(CASE WHEN late THEN l_suppkey END) AS late_supp
              FROM lo GROUP BY 1)
      SELECT s_suppkey AS suppkey, s_name AS name, count(*) AS numwait
      FROM per JOIN supplier ON s_suppkey = late_supp
      WHERE n_supp >= 2 AND n_late = 1
      GROUP BY 1, 2
      ORDER BY numwait DESC, suppkey ASC
      LIMIT 25
    """,
    "product_profit": """
      SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                           * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
                         - CAST(p_retailprice AS DECIMAL(12,2))
                           * CAST(0.6 AS DECIMAL(4,2))
                           * CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
               AS sum_profit
      FROM lineitem
      JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
      ORDER BY nation, o_year DESC
    """,
    "supplier_part_counts": """
      WITH pairs AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        WHERE l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
      SELECT p_brand AS brand, p_type AS type, p_size AS size,
             count(DISTINCT l_suppkey) AS supplier_cnt
      FROM pairs JOIN part ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#1' AND p_size <= 25
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, brand, type, size
    """,
    "dominant_suppliers": """
      WITH j AS (SELECT l_partkey, l_suppkey,
                        CAST(l_quantity AS DECIMAL(12,2)) AS qty
                 FROM lineitem JOIN part ON l_partkey = p_partkey
                 WHERE p_name LIKE '%red%' AND year(l_shipdate) = 1997),
      ps AS (SELECT l_partkey, l_suppkey, sum(qty) AS sq FROM j GROUP BY 1, 2),
      tot AS (SELECT l_partkey AS tp, sum(sq) AS total_q, count(*) AS n_supp
              FROM ps GROUP BY 1),
      dom AS (SELECT DISTINCT l_suppkey FROM ps JOIN tot ON l_partkey = tp
              WHERE n_supp >= 2 AND sq * CAST(2 AS DECIMAL(2,0)) > total_q)
      SELECT s_suppkey AS suppkey, s_name AS name, n_name AS nation
      FROM dom JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      ORDER BY suppkey
    """,
    "volume_shipping": """
      WITH two AS (SELECT n_nationkey, n_name FROM nation
                   WHERE n_name IN ('NATION_1', 'NATION_2'))
      SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
             count(*) AS n_items
      FROM lineitem
      JOIN supplier s ON l_suppkey = s_suppkey
      JOIN two sn ON s.s_nationkey = sn.n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer c ON o_custkey = c_custkey
      JOIN two cn ON c.c_nationkey = cn.n_nationkey
      WHERE sn.n_name <> cn.n_name
      GROUP BY 1, 2, 3
    """,
    "market_share": """
      WITH cr AS (SELECT c_custkey FROM customer
                  JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
                  WHERE r_name = 'ASIA'),
      j AS (SELECT year(o_orderdate) AS o_year,
                   CAST(l_extendedprice AS DECIMAL(12,2))
                     * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))) AS rev,
                   n_name AS supp_nation
            FROM lineitem
            JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN cr ON o_custkey = c_custkey)
      SELECT CAST(o_year AS BIGINT) AS o_year,
             CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_1'
                           THEN CAST(rev AS DECIMAL(16,6))
                           ELSE CAST(0 AS DECIMAL(16,6)) END) AS VARCHAR) AS DOUBLE)
               AS nation_revenue,
             CAST(CAST(sum(rev) AS VARCHAR) AS DOUBLE) AS total_revenue,
             round(CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_1'
                           THEN CAST(rev AS DECIMAL(16,6))
                           ELSE CAST(0 AS DECIMAL(16,6)) END) AS VARCHAR) AS DOUBLE)
                   / CAST(CAST(sum(rev) AS VARCHAR) AS DOUBLE), 6) AS mkt_share
      FROM j GROUP BY 1
    """,
    "revenue_by_nation": """
      SELECT n_name,
        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
        count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name
    """,
    "top_customers": """
      SELECT c_custkey AS custkey, c_name AS name, revenue, n_orders FROM (
        SELECT o_custkey,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue,
               count(*) AS n_orders
        FROM orders GROUP BY o_custkey)
      JOIN customer ON o_custkey = c_custkey
      ORDER BY revenue DESC, custkey ASC LIMIT 10
    """,
    "customer_order_ranks": """
      SELECT custkey, orderkey, totalprice, rn FROM (
        SELECT o_custkey AS custkey, o_orderkey AS orderkey, o_totalprice AS totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
        FROM orders)
      WHERE rn <= 3
    """,
    "user_retention": """
      WITH f AS (SELECT user_id, CAST(min(ts) AS DATE) AS cohort FROM events GROUP BY 1),
      a AS (SELECT DISTINCT e.user_id, f.cohort, CAST(e.ts AS DATE) AS act_day
            FROM events e JOIN f USING (user_id))
      SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
             CAST(act_day - cohort AS BIGINT) AS day_offset,
             count(*) AS n_users
      FROM a GROUP BY 1, 2
    """,
    "cheapest_supplier": """
      WITH offers AS (
        SELECT l_partkey, l_suppkey, min(l_extendedprice) AS offer
        FROM lineitem GROUP BY 1, 2),
      r AS (
        SELECT l_partkey, offer, l_suppkey,
               row_number() OVER (PARTITION BY l_partkey
                 ORDER BY offer ASC, l_suppkey ASC) AS rn
        FROM offers)
      SELECT r.l_partkey AS p_partkey, r.offer AS best_price,
             r.l_suppkey AS s_suppkey, s.s_name, n.n_name
      FROM r JOIN supplier s ON r.l_suppkey = s.s_suppkey
             JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE rn = 1
    """,
    "nation_market_share": """
      WITH j AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))) AS dp,
               sn.n_name AS supp_nation
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'ASIA'),
      a AS (
        SELECT o_year, sum(dp) AS total_dec,
               sum(CASE WHEN supp_nation = 'NATION_2' THEN dp
                        ELSE CAST(0 AS DECIMAL(21,6)) END) AS nation_dec
        FROM j GROUP BY 1)
      SELECT o_year,
             CAST(CAST(total_dec AS VARCHAR) AS DOUBLE) AS total_revenue,
             CAST(CAST(nation_dec AS VARCHAR) AS DOUBLE) AS nation_revenue,
             round(CAST(CAST(nation_dec AS VARCHAR) AS DOUBLE)
                   / CAST(CAST(total_dec AS VARCHAR) AS DOUBLE), 6) AS mkt_share
      FROM a
    """,
    "events_last_per_user": """
      WITH r AS (
        SELECT user_id, ts, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_events
        FROM events)
      SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
             event_id, event_type, value, CAST(n_events AS BIGINT) AS n_events
      FROM r WHERE rn = 1
    """,
    "segment_event_stats": """
      SELECT c_mktsegment, count(*) AS n_events,
             count(DISTINCT user_id) AS n_users,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
      FROM events JOIN customer ON user_id = c_custkey
      GROUP BY 1
    """,
    "events_hourly": """
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
             event_type, count(*) AS n_events,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2
    """,
    "purchase_attribution": """
      WITH s AS (
        SELECT event_id, user_id, ts, event_type, value,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR CAST(floor(epoch(ts)) AS BIGINT)
                         - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                    THEN 1 ELSE 0 END AS st
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      s2 AS (SELECT *, sum(st) OVER (PARTITION BY user_id
                 ORDER BY ts ASC, event_id ASC ROWS UNBOUNDED PRECEDING)
                 AS session_id FROM s),
      s3 AS (SELECT *, first_value(event_type) OVER w2 AS first_touch,
                    first_value(ts) OVER w2 AS first_ts
             FROM s2
             WINDOW w2 AS (PARTITION BY user_id, session_id
                           ORDER BY ts ASC, event_id ASC))
      SELECT event_id AS purchase_id, user_id,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_s, value,
             first_touch,
             strftime(first_ts, '%Y-%m-%d %H:%M:%S') AS session_start_s
      FROM s3 WHERE event_type = 'purchase'
    """,
    "attribution_summary": f"""
      WITH att AS ({{ATTRIBUTION}})
      SELECT first_touch, count(*) AS n_purchases,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
               AS total_revenue
      FROM att GROUP BY first_touch
      ORDER BY n_purchases DESC, first_touch
    """,
    "customer_rfm": """
      WITH ref AS (SELECT max(o_orderdate) AS ref_date FROM orders),
      per AS (SELECT o_custkey AS custkey,
                CAST(min(date_diff('day', CAST(o_orderdate AS DATE),
                                   CAST(ref_date AS DATE))) AS BIGINT) AS recency_days,
                count(*) AS frequency,
                CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
                     AS DOUBLE) AS monetary
              FROM orders CROSS JOIN ref GROUP BY 1),
      sc AS (SELECT *,
              CAST(6 - ntile(5) OVER (ORDER BY recency_days ASC, custkey ASC) AS BIGINT) AS r_score,
              CAST(6 - ntile(5) OVER (ORDER BY frequency DESC, custkey ASC) AS BIGINT) AS f_score,
              CAST(6 - ntile(5) OVER (ORDER BY monetary DESC, custkey ASC) AS BIGINT) AS m_score
             FROM per)
      SELECT custkey, recency_days, frequency, round(monetary, 2) AS monetary,
             r_score, f_score, m_score,
             concat(r_score, f_score, m_score) AS rfm_cell,
             CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
                  WHEN r_score >= 4 AND f_score >= 3 THEN 'loyal'
                  WHEN r_score <= 2 AND f_score <= 2 THEN 'at_risk'
                  ELSE 'regular' END AS segment
      FROM sc
    """,
    "events_cusum": """
      WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
                            count(*) AS cnt
                     FROM events GROUP BY 1, 2),
      st AS (SELECT event_type, count(*) AS n,
                    sum(cnt) AS s1, sum(cnt * cnt) AS s2
             FROM daily GROUP BY 1),
      j AS (SELECT d.event_type, d.day, d.cnt,
                   CAST(round((CAST(cnt AS DOUBLE)
                          - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                         / sqrt((CAST(s2 AS DOUBLE)
                                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                                   / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)), 9)
                        AS DECIMAL(20,9))
                   - CAST('0.5' AS DECIMAL(20,9)) AS y
            FROM daily d JOIN st USING (event_type)),
      pw AS (SELECT event_type, day, cnt,
                    sum(y) OVER (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
             FROM j),
      mw AS (SELECT event_type, day, cnt, p,
                    -- CASE, not least(): DuckDB's least() promotes
                    -- DECIMAL args to DOUBLE and reintroduces dust
                    CASE WHEN mp < CAST('0' AS DECIMAL(38,9)) THEN mp
                         ELSE CAST('0' AS DECIMAL(38,9)) END AS m
             FROM (SELECT *, min(p) OVER (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mp
                   FROM pw))
      SELECT event_type, strftime(day, '%Y-%m-%d') AS day_s, cnt,
             CAST(CAST(p - m AS VARCHAR) AS DOUBLE) AS cusum,
             (p - m) > CAST('4.0' AS DECIMAL(20,9)) AS alert
      FROM mw
    """,
    "user_value_twap": """
      WITH d AS (
        SELECT user_id, value,
               lead(epoch_us(ts)) OVER (PARTITION BY user_id
                    ORDER BY ts ASC, event_id ASC) - epoch_us(ts) AS dur
        FROM events)
      SELECT user_id,
             CAST(sum(dur) AS BIGINT) AS active_us,
             round(CAST(CAST(sum(CAST(value AS DECIMAL(10,2))
                                 * CAST(dur AS DECIMAL(16,0))) AS VARCHAR) AS DOUBLE)
                   / CAST(sum(dur) AS DOUBLE), 6) AS twap
      FROM d WHERE dur IS NOT NULL GROUP BY user_id
    """,
    "session_concurrency": """
      WITH g AS (
        SELECT user_id, ts, event_id,
               CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                    - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id
                          ORDER BY ts ASC, event_id ASC))) AS BIGINT)
                    IS DISTINCT FROM NULL
                AND CAST(floor(epoch(ts)) AS BIGINT)
                    - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id
                          ORDER BY ts ASC, event_id ASC))) AS BIGINT) <= 1800
               THEN 0 ELSE 1 END AS chg
        FROM events),
      i AS (SELECT user_id, ts, sum(chg) OVER (PARTITION BY user_id
              ORDER BY ts ASC, event_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
            FROM g),
      sess AS (SELECT user_id, island, min(ts) AS s, max(ts) AS e
               FROM i GROUP BY 1, 2),
      seg AS (SELECT unnest(generate_series(date_trunc('day', s),
                       date_trunc('day', e), INTERVAL 1 DAY)) AS day, s, e
              FROM sess),
      clip AS (SELECT day, greatest(s, day) AS a,
                      least(e, day + INTERVAL 1 DAY - INTERVAL 1 MICROSECOND) AS b
               FROM seg),
      pts AS (SELECT day, ts, sum(cs) AS cs, sum(ce) AS ce FROM (
                SELECT day, a AS ts, 1 AS cs, 0 AS ce FROM clip
                UNION ALL
                SELECT day, b, 0, 1 FROM clip)
              GROUP BY 1, 2),
      pk AS (SELECT day, cs,
               coalesce(sum(cs - ce) OVER (PARTITION BY day ORDER BY ts ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cs AS peak
             FROM pts)
      SELECT strftime(day, '%Y-%m-%d') AS day_s,
             CAST(sum(cs) AS BIGINT) AS n_sessions,
             CAST(max(peak) AS BIGINT) AS max_concurrent
      FROM pk GROUP BY day
    """,
    "events_sessionize": """
      WITH g AS (
        SELECT user_id,
               CAST(floor(epoch(ts)) AS BIGINT)
               - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id
                     ORDER BY ts ASC, event_id ASC))) AS BIGINT) AS gap
        FROM events)
      SELECT user_id,
             CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
             count(*) AS n_events
      FROM g GROUP BY user_id
    """,
    # gaps-and-islands rewrite of the native session_window operator:
    # new session when the per-user gap is >= 30 min (session_window's
    # half-open [start, last+gap) boundary); end = last event + gap
    "events_session_window": """
      WITH g AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      i AS (
        SELECT user_id, ts, event_type,
               sum(s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                            ROWS UNBOUNDED PRECEDING) AS island
        FROM g)
      SELECT user_id,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             strftime(max(ts) + INTERVAL 30 MINUTE,
                      '%Y-%m-%d %H:%M:%S') AS session_end,
             count(*) AS n_events,
             CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
      FROM i GROUP BY user_id, island
    """,
    # grouped-map least-squares slope == closed-form regr_slope over
    # the same (hour-rank, count) points; verified bit-stable at 6dp
    "events_type_trend": """
      WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
                 FROM events GROUP BY 1, 2),
      x AS (SELECT event_type, CAST(n AS DOUBLE) AS y,
                   CAST(row_number() OVER (PARTITION BY event_type
                        ORDER BY hour) - 1 AS DOUBLE) AS x
            FROM h)
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
             round(regr_slope(y, x), 6) AS slope_per_hour
      FROM x GROUP BY event_type
    """,
    "events_json_stats": """
      SELECT event_type, count(*) AS n_events,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
             max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      FROM events GROUP BY event_type
    """,
    "order_priority_backlog": """
      SELECT o_orderpriority AS priority, count(*) AS n_backlogged
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey
                      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY 1
    """,
    "returned_items": """
      WITH pc AS (
        SELECT o_custkey,
               sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS rev_dec
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
        GROUP BY 1
      )
      SELECT c_custkey AS custkey, c_name AS name, n_name AS nation,
             CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS returned_revenue
      FROM pc
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      ORDER BY returned_revenue DESC, custkey ASC
      LIMIT 20
    """,
    "important_parts": """
      WITH pv AS (
        SELECT l_partkey,
               sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS val_dec
        FROM lineitem GROUP BY 1
      ),
      w AS (SELECT l_partkey, val_dec, sum(val_dec) OVER () AS tot_dec,
                   count(*) OVER () AS n_parts FROM pv)
      SELECT l_partkey AS partkey,
             CAST(CAST(val_dec AS VARCHAR) AS DOUBLE) AS part_value,
             round(CAST(CAST(val_dec AS VARCHAR) AS DOUBLE)
                   / CAST(CAST(tot_dec AS VARCHAR) AS DOUBLE), 9) AS value_share
      FROM w
      WHERE CAST(CAST(val_dec AS VARCHAR) AS DOUBLE)
            > 1.5 * CAST(CAST(tot_dec AS VARCHAR) AS DOUBLE) / n_parts
    """,
    "promo_revenue": """
      SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
             CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
                    THEN CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                         * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
                         AS DECIMAL(16,6))
                    ELSE CAST(0 AS DECIMAL(16,6)) END) AS VARCHAR) AS DOUBLE) AS promo_revenue,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS VARCHAR) AS DOUBLE) AS total_revenue,
             round(CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
                    THEN CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                         * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
                         AS DECIMAL(16,6))
                    ELSE CAST(0 AS DECIMAL(16,6)) END) AS VARCHAR) AS DOUBLE)
                   / CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS VARCHAR) AS DOUBLE), 6) AS promo_share
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1
    """,
    "sales_opportunity": """
      WITH a AS (
        SELECT CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
               / count(*) AS avg_bal
        FROM customer WHERE c_acctbal > 0
      )
      SELECT c_mktsegment AS segment, count(*) AS n_customers,
             CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_balance
      FROM customer, a
      WHERE CAST(c_acctbal AS DOUBLE) > avg_bal
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderdate >= DATE '1998-06-01')
      GROUP BY 1
    """,
}


# the SQL-front-end twin shares the DataFrame variant's oracle
ORACLES["pricing_summary_sql"] = ORACLES["pricing_summary"]

# composed data-selection pipeline: dedup keep-set, DSIR over the
# deduped corpus, threshold, temperature membership over the selected
# pool -- each stage re-using the standalone oracles' SQL generators
ORACLES["select_pretraining_corpus"] = (
    """WITH dedup_keep AS (
         SELECT min(doc_id) AS doc_id
         FROM (SELECT doc_id,
                      md5(trim(lower(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))) AS fp
               FROM documents)
         GROUP BY fp),
       d1 AS (SELECT d.* FROM documents d JOIN dedup_keep USING (doc_id)),
       dsirw AS ("""
    + _dsir_sql("d1")
    + """),
       sel AS (SELECT doc_id, dsir_logw FROM dsirw WHERE dsir_logw >= 0.0),
       d2 AS (SELECT d1.* FROM d1 JOIN sel USING (doc_id)),
       kept AS ("""
    + _temperature_sql("d2")
    + """)
       SELECT k.doc_id, k.lang, k.source, sel.dsir_logw
       FROM kept k JOIN sel USING (doc_id)"""
)

ORACLES["attribution_summary"] = ORACLES["attribution_summary"].replace(
    "{ATTRIBUTION}", ORACLES["purchase_attribution"]
)

ORACLES["hybrid_rrf_topk"] = f"""
  WITH lexb AS (SELECT * FROM ({ORACLES["bm25_topk"]})),
  lex AS (SELECT doc_id,
                 row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS r_lex
          FROM lexb),
  q0 AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings
         WHERE vec_id = 0),
  sden AS (SELECT e.vec_id AS doc_id,
                  round(list_cosine_similarity(q0.qvec,
                        CAST(e.embedding AS DOUBLE[])), 6) AS cosine
           FROM q0, embeddings e WHERE e.vec_id <> 0),
  denr AS (SELECT doc_id,
                  row_number() OVER (ORDER BY cosine DESC, doc_id ASC) AS r_den
           FROM sden),
  den AS (SELECT doc_id, r_den FROM denr WHERE r_den <= 50)
  SELECT doc_id,
         round(coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(r_lex AS DOUBLE)), CAST(0 AS DOUBLE))
               + coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(r_den AS DOUBLE)), CAST(0 AS DOUBLE)), 6)
           AS rrf
  FROM lex FULL OUTER JOIN den USING (doc_id)
  ORDER BY rrf DESC, doc_id ASC LIMIT 20
"""

ORACLES["prf_rerank"] = f"""
  WITH bm AS (SELECT * FROM ({ORACLES["bm25_topk"]})),
  fb AS (SELECT doc_id FROM bm ORDER BY bm25 DESC, doc_id ASC LIMIT 10),
  fv AS (SELECT CAST(e.embedding AS DOUBLE[]) AS dvec
         FROM embeddings e JOIN fb ON e.vec_id = fb.doc_id),
  i AS (SELECT dvec, unnest(range(1, len(dvec) + 1)) AS idx FROM fv),
  f AS (SELECT idx, dvec[idx] AS v FROM i),
  c AS (SELECT idx,
               round(CAST(CAST(sum(CAST(v AS DECIMAL(27,12))) AS VARCHAR) AS DOUBLE)
                     / count(*), 6) AS c
        FROM f GROUP BY idx),
  cv AS (SELECT list(c ORDER BY idx) AS cvec FROM c),
  s AS (SELECT bm.doc_id, bm.bm25,
               round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), cv.cvec), 6)
                 AS cosine
        FROM bm JOIN embeddings e ON e.vec_id = bm.doc_id CROSS JOIN cv),
  r AS (SELECT *, row_number() OVER (ORDER BY cosine DESC, doc_id ASC) AS rn FROM s)
  SELECT doc_id, bm25, cosine, CAST(rn AS BIGINT) AS "rank" FROM r WHERE rn <= 20
"""

ORACLES["bm25_snippets"] = f"""
  WITH top AS (SELECT * FROM ({ORACLES["bm25_topk"]})
               ORDER BY bm25 DESC, doc_id ASC LIMIT 20),
  j AS (SELECT top.doc_id, top.bm25, d.text,
               least(CASE WHEN instr(text, 'spark') > 0 THEN instr(text, 'spark') ELSE 1000000000 END, CASE WHEN instr(text, 'join') > 0 THEN instr(text, 'join') ELSE 1000000000 END, CASE WHEN instr(text, 'fast') > 0 THEN instr(text, 'fast') ELSE 1000000000 END) AS first_pos
        FROM top JOIN documents d ON top.doc_id = d.doc_id)
  SELECT doc_id, bm25,
         CASE WHEN first_pos < 1000000000
              THEN substr(text, CAST(greatest(first_pos - 30, 1) AS BIGINT), 80)
              ELSE substr(text, 1, 80) END AS snippet
  FROM j ORDER BY bm25 DESC, doc_id ASC
"""

# composed evaluation: both sides reuse the existing deterministic oracles
def _recall_block(ivf_sql: str) -> str:
    return (
        "WITH exact AS (" + ORACLES["knn_cosine"] + "),\n"
        "ann AS (" + ivf_sql + "),\n"
        """h AS (SELECT e.query_id, count(*) AS n_hits
             FROM exact e JOIN ann a ON a.query_id = e.query_id
              AND a.neighbor_id = e.neighbor_id GROUP BY 1),
      b AS (SELECT query_id, count(*) AS n_exact FROM exact GROUP BY 1)
      SELECT b.query_id, coalesce(h.n_hits, 0) AS n_hits,
             round(coalesce(h.n_hits, 0) / CAST(b.n_exact AS DOUBLE), 6) AS recall
      FROM b LEFT JOIN h USING (query_id)"""
    )


ORACLES["ann_recall"] = _recall_block(ORACLES["ann_ivf"])
ORACLES["mmr_rerank"] = _mmr_ctes()

# the probe-count sweep re-parameterizes the IVF block's `pr <= N`
# routing predicate; everything else is byte-identical
ORACLES["ann_recall_sweep"] = "\nUNION ALL\n".join(
    f"SELECT CAST({np} AS BIGINT) AS n_probe, r.* FROM ("
    + _recall_block(ORACLES["ann_ivf"].replace("pr <= 2", f"pr <= {np}"))
    + ") r"
    for np in (1, 2, 4)
)


# graded ranking quality: same two deterministic rankings, so nDCG's
# per-term round(ln,9)/decimal-sum recipe keeps the eval hash-exact
ORACLES["ann_rank_quality"] = (
    "WITH exact AS (" + ORACLES["knn_cosine"] + "),\n"
    "ann AS (" + ORACLES["ann_ivf"] + "),\n"
    """j AS (SELECT a.query_id, a.rank AS ann_rank, e.rank AS exact_rank
        FROM ann a LEFT JOIN exact e ON a.query_id = e.query_id
         AND a.neighbor_id = e.neighbor_id),
  terms AS (SELECT query_id, ann_rank,
        CASE WHEN exact_rank IS NOT NULL THEN 6 - exact_rank ELSE 0 END AS rel
      FROM j),
  pq AS (SELECT query_id,
        sum(CAST(round(CAST(rel AS DOUBLE)
              / (round(ln(CAST(ann_rank AS DOUBLE) + CAST(1.0 AS DOUBLE)), 9)
                 / round(ln(CAST(2.0 AS DOUBLE)), 9)), 9) AS DECIMAL(20,9))) AS dcg_d,
        min(CASE WHEN rel > 0 THEN ann_rank END) AS first_hit,
        sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS n_hits
      FROM terms GROUP BY 1),
  ideal AS (SELECT query_id,
        sum(CAST(round(CAST(6 - rank AS DOUBLE)
              / (round(ln(CAST(rank AS DOUBLE) + CAST(1.0 AS DOUBLE)), 9)
                 / round(ln(CAST(2.0 AS DOUBLE)), 9)), 9) AS DECIMAL(20,9))) AS idcg_d,
        count(*) AS n_exact
      FROM exact GROUP BY 1)
  SELECT i.query_id,
         CAST(coalesce(p.n_hits, 0) AS BIGINT) AS n_hits,
         round(coalesce(p.n_hits, 0) / CAST(i.n_exact AS DOUBLE), 6) AS recall,
         coalesce(round(CAST(1.0 AS DOUBLE) / p.first_hit, 6),
                  CAST(0.0 AS DOUBLE)) AS mrr,
         round(coalesce(CAST(CAST(p.dcg_d AS VARCHAR) AS DOUBLE), CAST(0.0 AS DOUBLE))
               / CAST(CAST(i.idcg_d AS VARCHAR) AS DOUBLE), 6) AS ndcg
  FROM ideal i LEFT JOIN pq p USING (query_id)
"""
)


def _pii_oracle_sql() -> str:
    """Generate the pii_redact oracle FROM PII_PATTERNS so the SQL
    can never drift from the Spark pipeline: same patterns, same
    order, counts taken on the progressively-redacted string."""
    ctes = ["s0 AS (SELECT doc_id, text AS t0 FROM documents)"]
    for i, (name, pat, repl) in enumerate(PII_PATTERNS, 1):
        p = pat.replace("'", "''")
        ctes.append(
            f"s{i} AS (SELECT * EXCLUDE (t{i - 1}),\n"
            f"  CAST(len(regexp_extract_all(t{i - 1}, '{p}')) AS BIGINT) AS n_{name},\n"
            f"  regexp_replace(t{i - 1}, '{p}', '{repl}', 'g') AS t{i} FROM s{i - 1})"
        )
    last = f"t{len(PII_PATTERNS)}"
    counts = ", ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT doc_id, {counts}, {last} AS redacted, "
        f"CAST(length({last}) AS BIGINT) AS redacted_len FROM s{len(PII_PATTERNS)}"
    )


ORACLES["pii_redact"] = _pii_oracle_sql()
ORACLES["nb_confusion"] = (
    "SELECT lang, pred_lang, count(*) AS n_docs FROM ("
    + ORACLES["nb_lang_scores"]
    + ") GROUP BY 1, 2"
)


# the *_scalable variants are plan-level rewrites (distributed exact
# ranking) of the same queries -- sharing the oracle is the point:
# the hash match proves the rewrite exact
ORACLES["vocab_ids_scalable"] = ORACLES["vocab_ids"]
ORACLES["customer_spend_percentiles_scalable"] = ORACLES["customer_spend_percentiles"]

def _hll_est_sql(regs_rel: str, key_sel: str, key_group: str, grain: str, gkey: str) -> str:
    """Estimate CTE chain over a register relation [*, reg, mj] --
    the same harmonic-sum/linear-counting formula as the Spark
    estimate_from_registers, emitted once per rollup grain."""
    group = f"GROUP BY {key_group}" if key_group else ""
    return f"""
      (SELECT '{grain}' AS grain, {gkey} AS gkey,
              round(CASE WHEN e_raw <= 640.0 AND n_filled < 256
                    THEN 256.0 * ln(256.0 / CAST(256 - n_filled AS DOUBLE))
                    ELSE e_raw END, 6) AS est_distinct
       FROM (SELECT {key_sel} n_filled,
                    4.2399330249068963e+20
                    / CAST(s_filled + (256 - n_filled) * (1::BIGINT << 53) AS DOUBLE) AS e_raw
             FROM (SELECT {key_sel} count(*) AS n_filled,
                          CAST(sum(1::BIGINT << CAST(53 - mj AS INTEGER)) AS BIGINT) AS s_filled
                   FROM {regs_rel} {group}) g) e)
    """


ORACLES["kmv_user_overlap"] = """
  WITH ap AS (SELECT DISTINCT CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
              FROM events WHERE event_type = 'purchase'),
  bs AS (SELECT DISTINCT CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
         FROM customer WHERE c_mktsegment = 'BUILDING'),
  ka AS (SELECT h FROM ap ORDER BY h LIMIT 256),
  kb AS (SELECT h FROM bs ORDER BY h LIMIT 256),
  ku AS (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)
         ORDER BY h LIMIT 256),
  st AS (SELECT max(h) AS hk, count(*) AS kct FROM ku),
  cm AS (SELECT count(*) AS cj FROM ku
         WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
  ex AS (SELECT count(*) AS exact_intersection FROM ap
         WHERE h IN (SELECT h FROM bs)),
  r AS (SELECT CASE WHEN kct < 256 THEN CAST(kct AS DOUBLE)
               ELSE round(255.0 * 1152921504606846976 / hk, 6) END AS est_union,
               kct, cj, exact_intersection
        FROM st, cm, ex),
  sel AS (SELECT est_union,
                 round(cj / CAST(kct AS DOUBLE), 6) AS est_jaccard,
                 round(cj * est_union / kct, 6) AS est_intersection,
                 exact_intersection
          FROM r)
  SELECT est_union, est_jaccard, est_intersection, exact_intersection,
         round((est_intersection - exact_intersection)
               / nullif(CAST(exact_intersection AS DOUBLE), 0), 6) AS rel_err
  FROM sel
"""

ORACLES["bloom_pruned_revenue"] = """
  SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
              * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
         count(*) AS n_items
  FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                       WHERE o_orderpriority = '1-URGENT'
                         AND o_custkey IN (SELECT c_custkey FROM customer
                                           WHERE c_mktsegment = 'BUILDING'))
"""

ORACLES["user_state_intervals"] = """
  WITH o AS (SELECT user_id, ts, event_id, event_type,
                    lag(event_type) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS prev
             FROM events),
  m AS (SELECT *, CASE WHEN prev IS NULL OR prev <> event_type
                       THEN 1 ELSE 0 END AS chg FROM o),
  g AS (SELECT *, sum(chg) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS island
        FROM m),
  iv AS (SELECT user_id, island, event_type AS state,
                min(ts) AS vf, count(*) AS n_events
         FROM g GROUP BY 1, 2, 3),
  fin AS (SELECT user_id, state, vf, n_events,
                 lead(vf) OVER (PARTITION BY user_id ORDER BY island) AS vt
          FROM iv)
  SELECT user_id, state,
         strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
         strftime(vt, '%Y-%m-%d %H:%M:%S') AS valid_to,
         CAST(n_events AS BIGINT) AS n_events,
         vt IS NULL AS is_current
  FROM fin
"""

# Time travel over the SCD2 table: half-open intervals filtered at
# the snapshot instant (string compare on the second-grain format).
ORACLES["user_state_asof"] = f"""
  SELECT user_id, state, valid_from AS since_s, n_events, is_current
  FROM ({ORACLES["user_state_intervals"]})
  WHERE valid_from <= '2024-01-15 00:00:00'
    AND (valid_to IS NULL OR valid_to > '2024-01-15 00:00:00')
  ORDER BY user_id
"""

ORACLES["cms_screened_wordcount"] = f"""
  WITH wc AS ({_SQL_WORDCOUNT}),
  h AS (SELECT word, cnt,
               CAST(concat('0x', substr(md5(word), 1, 15)) AS BIGINT) AS hv
        FROM wc),
  {", ".join(
    f"s{j} AS (SELECT (hv >> {10 * j}) % 1024 AS b{j}, "
    f"CAST(sum(cnt) AS BIGINT) AS c{j} FROM h GROUP BY 1)"
    for j in range(4))},
  n AS (SELECT CAST(sum(c0) AS BIGINT) // 500 AS thr FROM s0),
  p AS (SELECT word, cnt, least(s0.c0, s1.c1, s2.c2, s3.c3) AS est_cnt
        FROM h
        JOIN s0 ON s0.b0 = (h.hv >> 0) % 1024
        JOIN s1 ON s1.b1 = (h.hv >> 10) % 1024
        JOIN s2 ON s2.b2 = (h.hv >> 20) % 1024
        JOIN s3 ON s3.b3 = (h.hv >> 30) % 1024)
  SELECT word, cnt AS true_cnt, est_cnt, cnt >= n.thr AS confirmed
  FROM p, n WHERE est_cnt >= n.thr
  ORDER BY true_cnt DESC, word ASC
"""

ORACLES["hll_user_rollup"] = f"""
  WITH h AS (
    SELECT event_type, CAST(ts AS DATE) AS d, user_id,
           CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
    FROM events),
  r AS (SELECT event_type, d, hv % 256 AS reg,
               CASE WHEN (hv >> 8) = 0 THEN 53
                    ELSE 53 - length(bin(hv >> 8)) END AS rho
        FROM h),
  dm AS (SELECT event_type, d, reg, max(rho) AS mj FROM r GROUP BY 1, 2, 3),
  tm AS (SELECT event_type, reg, max(mj) AS mj FROM dm GROUP BY 1, 2),
  am AS (SELECT reg, max(mj) AS mj FROM dm GROUP BY 1),
  ests AS (
    SELECT * FROM {_hll_est_sql("tm", "event_type,", "event_type", "event_type", "event_type")}
    UNION ALL
    SELECT * FROM {_hll_est_sql("am", "", "", "total", "'*'")}
  ),
  ex AS (SELECT event_type AS gkey, count(DISTINCT user_id) AS exact_distinct
         FROM events GROUP BY 1
         UNION ALL
         SELECT '*', count(DISTINCT user_id) FROM events)
  SELECT grain, gkey, est_distinct, exact_distinct,
         round((est_distinct - exact_distinct) / exact_distinct, 6) AS rel_err
  FROM ests JOIN ex USING (gkey)
  ORDER BY grain, gkey
"""

ORACLES["copurchase_butterflies"] = f"""
  WITH e AS (SELECT DISTINCT o_custkey AS custkey, l_suppkey AS suppkey
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             WHERE o_custkey IN (SELECT c_custkey FROM customer
                                 WHERE c_mktsegment = '{PPR_SEGMENT}')),
  w AS (SELECT a.custkey AS c1, b.custkey AS c2
        FROM e a JOIN e b ON a.suppkey = b.suppkey AND a.custkey < b.custkey),
  s AS (SELECT c1, c2, count(*) AS shared_suppliers
        FROM w GROUP BY 1, 2 HAVING count(*) >= 2)
  SELECT c1 AS custkey_1, c2 AS custkey_2, shared_suppliers,
         CAST(shared_suppliers * (shared_suppliers - 1) / 2 AS BIGINT) AS butterflies
  FROM s
  ORDER BY shared_suppliers DESC, c1, c2
  LIMIT 50
"""

# Deliberately the NAIVE (unsalted) join: the hash match proves the
# salted rewrite changes partitioning only. idf terms are round-9dp
# decimals so the per-doc sum is associative (doc_perplexity recipe).
ORACLES["doc_idf_salted_join"] = f"""
  WITH t AS ({_SQL_TOKS}),
  tok AS (SELECT doc_id, unnest(toks) AS word FROM t),
  tk AS (SELECT doc_id, word FROM tok WHERE word <> ''),
  v AS (SELECT word, count(DISTINCT doc_id) AS df FROM tk GROUP BY 1),
  n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
  idf AS (SELECT word, CAST(round(ln(n_docs / df), 9) AS DECIMAL(12,9)) AS idf
          FROM v, n)
  SELECT tk.doc_id, count(*) AS n_tokens,
         CAST(CAST(sum(idf.idf) AS VARCHAR) AS DOUBLE) AS idf_sum
  FROM tk JOIN idf USING (word)
  GROUP BY 1
"""

ORACLES["zorder_cells"] = f"""
  {_zorder_binned_sql()}
  SELECT z >> 6 AS cell, count(*) AS cnt,
         max(user_id) - min(user_id) AS u_span,
         max(tus) - min(tus) AS t_span_us
  FROM zz GROUP BY cell ORDER BY cell
"""
def _hilbert_base_sql() -> str:
    """Shared oracle CTE chain: zorder bins -> hx0/hy0/hd0 seed ->
    the per-level Hilbert recurrence, generated from the same
    _hilbert_level_sql loop as the Spark column chain."""
    from .operators.zorder import hilbert_ctes_sql, morton_sql

    return f"""
      {_zorder_binned_sql()},
      hb0 AS (SELECT user_id, tus, bx AS hx0, bt AS hy0,
                     CAST(0 AS BIGINT) AS hd0,
                     {morton_sql("bx", "bt")} AS z
              FROM b),
      {hilbert_ctes_sql("hb0")}
    """


ORACLES["hilbert_cells"] = f"""
  {_hilbert_base_sql()}
  SELECT hd8 >> 6 AS cell, count(*) AS cnt,
         max(user_id) - min(user_id) AS u_span,
         max(tus) - min(tus) AS t_span_us
  FROM hb GROUP BY cell ORDER BY cell
"""

ORACLES["hilbert_skipping_summary"] = f"""
  {_hilbert_base_sql()},
  hc AS (SELECT hd8 >> 8 AS chunk, count(*) AS cnt,
                max(user_id) - min(user_id) AS u_span,
                max(tus) - min(tus) AS t_span_us
         FROM hb GROUP BY chunk),
  zc AS (SELECT z >> 8 AS chunk, count(*) AS cnt,
                max(user_id) - min(user_id) AS u_span,
                max(tus) - min(tus) AS t_span_us
         FROM hb GROUP BY chunk)
  SELECT 'hilbert' AS layout, count(*) AS n_chunks,
         CAST(sum(cnt) AS BIGINT) AS rows_total,
         CAST(sum(u_span) AS BIGINT) AS sum_u_span,
         CAST(sum(t_span_us) AS BIGINT) AS sum_t_span_us
  FROM hc
  UNION ALL
  SELECT 'zorder', count(*),
         CAST(sum(cnt) AS BIGINT), CAST(sum(u_span) AS BIGINT),
         CAST(sum(t_span_us) AS BIGINT)
  FROM zc
"""

ORACLES["training_shuffle_order"] = """
  WITH h AS (
    SELECT doc_id,
           CAST(concat('0x', substr(md5(concat('shuf1:',
                CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) AS hk
    FROM documents)
  SELECT doc_id, hk,
         row_number() OVER (ORDER BY hk ASC, doc_id ASC) AS position
  FROM h
"""

ORACLES["curve_locality_stats"] = f"""
  {_hilbert_base_sql()},
  occ AS (SELECT DISTINCT hx0 AS bx, hy0 AS bt, z, hd8 AS h FROM hb),
  hs AS (SELECT abs(bx - lag(bx) OVER (ORDER BY h))
              + abs(bt - lag(bt) OVER (ORDER BY h)) AS step FROM occ),
  zs AS (SELECT abs(bx - lag(bx) OVER (ORDER BY z))
              + abs(bt - lag(bt) OVER (ORDER BY z)) AS step FROM occ)
  SELECT 'hilbert' AS layout, count(*) AS n_steps,
         CAST(sum(step) AS BIGINT) AS total_dist,
         max(step) AS max_step,
         CAST(sum(CASE WHEN step = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS adjacent_steps
  FROM hs WHERE step IS NOT NULL
  UNION ALL
  SELECT 'zorder', count(*), CAST(sum(step) AS BIGINT), max(step),
         CAST(sum(CASE WHEN step = 1 THEN 1 ELSE 0 END) AS BIGINT)
  FROM zs WHERE step IS NOT NULL
"""

ORACLES["zorder_skipping_summary"] = f"""
  {_zorder_binned_sql()},
  zc AS (SELECT z >> 8 AS chunk, count(*) AS cnt,
                max(user_id) - min(user_id) AS u_span,
                max(tus) - min(tus) AS t_span_us
         FROM zz GROUP BY chunk),
  lc AS (SELECT bt AS chunk, count(*) AS cnt,
                max(user_id) - min(user_id) AS u_span,
                max(tus) - min(tus) AS t_span_us
         FROM zz GROUP BY chunk)
  SELECT 'zorder' AS layout, count(*) AS n_chunks,
         CAST(sum(cnt) AS BIGINT) AS rows_total,
         CAST(sum(u_span) AS BIGINT) AS sum_u_span,
         CAST(sum(t_span_us) AS BIGINT) AS sum_t_span_us
  FROM zc
  UNION ALL
  SELECT 'linear_ts', count(*),
         CAST(sum(cnt) AS BIGINT), CAST(sum(u_span) AS BIGINT),
         CAST(sum(t_span_us) AS BIGINT)
  FROM lc
"""


ORACLES["events_gap_fill"] = """
  WITH r AS (
    SELECT user_id, date_trunc('hour', ts) AS bucket, value,
           row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE event_type = 'purchase'),
  obs AS (SELECT user_id, bucket, value FROM r WHERE rn = 1),
  span AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
           FROM obs GROUP BY 1),
  grid AS (SELECT user_id,
                  unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
           FROM span),
  j AS (SELECT g.user_id, g.bucket, o.value
        FROM grid g LEFT JOIN obs o USING (user_id, bucket))
  SELECT user_id,
         strftime(bucket, '%Y-%m-%d %H:%M:%S') AS hour_s,
         last_value(value IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
         value IS NULL AS is_gap
  FROM j
"""

# NAIVE triple-join enumeration (a<b<c): the hash match proves the
# degree-oriented wedge form exact.
ORACLES["cosupply_triangles"] = """
  WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
  w AS (SELECT a.s AS s1, b.s AS s2, count(*) AS c
        FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s GROUP BY 1, 2),
  t AS (SELECT CAST(sum(c) AS DOUBLE) / count(*) * 1.1 AS thr FROM w),
  e AS (SELECT s1, s2 FROM w, t WHERE c >= thr),
  tri AS (SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
          FROM e e1 JOIN e e2 ON e1.s2 = e2.s1
                    JOIN e e3 ON e1.s1 = e3.s1 AND e2.s2 = e3.s2),
  corners AS (SELECT a AS suppkey FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri)
  SELECT suppkey, count(*) AS n_triangles FROM corners GROUP BY 1
"""

# Naive 3-way-join triangles + degree table; the coefficient is one
# int/int division both engines compute on identical integers.
ORACLES["cosupply_clustering"] = """
  WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
  w AS (SELECT a.s AS s1, b.s AS s2, count(*) AS c
        FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s GROUP BY 1, 2),
  t AS (SELECT CAST(sum(c) AS DOUBLE) / count(*) * 1.1 AS thr FROM w),
  e AS MATERIALIZED (SELECT s1, s2 FROM w, t WHERE c >= thr),
  und AS (SELECT s1 AS suppkey FROM e UNION ALL SELECT s2 FROM e),
  deg AS (SELECT suppkey, count(*) AS degree FROM und GROUP BY 1),
  tri AS (SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
          FROM e e1 JOIN e e2 ON e1.s2 = e2.s1
                    JOIN e e3 ON e1.s1 = e3.s1 AND e2.s2 = e3.s2),
  corners AS (SELECT a AS suppkey FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri),
  tc AS (SELECT suppkey, count(*) AS n_triangles FROM corners GROUP BY 1)
  SELECT deg.suppkey, deg.degree,
         CAST(coalesce(tc.n_triangles, 0) AS BIGINT) AS n_triangles,
         CAST(2 * coalesce(tc.n_triangles, 0) AS DOUBLE)
           / CAST(deg.degree * (deg.degree - 1) AS DOUBLE) AS clustering_coeff
  FROM deg LEFT JOIN tc USING (suppkey)
  WHERE deg.degree >= 2
  ORDER BY clustering_coeff DESC, suppkey
"""

ORACLES["cosupply_kcore"] = _kcore_ctes(k=8, rounds=8)
ORACLES["supplier_reach"] = _bfs_ctes()
ORACLES["supplier_cheapest_reach"] = _sssp_ctes()

# Per-distinct-score aggregate Mann-Whitney with tie credit: the
# native window's "negatives strictly below" vs the Spark side's
# two-level bucketed cumulative sum; u2 integer arithmetic identical.
ORACLES["score_auc"] = """
  WITH per AS (
    SELECT n_chars AS s,
           sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos,
           sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS neg
    FROM documents GROUP BY 1),
  cum AS (
    SELECT s, pos, neg,
           coalesce(sum(neg) OVER (ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS neg_below
    FROM per),
  agg AS (
    SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(neg) AS BIGINT) AS n_neg,
           CAST(sum(CAST(pos AS DECIMAL(18,0))
                    * CAST(2 * neg_below + neg AS DECIMAL(19,0)))
                AS DECIMAL(38,0)) AS u2
    FROM cum)
  SELECT n_pos, n_neg,
         CAST(CAST(u2 AS VARCHAR) AS DOUBLE) AS u2,
         CAST(CAST(u2 AS VARCHAR) AS DOUBLE)
           / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS auc
  FROM agg
"""

ORACLES["calibration_bins"] = """
  WITH p AS (
    SELECT CAST(n_chars AS DOUBLE) / CAST(n_chars + 300 AS DOUBLE) AS p,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
    FROM documents),
  b AS (
    SELECT CAST(least(9, floor(p * 10)) AS BIGINT) AS bin, p, label FROM p)
  SELECT bin, count(*) AS n,
         CAST(sum(label) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS frac_pos,
         CAST(CAST(sum(CAST(round(p, 9) AS DECIMAL(12,9))) AS VARCHAR)
              AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_p,
         abs(CAST(CAST(sum(CAST(round(p, 9) AS DECIMAL(12,9))) AS VARCHAR)
                  AS DOUBLE) / CAST(count(*) AS DOUBLE)
             - CAST(sum(label) AS DOUBLE) / CAST(count(*) AS DOUBLE))
           AS abs_gap
  FROM b GROUP BY 1 ORDER BY 1
"""

# Lower medians by integer-rank selection: cm >= (n+1) div 2 picks
# the smallest value reaching the ceil(n/2) position -- no midpoint
# interpolation, so there is no float association to diverge.
ORACLES["events_anomaly_mad"] = """
  WITH c AS (SELECT event_type AS g, value AS v, count(*) AS cnt
             FROM events GROUP BY 1, 2),
  tot AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n FROM c GROUP BY 1),
  cum AS (SELECT g, v, cnt,
                 sum(cnt) OVER (PARTITION BY g ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
          FROM c),
  med AS (SELECT cum.g, min(v) AS med
          FROM cum JOIN tot USING (g)
          WHERE cm >= CAST(floor((n + 1) / 2.0) AS BIGINT) GROUP BY 1),
  dv AS (SELECT c.g, med, abs(v - med) AS dev,
                CAST(sum(cnt) AS BIGINT) AS cnt
         FROM c JOIN med ON c.g = med.g GROUP BY 1, 2, 3),
  cum2 AS (SELECT g, dev, cnt,
                  sum(cnt) OVER (PARTITION BY g ORDER BY dev
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
           FROM dv),
  mad AS (SELECT cum2.g, min(dev) AS mad
          FROM cum2 JOIN tot USING (g)
          WHERE cm >= CAST(floor((n + 1) / 2.0) AS BIGINT) GROUP BY 1)
  SELECT dv.g AS event_type,
         CAST(sum(dv.cnt) AS BIGINT) AS n,
         dv.med AS med, mad.mad AS mad,
         mad.mad * 3.0 * 1.4826 AS hampel_cut,
         CAST(sum(CASE WHEN dev > mad.mad * 3.0 * 1.4826
                       THEN dv.cnt ELSE 0 END) AS BIGINT) AS n_outliers,
         max(dev) AS max_dev
  FROM dv JOIN mad ON dv.g = mad.g
  GROUP BY 1, 3, 4 ORDER BY 1
"""

ORACLES["events_dow_seasonality"] = """
  WITH per AS (
    SELECT event_type, CAST(date_part('dow', ts) AS INT) AS dow,
           count(*) AS n,
           CAST(CAST(sum(CAST(round(value, 9) AS DECIMAL(20,9)))
                     AS VARCHAR) AS DOUBLE) AS sv
    FROM events GROUP BY 1, 2),
  tot AS (
    SELECT event_type, count(*) AS nt,
           CAST(CAST(sum(CAST(round(value, 9) AS DECIMAL(20,9)))
                     AS VARCHAR) AS DOUBLE) AS st
    FROM events GROUP BY 1)
  SELECT per.event_type, dow, n,
         sv / CAST(n AS DOUBLE) AS mean_value,
         (sv / CAST(n AS DOUBLE)) / (st / CAST(nt AS DOUBLE))
           AS seasonal_index
  FROM per JOIN tot USING (event_type)
  ORDER BY 1, 2
"""

ORACLES["frequent_event_trigrams"] = """
  WITH g AS (
    SELECT user_id,
           event_type AS step_1,
           lead(event_type, 1) OVER w AS step_2,
           lead(event_type, 2) OVER w AS step_3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
  pu AS (
    SELECT user_id, step_1, step_2, step_3, count(*) AS occ
    FROM g WHERE step_3 IS NOT NULL GROUP BY 1, 2, 3, 4)
  SELECT step_1, step_2, step_3,
         count(*) AS support,
         CAST(sum(occ) AS BIGINT) AS occurrences
  FROM pu GROUP BY 1, 2, 3
  ORDER BY support DESC, occurrences DESC, step_1, step_2, step_3
  LIMIT 20
"""

def _linkage_ctes() -> str:
    """Shared WITH-body (master, corrupted contacts, blocked pairs,
    FS scores) for the linkage report and golden-record oracles --
    GENERATED from operators/linkage.fs_weights so the weight
    literals can never drift from the Spark expression (the
    pii_redact pattern); repr() of a Python double round-trips
    exactly in both engines."""
    from .operators.linkage import fs_weights

    w = fs_weights()
    # CAST each literal: DuckDB types a bare decimal literal as
    # DECIMAL, not DOUBLE -- the sum would be exact-decimal while
    # Spark sums doubles
    score = " + ".join(
        f"CASE WHEN {f}_agree THEN CAST({wa!r} AS DOUBLE) "
        f"ELSE CAST({wd!r} AS DOUBLE) END"
        for f, (wa, wd) in w.items()
    )
    return f"""
  WITH m AS (
    SELECT c_custkey AS custkey, lower(c_name) AS nm, c_acctbal AS bal,
           c_mktsegment AS seg, c_nationkey AS nat,
           CAST(floor(c_acctbal) AS BIGINT) AS blk
    FROM customer),
  c AS (
    SELECT c_custkey + 10000000 AS contact_id,
           CASE WHEN c_custkey % 5 = 0
                THEN substr(lower(c_name), 1, length(c_name) - 3)
                ELSE lower(c_name) END AS nm,
           CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 0.01
                ELSE c_acctbal END AS bal,
           c_mktsegment AS seg, c_nationkey AS nat
    FROM customer),
  p AS (
    SELECT m.custkey, c.contact_id,
           m.nm = c.nm AS nm_agree,
           m.bal = c.bal AS bal_agree,
           m.seg = c.seg AS seg_agree
    FROM m JOIN c
      ON m.nat = c.nat AND m.blk = CAST(floor(c.bal) AS BIGINT)),
  s AS (SELECT custkey, contact_id, nm_agree, bal_agree, seg_agree,
               ({score}) AS score
        FROM p)"""


ORACLES["record_linkage_fs"] = (
    _linkage_ctes()
    + """
  SELECT *, score > 0.0 AS is_match FROM s
  ORDER BY score DESC, custkey, contact_id LIMIT 100
"""
)

# Survivorship as explicit window argmax (row_number rn=1), the
# engine-independent mirror of Spark's min(struct) picks.
ORACLES["linkage_golden_record"] = (
    _linkage_ctes()
    + """,
  mt AS (SELECT custkey, contact_id FROM s WHERE score > 0.0),
  members AS (
    SELECT custkey, nm,
           CAST(CAST(bal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents, seg
    FROM m
    UNION ALL
    SELECT mt.custkey, c.nm,
           CAST(CAST(c.bal AS DECIMAL(18,2)) * 100 AS BIGINT), c.seg
    FROM mt JOIN c ON c.contact_id = mt.contact_id),
  np AS (SELECT custkey, nm, n_sources FROM (
      SELECT custkey, nm,
             count(*) OVER (PARTITION BY custkey) AS n_sources,
             row_number() OVER (PARTITION BY custkey
                                ORDER BY length(nm) DESC, nm) AS rn
      FROM members) WHERE rn = 1),
  bp AS (SELECT custkey, cents FROM (
      SELECT custkey, cents,
             row_number() OVER (PARTITION BY custkey
                                ORDER BY cnt DESC, cents) AS rn
      FROM (SELECT custkey, cents, count(*) AS cnt
            FROM members GROUP BY 1, 2)) WHERE rn = 1),
  sp AS (SELECT custkey, seg FROM (
      SELECT custkey, seg,
             row_number() OVER (PARTITION BY custkey
                                ORDER BY cnt DESC, seg) AS rn
      FROM (SELECT custkey, seg, count(*) AS cnt
            FROM members GROUP BY 1, 2)) WHERE rn = 1)
  SELECT np.custkey, CAST(np.n_sources AS BIGINT) AS n_sources,
         np.nm AS golden_name, bp.cents AS golden_bal_cents,
         sp.seg AS golden_seg, np.nm <> m.nm AS name_repaired
  FROM np JOIN bp USING (custkey) JOIN sp USING (custkey)
       JOIN m USING (custkey)
  ORDER BY custkey
"""
)

# NAIVE all-pairs containment (the size pre-filter is implied by the
# final predicate -- inter <= |B| and 10*inter >= 9*|A| force
# 10*|B| >= 9*|A| -- so adding it changes nothing but the bill).
ORACLES["containment_pairs"] = f"""
  WITH g AS (SELECT doc_id, shset AS st FROM ({_SQL_SHINGLES})
             WHERE len(shset) > 0),
  p AS (SELECT a.doc_id AS doc_small, b.doc_id AS doc_big,
          CAST(len(list_intersect(a.st, b.st)) AS BIGINT) AS inter,
          CAST(len(a.st) AS BIGINT) AS size_small
        FROM g a JOIN g b ON a.doc_id <> b.doc_id
        WHERE len(b.st) * 10 >= len(a.st) * 9)
  SELECT doc_small, doc_big, inter, size_small,
         round(CAST(inter AS DOUBLE) / size_small, 6) AS containment
  FROM p WHERE 10 * inter >= 9 * size_small
  ORDER BY doc_small, doc_big
"""

ORACLES["lang_token_entropy"] = f"""
  WITH t AS ({{TOKS}}),
  tk AS (SELECT lang, unnest(toks) AS w FROM t),
  cnt AS (SELECT lang, w, count(*) AS c FROM tk GROUP BY 1, 2),
  tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
                 count(*) AS vocab
          FROM cnt GROUP BY 1)
  SELECT cnt.lang, n_tokens, vocab,
         CAST(CAST(sum(CAST(round(
             -((CAST(c AS DOUBLE) / CAST(n_tokens AS DOUBLE))
               * log2(CAST(c AS DOUBLE) / CAST(n_tokens AS DOUBLE))), 9)
           AS DECIMAL(12,9))) AS VARCHAR) AS DOUBLE) AS entropy_bits
  FROM cnt JOIN tot USING (lang)
  GROUP BY 1, 2, 3 ORDER BY 1
""".replace("{TOKS}", _SQL_TOKS)

ORACLES["lang_lexical_richness"] = f"""
  WITH t AS ({{TOKS}}),
  tk AS (SELECT lang, unnest(toks) AS w FROM t),
  cnt AS (SELECT lang, w, count(*) AS c FROM tk GROUP BY 1, 2)
  SELECT lang,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hapax,
         CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS ttr,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS hapax_share
  FROM cnt GROUP BY 1 ORDER BY 1
""".replace("{TOKS}", _SQL_TOKS)

ORACLES["k_anonymity_report"] = f"""
  WITH g AS (
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_k,
           count(*) AS g
    FROM customer GROUP BY 1, 2, 3)
  SELECT {K_ANON} AS k,
         count(*) AS n_groups,
         CAST(sum(CASE WHEN g < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating_groups,
         CAST(sum(CASE WHEN g < {K_ANON} THEN g ELSE 0 END) AS BIGINT)
           AS rows_at_risk,
         min(g) AS min_group_size
  FROM g
"""

# Integer-micro revenue, native window cumsum, INTEGER 80/95
# boundaries (5*cum <= 4*tot etc.) -- no division decides a class.
ORACLES["parts_abc_analysis"] = """
  WITH pr AS (
    SELECT l_partkey AS partkey,
           CAST(sum(CAST(
             (CAST(l_extendedprice AS DECIMAL(12,2))
              * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
             * 1000000 AS BIGINT)) AS BIGINT) AS micros
    FROM lineitem GROUP BY 1),
  t AS (SELECT CAST(sum(micros) AS BIGINT) AS tot FROM pr),
  cum AS (
    SELECT partkey, micros,
           sum(micros) OVER (ORDER BY micros DESC, partkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
    FROM pr),
  cls AS (
    SELECT CASE WHEN 5 * cm <= 4 * tot THEN 'A'
                WHEN 20 * cm <= 19 * tot THEN 'B'
                ELSE 'C' END AS abc_class,
           micros, tot
    FROM cum, t)
  SELECT abc_class, count(*) AS n_parts,
         CAST(CAST(sum(micros) AS BIGINT) AS DOUBLE) / 1000000.0 AS revenue,
         CAST(CAST(sum(micros) AS BIGINT) AS DOUBLE)
           / CAST(max(tot) AS DOUBLE) AS revenue_share
  FROM cls GROUP BY 1 ORDER BY 1
"""

# Exact-integer Gini: HUGEINT arithmetic on DuckDB's side, DECIMAL
# on Spark's; both string-route the identical exact numbers.
ORACLES["customer_spend_gini"] = """
  WITH spend AS (
    SELECT o_custkey AS custkey,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY 1),
  ranked AS (
    SELECT cents,
           row_number() OVER (ORDER BY cents, custkey) AS rn
    FROM spend),
  agg AS (
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           sum(CAST(2 * rn AS HUGEINT) * CAST(cents AS HUGEINT)) AS s2
    FROM ranked)
  SELECT n_customers, total_cents,
         CAST(CAST(s2 - CAST(n_customers + 1 AS HUGEINT)
                        * CAST(total_cents AS HUGEINT) AS VARCHAR) AS DOUBLE)
           / CAST(CAST(CAST(n_customers AS HUGEINT)
                        * CAST(total_cents AS HUGEINT) AS VARCHAR) AS DOUBLE)
           AS gini
  FROM agg
"""

ORACLES["corpus_drift_psi"] = """
  WITH a AS (SELECT lang AS cat, count(*) AS n_base FROM documents
             WHERE doc_id % 2 = 0 GROUP BY 1),
  b AS (SELECT lang AS cat, count(*) AS n_curr FROM documents
        WHERE doc_id % 2 = 1 GROUP BY 1),
  ta AS (SELECT CAST(sum(n_base) AS BIGINT) AS t FROM a),
  tb AS (SELECT CAST(sum(n_curr) AS BIGINT) AS t FROM b),
  j AS (SELECT cat, n_base, n_curr,
          CAST(n_base AS DOUBLE) / CAST(ta.t AS DOUBLE) AS p_base,
          CAST(n_curr AS DOUBLE) / CAST(tb.t AS DOUBLE) AS p_curr
        FROM a JOIN b USING (cat), ta, tb)
  SELECT cat, n_base, n_curr, p_base, p_curr,
         (p_curr - p_base) * round(ln(p_curr / p_base), 9) AS psi_term,
         p_curr * round(ln(p_curr / p_base), 9) AS kl_term
  FROM j ORDER BY cat
"""

# Right-continuous empirical CDFs over the union of distinct values;
# the hash match proves the bucketed cumsum + argmax tie-break exact.
ORACLES["value_drift_ks"] = """
  WITH ca AS (SELECT value AS v, count(*) AS ca FROM events
              WHERE event_type = 'purchase' GROUP BY 1),
  cb AS (SELECT value AS v, count(*) AS cb FROM events
         WHERE event_type = 'click' GROUP BY 1),
  u AS (SELECT coalesce(ca.v, cb.v) AS v,
               coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
        FROM ca FULL OUTER JOIN cb ON ca.v = cb.v),
  t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
               CAST(sum(cb) AS BIGINT) AS nb FROM u),
  cum AS (SELECT v,
                 sum(ca) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS la,
                 sum(cb) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lb
          FROM u)
  SELECT t.na AS n_a, t.nb AS n_b,
         abs(CAST(la AS DOUBLE) / CAST(t.na AS DOUBLE)
             - CAST(lb AS DOUBLE) / CAST(t.nb AS DOUBLE)) AS ks_d,
         v AS at_value
  FROM cum, t ORDER BY ks_d DESC, v LIMIT 1
"""

# Naive wedge enumeration + anti-join; deg_w >= 2 for any common
# neighbor, so ln(deg) > 0 always. Adamic-Adar terms are rounded to
# 9dp and summed as DECIMAL (order-independent), then string-routed
# to double; jaccard is one int/int division, shipped unrounded.
ORACLES["cosupply_link_prediction"] = """
  WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
  w AS (SELECT a.s AS s1, b.s AS s2, count(*) AS c
        FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s GROUP BY 1, 2),
  t AS (SELECT CAST(sum(c) AS DOUBLE) / count(*) * 1.1 AS thr FROM w),
  e AS MATERIALIZED (SELECT s1, s2 FROM w, t WHERE c >= thr),
  und AS MATERIALIZED (SELECT s1 AS w, s2 AS x FROM e
                       UNION ALL SELECT s2, s1 FROM e),
  deg AS MATERIALIZED (SELECT w, count(*) AS d FROM und GROUP BY 1),
  wedge AS (
    SELECT a.x AS x1, b.x AS x2,
           CAST(round(1.0 / ln(CAST(deg.d AS DOUBLE)), 9)
                AS DECIMAL(12,9)) AS term
    FROM und a JOIN und b ON a.w = b.w AND a.x < b.x
               JOIN deg ON deg.w = a.w),
  pairs AS (
    SELECT x1, x2, count(*) AS cn, sum(term) AS aa
    FROM wedge GROUP BY 1, 2),
  nonadj AS (
    SELECT p.* FROM pairs p
    WHERE NOT EXISTS (SELECT 1 FROM e
                      WHERE e.s1 = p.x1 AND e.s2 = p.x2))
  SELECT n.x1 AS s1, n.x2 AS s2, n.cn AS common_neighbors,
         CAST(n.cn AS DOUBLE) / (d1.d + d2.d - n.cn) AS jaccard,
         CAST(CAST(n.aa AS VARCHAR) AS DOUBLE) AS adamic_adar
  FROM nonadj n JOIN deg d1 ON d1.w = n.x1 JOIN deg d2 ON d2.w = n.x2
  ORDER BY adamic_adar DESC, common_neighbors DESC, s1, s2
  LIMIT 20
"""

# Same wedge enumeration with centers capped at degree 256 (the scale
# knob); endpoint degrees for Jaccard stay UNCAPPED -- the cap bounds
# fan-out, not the denominator semantics.
ORACLES["cosupply_link_prediction_capped"] = """
  WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
  w AS (SELECT a.s AS s1, b.s AS s2, count(*) AS c
        FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s GROUP BY 1, 2),
  t AS (SELECT CAST(sum(c) AS DOUBLE) / count(*) * 1.1 AS thr FROM w),
  e AS MATERIALIZED (SELECT s1, s2 FROM w, t WHERE c >= thr),
  und AS MATERIALIZED (SELECT s1 AS w, s2 AS x FROM e
                       UNION ALL SELECT s2, s1 FROM e),
  deg AS MATERIALIZED (SELECT w, count(*) AS d FROM und GROUP BY 1),
  wedge AS (
    SELECT a.x AS x1, b.x AS x2,
           CAST(round(1.0 / ln(CAST(deg.d AS DOUBLE)), 9)
                AS DECIMAL(12,9)) AS term
    FROM und a JOIN und b ON a.w = b.w AND a.x < b.x
               JOIN deg ON deg.w = a.w
    WHERE deg.d <= 256),
  pairs AS (
    SELECT x1, x2, count(*) AS cn, sum(term) AS aa
    FROM wedge GROUP BY 1, 2),
  nonadj AS (
    SELECT p.* FROM pairs p
    WHERE NOT EXISTS (SELECT 1 FROM e
                      WHERE e.s1 = p.x1 AND e.s2 = p.x2))
  SELECT n.x1 AS s1, n.x2 AS s2, n.cn AS common_neighbors,
         CAST(n.cn AS DOUBLE) / (d1.d + d2.d - n.cn) AS jaccard,
         CAST(CAST(n.aa AS VARCHAR) AS DOUBLE) AS adamic_adar
  FROM nonadj n JOIN deg d1 ON d1.w = n.x1 JOIN deg d2 ON d2.w = n.x2
  ORDER BY adamic_adar DESC, common_neighbors DESC, s1, s2
  LIMIT 20
"""

ORACLES["user_day_snapshot_diff"] = """
  WITH o AS (SELECT user_id, date_trunc('day', ts) AS day,
               count(*) AS n_events,
               round(CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE), 6) AS sum_value,
               TRUE AS o_present
             FROM events WHERE event_id % 10 <> 0 GROUP BY 1, 2),
  n AS (SELECT user_id, date_trunc('day', ts) AS day,
               count(*) AS n_events,
               round(CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE), 6) AS sum_value,
               TRUE AS n_present
        FROM events WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' GROUP BY 1, 2),
  j AS (SELECT user_id, day,
               o.n_events AS old_n_events, n.n_events AS new_n_events,
               o.sum_value AS old_sum_value, n.sum_value AS new_sum_value,
               o_present, n_present,
               concat_ws(',',
                 CASE WHEN o.n_events IS DISTINCT FROM n.n_events THEN 'n_events' END,
                 CASE WHEN o.sum_value IS DISTINCT FROM n.sum_value THEN 'sum_value' END) AS chg
        FROM o FULL OUTER JOIN n USING (user_id, day)),
  c AS (SELECT *,
          CASE WHEN n_present IS NULL THEN 'delete'
               WHEN o_present IS NULL THEN 'insert'
               WHEN chg <> '' THEN 'update' END AS change
        FROM j)
  SELECT user_id, strftime(day, '%Y-%m-%d') AS day_s, change,
         CASE WHEN change = 'update' THEN chg ELSE '' END AS changed_cols,
         old_n_events, new_n_events, old_sum_value, new_sum_value
  FROM c WHERE change IS NOT NULL
"""
ORACLES["purchase_hits"] = _hits_ctes(iters=3)

ORACLES["embedding_dim_stats"] = """
  WITH ex AS (
    SELECT unnest(generate_series(1, len(embedding))) - 1 AS dim,
           unnest(CAST(embedding AS DOUBLE[])) AS e
    FROM embeddings),
  st AS (
    SELECT dim, count(*) AS n,
           CAST(CAST(sum(CAST(round(e, 9) AS DECIMAL(20,9))) AS VARCHAR) AS DOUBLE) AS s,
           CAST(CAST(sum(CAST(round(e * e, 9) AS DECIMAL(20,9))) AS VARCHAR) AS DOUBLE) AS sq,
           min(e) AS min_v, max(e) AS max_v
    FROM ex GROUP BY 1)
  SELECT dim, round(s / n, 9) AS mean,
         round(sqrt(greatest(CAST(0 AS DOUBLE), (sq - s * s / n) / n)), 9) AS std,
         min_v, max_v
  FROM st ORDER BY dim
"""

ORACLES["embedding_dim_correlation"] = """
  WITH ex AS (
    SELECT vec_id,
           unnest(generate_series(1, len(embedding))) - 1 AS dim,
           unnest(CAST(embedding AS DOUBLE[])) AS e
    FROM embeddings),
  f AS (SELECT * FROM ex WHERE dim < 8),
  pr AS (
    SELECT a.dim AS dim_i, b.dim AS dim_j, a.e AS xi, b.e AS xj
    FROM f a JOIN f b ON a.vec_id = b.vec_id AND a.dim < b.dim),
  st AS (
    SELECT dim_i, dim_j, CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(sum(CAST(round(xi, 9) AS DECIMAL(20,9)))
                AS VARCHAR) AS DOUBLE) AS sx,
           CAST(CAST(sum(CAST(round(xj, 9) AS DECIMAL(20,9)))
                AS VARCHAR) AS DOUBLE) AS sy,
           CAST(CAST(sum(CAST(round(xi * xj, 9) AS DECIMAL(20,9)))
                AS VARCHAR) AS DOUBLE) AS sxy,
           CAST(CAST(sum(CAST(round(xi * xi, 9) AS DECIMAL(20,9)))
                AS VARCHAR) AS DOUBLE) AS sxx,
           CAST(CAST(sum(CAST(round(xj * xj, 9) AS DECIMAL(20,9)))
                AS VARCHAR) AS DOUBLE) AS syy
    FROM pr GROUP BY 1, 2)
  SELECT dim_i, dim_j, n,
         round((CAST(n AS DOUBLE) * sxy - sx * sy)
               / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                      * (CAST(n AS DOUBLE) * syy - sy * sy)), 9) AS r
  FROM st ORDER BY 1, 2
"""

ORACLES["user_activity_streaks"] = """
  WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
  islands AS (
    SELECT user_id, d,
           d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INTEGER) AS anchor
    FROM days),
  runs AS (SELECT user_id, anchor, CAST(count(*) AS BIGINT) AS run_len
           FROM islands GROUP BY 1, 2)
  SELECT user_id, CAST(sum(run_len) AS BIGINT) AS n_active_days,
         max(run_len) AS longest_streak
  FROM runs GROUP BY 1
"""

ORACLES["funnel_strict_sequence"] = """
  WITH s AS (SELECT user_id, min(ts) AS t1 FROM events
             WHERE event_type = 'signup' GROUP BY 1),
  v AS (SELECT e.user_id, min(e.ts) AS t2, min(s.t1) AS t1
        FROM events e JOIN s USING (user_id)
        WHERE e.event_type = 'view' AND e.ts > s.t1 GROUP BY 1),
  p AS (SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > v.t2
          AND e.ts <= v.t1 + INTERVAL 7 DAY GROUP BY 1),
  n AS (SELECT (SELECT count(*) FROM s) AS n1,
               (SELECT count(*) FROM v) AS n2,
               (SELECT count(*) FROM p) AS n3)
  SELECT '1_signup' AS stage, n1 AS n_users, CAST(1.0 AS DOUBLE) AS rate FROM n
  UNION ALL
  SELECT '2_view_after_signup', n2, n2 / n1 FROM n
  UNION ALL
  SELECT '3_purchase_within_7d', n3, n3 / n2 FROM n
"""

ORACLES["event_transitions"] = """
  WITH nxt AS (
    SELECT event_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events),
  c AS (SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n_transitions
        FROM nxt WHERE next_type IS NOT NULL GROUP BY 1, 2),
  tot AS (SELECT event_type, CAST(sum(n_transitions) AS BIGINT) AS t
          FROM c GROUP BY 1)
  SELECT c.event_type, next_type, n_transitions, n_transitions / t AS p
  FROM c JOIN tot ON c.event_type = tot.event_type
  ORDER BY 1, 2
"""

ORACLES["market_basket_pairs"] = """
  WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
  nn AS (SELECT count(DISTINCT o) AS n FROM b),
  item AS (SELECT p, count(*) AS item_n FROM b GROUP BY 1),
  pairs AS (SELECT a.p AS p1, c.p AS p2, count(*) AS pair_n
            FROM b a JOIN b c ON a.o = c.o AND a.p < c.p
            GROUP BY 1, 2 HAVING count(*) >= 2)
  SELECT p1, p2, pair_n,
         pair_n / n AS support,
         pair_n / i1.item_n AS confidence,
         (pair_n * n) / (i1.item_n * i2.item_n) AS lift
  FROM pairs
  JOIN item i1 ON i1.p = p1
  JOIN item i2 ON i2.p = p2
  CROSS JOIN nn
  ORDER BY lift DESC, p1, p2
  LIMIT 50
"""

# NAIVE all-triples enumeration: the hash match proves the A-priori
# candidate pruning in operators/basket.market_basket_triples lossless
ORACLES["market_basket_triples"] = """
  WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
  nn AS (SELECT count(DISTINCT o) AS n FROM b),
  item AS (SELECT p, count(*) AS item_n FROM b GROUP BY 1),
  pairs AS (SELECT a.p AS p1, c.p AS p2, count(*) AS pair_n
            FROM b a JOIN b c ON a.o = c.o AND a.p < c.p
            GROUP BY 1, 2 HAVING count(*) >= 2),
  tri AS (SELECT a.p AS p1, c.p AS p2, d.p AS p3, count(*) AS tri_n
          FROM b a JOIN b c ON a.o = c.o AND a.p < c.p
                   JOIN b d ON a.o = d.o AND c.p < d.p
          GROUP BY 1, 2, 3 HAVING count(*) >= 2)
  SELECT p1, p2, p3, tri_n,
         tri_n / n AS support,
         tri_n / pair_n AS confidence,
         (tri_n * n * n) / (i1.item_n * i2.item_n * i3.item_n) AS lift
  FROM tri
  JOIN pairs USING (p1, p2)
  JOIN item i1 ON i1.p = p1
  JOIN item i2 ON i2.p = p2
  JOIN item i3 ON i3.p = p3
  CROSS JOIN nn
  ORDER BY lift DESC, p1, p2, p3
  LIMIT 30
"""

ORACLES["rake_keyphrases"] = f"""
  WITH t AS ({_SQL_TOKS}),
  w AS (SELECT doc_id,
               unnest(generate_series(1, len(toks))) AS pos,
               unnest(toks) AS word
        FROM t),
  m AS (SELECT doc_id, pos, word,
               CASE WHEN word IN ('the', 'a', 'join', 'merge', 'small', 'fast', 'slow', 'big') THEN 1 ELSE 0 END AS is_stop
        FROM w),
  isl AS (SELECT doc_id, pos, word,
                 sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS phrase_id,
                 is_stop
          FROM m),
  members AS (SELECT doc_id, phrase_id, pos, word FROM isl WHERE is_stop = 0),
  phr AS (SELECT doc_id, phrase_id,
                 string_agg(word, ' ' ORDER BY pos) AS phrase,
                 count(*) AS plen
          FROM members GROUP BY 1, 2 HAVING count(*) <= 4),
  wstat AS (SELECT word, sum(plen) / count(*) AS wscore
            FROM members JOIN phr USING (doc_id, phrase_id) GROUP BY 1),
  pscore AS (SELECT doc_id, phrase_id,
                    CAST(CAST(sum(CAST(round(wscore, 9) AS DECIMAL(20,9)))
                         AS VARCHAR) AS DOUBLE) AS score
             FROM members JOIN phr USING (doc_id, phrase_id)
                          JOIN wstat USING (word)
             GROUP BY 1, 2)
  SELECT phrase, count(*) AS n, round(max(score), 6) AS score
  FROM phr JOIN pscore USING (doc_id, phrase_id)
  GROUP BY phrase
  ORDER BY score DESC, phrase ASC LIMIT 20
"""

ORACLES["training_negatives"] = """
  WITH pos AS (SELECT DISTINCT o_custkey AS custkey, l_partkey AS part
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
  np AS (SELECT count(*) AS n_parts FROM part),
  cand AS (SELECT custkey, part AS pos_part, slot,
                  CAST(concat('0x', substr(md5(concat_ws(':', 'neg1',
                        CAST(custkey AS VARCHAR), CAST(part AS VARCHAR),
                        CAST(slot AS VARCHAR))), 1, 8)) AS BIGINT)
                  % n_parts AS neg_part
           FROM pos CROSS JOIN np
           CROSS JOIN (SELECT unnest(range(1, 4)) AS slot))
  SELECT custkey, pos_part, CAST(slot AS BIGINT) AS slot, neg_part
  FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM pos p
                    WHERE p.custkey = c.custkey AND p.part = c.neg_part)
"""

ORACLES["item_item_cf"] = """
  WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
  item AS (SELECT p, count(*) AS item_n FROM b GROUP BY 1),
  pairs AS (SELECT a.p AS p1, c.p AS p2, count(*) AS c12
            FROM b a JOIN b c ON a.o = c.o AND a.p < c.p
            GROUP BY 1, 2 HAVING count(*) >= 2),
  sym AS (SELECT p1, p2, c12 FROM pairs
          UNION ALL SELECT p2, p1, c12 FROM pairs),
  scored AS (SELECT sym.p1 AS part, sym.p2 AS neighbor, c12,
                    round(c12 / sqrt(CAST(i1.item_n * i2.item_n AS DOUBLE)), 6)
                      AS cosine
             FROM sym
             JOIN item i1 ON i1.p = sym.p1
             JOIN item i2 ON i2.p = sym.p2)
  SELECT part, neighbor, c12, cosine, rank FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY part
              ORDER BY cosine DESC, neighbor ASC) AS BIGINT) AS rank
    FROM scored) WHERE rank <= 5
"""

ORACLES["dq_audit"] = """
  WITH lt AS (
    SELECT l_orderkey,
           round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
                     * (CAST(1 AS DECIMAL(8,4)) + CAST(l_tax AS DECIMAL(8,4)))), 2) AS tot
    FROM lineitem GROUP BY 1)
  SELECT 'lineitem_qty_in_1_50' AS check_name, count(*) AS n_checked,
         CAST(count(*) FILTER (l_quantity < 1 OR l_quantity > 50) AS BIGINT) AS n_violations
  FROM lineitem
  UNION ALL
  SELECT 'lineitem_discount_in_0_01', count(*),
         count(*) FILTER (l_discount < 0 OR l_discount > CAST(0.1 AS DOUBLE))
  FROM lineitem
  UNION ALL
  SELECT 'lineitem_returnflag_domain', count(*),
         count(*) FILTER (l_returnflag NOT IN ('A', 'N', 'R'))
  FROM lineitem
  UNION ALL
  SELECT 'lineitem_pk_nonnull', count(*),
         count(*) FILTER (l_orderkey IS NULL OR l_linenumber IS NULL)
  FROM lineitem
  UNION ALL
  SELECT 'orders_totalprice_positive', count(*),
         count(*) FILTER (o_totalprice <= 0)
  FROM orders
  UNION ALL
  SELECT 'events_value_nonnull', count(*),
         count(*) FILTER (value IS NULL)
  FROM events
  UNION ALL
  SELECT 'events_props_json_valid', count(*),
         count(*) FILTER (NOT json_valid(props))
  FROM events
  UNION ALL
  SELECT 'events_event_id_nonnull', count(*),
         count(*) FILTER (event_id IS NULL)
  FROM events
  UNION ALL
  SELECT 'documents_nchars_consistent', count(*),
         count(*) FILTER (n_chars <> length(text))
  FROM documents
  UNION ALL
  SELECT 'documents_text_nonempty', count(*),
         count(*) FILTER (text IS NULL OR length(text) = 0)
  FROM documents
  UNION ALL
  SELECT 'orders_pk_unique', count(*), count(*) - count(DISTINCT o_orderkey)
  FROM orders
  UNION ALL
  SELECT 'events_pk_unique', count(*), count(*) - count(DISTINCT event_id)
  FROM events
  UNION ALL
  SELECT 'lineitem_pk_unique', count(*),
         count(*) - count(DISTINCT (l_orderkey, l_linenumber))
  FROM lineitem
  UNION ALL
  SELECT 'orders_fk_customer', count(*),
         count(*) FILTER (o_custkey NOT IN (SELECT c_custkey FROM customer))
  FROM orders
  UNION ALL
  SELECT 'lineitem_fk_orders', count(*),
         count(*) FILTER (l_orderkey NOT IN (SELECT o_orderkey FROM orders))
  FROM lineitem
  UNION ALL
  SELECT 'orders_have_lineitems', count(*),
         count(*) FILTER (o_orderkey NOT IN (SELECT l_orderkey FROM lineitem))
  FROM orders
  UNION ALL
  SELECT 'orders_totalprice_reconciles', count(*),
         count(*) FILTER (abs(CAST(o_totalprice AS DECIMAL(18,2)) - tot)
                          > CAST(0.01 AS DECIMAL(18,2)))
  FROM orders JOIN lt ON o_orderkey = l_orderkey
"""


# U-shaped multi-touch credits: weights are IEEE expressions over
# identical integers; per-touch credits round 6dp and sum as DECIMAL.
ORACLES["attribution_position_weighted"] = """
  WITH s AS (
    SELECT event_id, user_id, ts, event_type, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR CAST(floor(epoch(ts)) AS BIGINT)
                     - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                THEN 1 ELSE 0 END AS st
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
  s2 AS (SELECT *, sum(st) OVER (PARTITION BY user_id
             ORDER BY ts ASC, event_id ASC ROWS UNBOUNDED PRECEDING)
             AS session_id FROM s),
  fp AS (SELECT user_id, session_id, ts AS p_ts, event_id AS p_id,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS p_cents,
                row_number() OVER (PARTITION BY user_id, session_id
                                   ORDER BY ts, event_id) AS rn
         FROM s2 WHERE event_type = 'purchase'),
  fp1 AS (SELECT * FROM fp WHERE rn = 1),
  touches AS (
    SELECT t.user_id, t.session_id, t.ts, t.event_id,
           t.event_type AS touch_type, f.p_cents
    FROM s2 t JOIN fp1 f ON t.user_id = f.user_id
                         AND t.session_id = f.session_id
    WHERE t.event_type <> 'purchase'
      AND (t.ts < f.p_ts OR (t.ts = f.p_ts AND t.event_id < f.p_id))),
  scored AS (
    SELECT touch_type,
           row_number() OVER wt AS idx,
           count(*) OVER wn AS n,
           p_cents
    FROM touches
    WINDOW wt AS (PARTITION BY user_id, session_id ORDER BY ts, event_id),
           wn AS (PARTITION BY user_id, session_id)),
  cr AS (
    SELECT touch_type,
           CASE WHEN idx = 1 THEN 'first' WHEN idx = n THEN 'last'
                ELSE 'middle' END AS position,
           CAST(round(p_cents * (CASE WHEN n = 1 THEN CAST(1.0 AS DOUBLE)
                 WHEN idx = 1 THEN CASE WHEN n = 2 THEN CAST(0.5 AS DOUBLE)
                                        ELSE CAST(0.4 AS DOUBLE) END
                 WHEN idx = n THEN CASE WHEN n = 2 THEN CAST(0.5 AS DOUBLE)
                                        ELSE CAST(0.4 AS DOUBLE) END
                 ELSE CAST(0.2 AS DOUBLE) / (n - 2) END), 6)
                AS DECIMAL(20,6)) AS credit
    FROM scored)
  SELECT touch_type, position, count(*) AS n_touches,
         CAST(CAST(sum(credit) AS VARCHAR) AS DOUBLE) AS credit_total
  FROM cr GROUP BY 1, 2 ORDER BY touch_type, position
"""

# Lindley reflection in closed form: B = S - min(0, running min S).
ORACLES["user_wallet_balance"] = """
  WITH base AS (
    SELECT user_id, event_id, ts,
           (CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END)
             * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS flow_cents
    FROM events WHERE event_type IN ('purchase', 'click')),
  runs AS (
    SELECT user_id, event_id, ts, flow_cents,
           sum(flow_cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
    FROM base)
  SELECT user_id, event_id, flow_cents,
         CAST(run - least(0, min(run) OVER (PARTITION BY user_id
           ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              AS BIGINT) AS balance_cents
  FROM runs
"""

ORACLES["embedding_mutual_nn"] = """
  WITH pairs AS (
    SELECT * FROM (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])), 6)
               AS cosine
      FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id
    ) WHERE cosine >= 0.35),
  sym AS (SELECT vec_a AS v, vec_b AS nb, cosine FROM pairs
          UNION ALL SELECT vec_b, vec_a, cosine FROM pairs),
  best AS (SELECT v, nb, cosine,
                  row_number() OVER (PARTITION BY v
                                     ORDER BY cosine DESC, nb) AS rn
           FROM sym),
  b1 AS (SELECT v, nb, cosine FROM best WHERE rn = 1)
  SELECT a.v AS vec_a, a.nb AS vec_b, a.cosine
  FROM b1 a JOIN b1 b ON a.nb = b.v AND b.nb = a.v AND a.v < a.nb
  ORDER BY vec_a
"""

# Mutual-NN over LSH-bucket candidates: identical reciprocity filter,
# candidate pairs restricted to a hyperplane-sign bucket (the
# embedding_dup_pairs_lsh CTEs with the deterministic LCG planes).
ORACLES["embedding_mutual_nn_lsh"] = f"""
  WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dvec FROM embeddings),
  b AS (SELECT vec_id, dvec, CAST({{bucket}} AS BIGINT) AS bucket FROM v),
  pairs AS (
    SELECT * FROM (
      SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
             round(list_cosine_similarity(a.dvec, c.dvec), 6) AS cosine
      FROM b a JOIN b c USING (bucket)
      WHERE a.vec_id < c.vec_id
    ) WHERE cosine >= 0.35),
  sym AS (SELECT vec_a AS v, vec_b AS nb, cosine FROM pairs
          UNION ALL SELECT vec_b, vec_a, cosine FROM pairs),
  best AS (SELECT v, nb, cosine,
                  row_number() OVER (PARTITION BY v
                                     ORDER BY cosine DESC, nb) AS rn
           FROM sym),
  b1 AS (SELECT v, nb, cosine FROM best WHERE rn = 1)
  SELECT a.v AS vec_a, a.nb AS vec_b, a.cosine
  FROM b1 a JOIN b1 b ON a.nb = b.v AND b.nb = a.v AND a.v < a.nb
  ORDER BY vec_a
""".format(bucket=_bucket_terms_sql())

# Winsorized mean: the trimmed-mean machinery with the tails CLAMPED
# to the rank-(k+1)/(n-k) fences instead of dropped; fences selected
# by cumulative count, winsorized sum in exact BIGINTs.
ORACLES["events_winsorized_mean"] = """
  WITH grain AS (
    SELECT event_type AS g,
           CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
           count(*) AS cnt
    FROM events GROUP BY 1, 2),
  cum AS (
    SELECT g, v, cnt,
           CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum,
           CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
    FROM grain),
  kk AS (
    SELECT *, (n * 5) // 100 AS k FROM cum),
  kept AS (
    SELECT g, v, cnt, cum, n, k,
           greatest(CAST(0 AS BIGINT),
                    least(cum, n - k) - greatest(cum - cnt, k)) AS kp
    FROM kk),
  agg AS (
    SELECT g,
           CAST(max(n) AS BIGINT) AS n,
           CAST(max(k) AS BIGINT) AS k,
           CAST(sum(kp * v) AS BIGINT) AS ks,
           CAST(sum(cnt * v) AS BIGINT) AS ts,
           min(CASE WHEN cum >= k + 1 THEN v END) AS lo,
           min(CASE WHEN cum >= n - k THEN v END) AS hi
    FROM kept GROUP BY g)
  SELECT g AS event_type, n, k AS n_clamped_each_side,
         lo AS lo_cents, hi AS hi_cents,
         CAST(ks + k * lo + k * hi AS DOUBLE) / CAST(n AS DOUBLE)
           AS winsorized_mean_cents,
         CAST(ts AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents
  FROM agg ORDER BY 1
"""

# Transition entropy per state: p from exact-integer division, each
# -p*ln(p) term 9dp-decimal-rounded (order-independent sum), summed
# as DECIMAL and string-routed to double.
ORACLES["event_markov_entropy"] = """
  WITH nxt AS (
    SELECT event_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events),
  c AS (SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS nn
        FROM nxt WHERE next_type IS NOT NULL GROUP BY 1, 2),
  tot AS (SELECT event_type, CAST(sum(nn) AS BIGINT) AS t,
                 CAST(count(*) AS BIGINT) AS n_next
          FROM c GROUP BY 1)
  SELECT c.event_type,
         max(t) AS n_transitions,
         max(n_next) AS n_next_types,
         CAST(CAST(sum(CAST(round(-((nn / t) * ln(nn / t)), 9)
                            AS DECIMAL(12,9))) AS VARCHAR) AS DOUBLE)
           AS entropy_nats
  FROM c JOIN tot ON c.event_type = tot.event_type
  GROUP BY c.event_type ORDER BY 1
"""

# Spearman rho + Kendall tau between the 1995/1996 nation revenue
# rankings: all pair math at the 25-row nation grain.
ORACLES["nation_rank_spearman"] = """
  WITH yearly AS (
    SELECT n_name AS nation, year(o_orderdate) AS yr,
           sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
                    * 1000000 AS HUGEINT)) AS rev
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
    WHERE year(o_orderdate) IN (1995, 1996)
    GROUP BY 1, 2),
  ranked AS (
    SELECT nation, yr,
           CAST(row_number() OVER (PARTITION BY yr
                                   ORDER BY rev DESC, nation) AS BIGINT) AS rnk
    FROM yearly),
  p AS (SELECT a.nation, a.rnk AS r95, b.rnk AS r96
        FROM ranked a JOIN ranked b ON a.nation = b.nation
        WHERE a.yr = 1995 AND b.yr = 1996),
  s AS (SELECT CAST(count(*) AS BIGINT) AS n_nations,
               CAST(sum((r95 - r96) * (r95 - r96)) AS BIGINT) AS sum_d2
        FROM p),
  pr AS (SELECT
           CAST(coalesce(sum(CASE WHEN (a.r95 - b.r95) * (a.r96 - b.r96) > 0
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_concordant,
           CAST(coalesce(sum(CASE WHEN (a.r95 - b.r95) * (a.r96 - b.r96) < 0
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_discordant
         FROM p a JOIN p b ON a.nation < b.nation)
  SELECT n_nations, sum_d2,
         1.0 - (6.0 * CAST(sum_d2 AS DOUBLE))
           / CAST(n_nations * (n_nations * n_nations - 1) AS DOUBLE)
           AS spearman,
         n_concordant, n_discordant,
         CAST(n_concordant - n_discordant AS DOUBLE)
           / CAST((n_nations * (n_nations - 1)) // 2 AS DOUBLE)
           AS kendall_tau
  FROM s CROSS JOIN pr
"""

# Directed association rules: both directions of each pruned pair,
# classical support/confidence/lift/leverage/conviction; conviction
# NULL for exact rules (integer-equality guard, not a float compare).
ORACLES["basket_rules"] = """
  WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
  nn AS (SELECT count(DISTINCT o) AS n FROM b),
  item AS (SELECT p, count(*) AS item_n FROM b GROUP BY 1),
  pairs AS (SELECT a.p AS p1, c.p AS p2, count(*) AS pair_n
            FROM b a JOIN b c ON a.o = c.o AND a.p < c.p
            GROUP BY 1, 2 HAVING count(*) >= 2),
  directed AS (SELECT p1 AS antecedent, p2 AS consequent, pair_n FROM pairs
               UNION ALL
               SELECT p2 AS antecedent, p1 AS consequent, pair_n FROM pairs)
  SELECT antecedent, consequent, pair_n,
         pair_n / n AS support,
         pair_n / ia.item_n AS confidence,
         (pair_n * n) / (ia.item_n * ic.item_n) AS lift,
         pair_n / n - (ia.item_n / n) * (ic.item_n / n) AS leverage,
         CASE WHEN pair_n = ia.item_n THEN NULL
              ELSE (1.0 - ic.item_n / n) / (1.0 - pair_n / ia.item_n)
         END AS conviction
  FROM directed
  JOIN item ia ON ia.p = antecedent
  JOIN item ic ON ic.p = consequent
  CROSS JOIN nn
  ORDER BY lift DESC, antecedent, consequent
  LIMIT 50
"""

# Heaps'-law vocabulary-growth fit: cumulative tokens/types in doc_id
# order, 9dp-decimal log terms, the zipf OLS chain.
ORACLES["heaps_law_fit"] = r"""
  WITH raw AS (
    SELECT doc_id,
           unnest(string_split_regex(trim(lower(
             regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+')) AS word
    FROM documents),
  tk AS (SELECT doc_id, word FROM raw WHERE word <> ''),
  per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS tok_n
              FROM tk GROUP BY 1),
  firsts AS (SELECT word, min(doc_id) AS doc_id FROM tk GROUP BY 1),
  newt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS types_new
           FROM firsts GROUP BY 1),
  base AS (SELECT p.doc_id, p.tok_n, coalesce(n.types_new, 0) AS types_new
           FROM per_doc p LEFT JOIN newt n USING (doc_id)),
  cum AS (SELECT CAST(sum(tok_n) OVER w AS BIGINT) AS ct,
                 CAST(sum(types_new) OVER w AS BIGINT) AS cv
          FROM base
          WINDOW w AS (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
  pts AS (SELECT ct, cv,
                 CAST(round(ln(CAST(ct AS DOUBLE)), 9) AS DECIMAL(12,9)) AS lx,
                 CAST(round(ln(CAST(cv AS DOUBLE)), 9) AS DECIMAL(12,9)) AS ly
          FROM cum),
  agg AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(ct) AS BIGINT) AS total_tokens,
           CAST(max(cv) AS BIGINT) AS total_types,
           CAST(CAST(sum(lx) AS VARCHAR) AS DOUBLE) AS sx,
           CAST(CAST(sum(ly) AS VARCHAR) AS DOUBLE) AS sy,
           CAST(CAST(sum(lx * ly) AS VARCHAR) AS DOUBLE) AS sxy,
           CAST(CAST(sum(lx * lx) AS VARCHAR) AS DOUBLE) AS sxx,
           CAST(CAST(sum(ly * ly) AS VARCHAR) AS DOUBLE) AS syy
    FROM pts)
  SELECT n_docs, total_tokens, total_types,
         (n_docs * sxy - sx * sy) / (n_docs * sxx - sx * sx) AS heaps_beta,
         (sy * sxx - sx * sxy) / (n_docs * sxx - sx * sx) AS heaps_ln_k,
         (n_docs * sxy - sx * sy) * (n_docs * sxy - sx * sy)
           / ((n_docs * sxx - sx * sx) * (n_docs * syy - sy * sy)) AS r2
  FROM agg
"""

# Per-doc distinct word-4-gram novelty vs all earlier docs.
ORACLES["ngram_novelty"] = r"""
  WITH raw AS (
    SELECT doc_id,
           list_filter(string_split_regex(trim(lower(
             regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             w -> w <> '') AS t
    FROM documents),
  g AS (SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(t) - 2),
                 i -> array_to_string(list_slice(t, i, i + 3), ' '))) AS gram
        FROM raw WHERE len(t) >= 4),
  f AS (SELECT gram, min(doc_id) AS fd FROM g GROUP BY 1)
  SELECT g.doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN f.fd < g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
           AS n_seen_before,
         CAST(count(*) - sum(CASE WHEN f.fd < g.doc_id THEN 1 ELSE 0 END)
              AS DOUBLE) / count(*) AS novelty
  FROM g JOIN f USING (gram)
  GROUP BY g.doc_id ORDER BY g.doc_id
"""

# Rocchio nearest-centroid confusion: centroids via the
# label_centroids decimal recipe; dots/norms as 12dp-decimal sums
# string-routed to double; argmax tie-break on label asc.
ORACLES["nearest_centroid_confusion"] = """
  WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS dvec
             FROM embeddings),
  i AS (SELECT vec_id, label, dvec,
               unnest(range(1, len(dvec) + 1)) AS idx FROM e),
  f AS (SELECT vec_id, label, idx AS pos, dvec[idx] AS v FROM i),
  cent AS (SELECT label AS clabel, pos,
                  round(CAST(CAST(sum(CAST(v AS DECIMAL(27,12)))
                                  AS VARCHAR) AS DOUBLE) / count(*), 6) AS c
           FROM f GROUP BY 1, 2),
  cn AS (SELECT clabel,
                CAST(CAST(sum(CAST(c * c AS DECIMAL(24,12))) AS VARCHAR)
                     AS DOUBLE) AS cnorm2
         FROM cent GROUP BY 1),
  vn AS (SELECT vec_id,
                CAST(CAST(sum(CAST(v * v AS DECIMAL(24,12))) AS VARCHAR)
                     AS DOUBLE) AS vnorm2
         FROM f GROUP BY 1),
  d AS (SELECT f.vec_id, f.label, cent.clabel,
               CAST(CAST(sum(CAST(f.v * cent.c AS DECIMAL(24,12)))
                         AS VARCHAR) AS DOUBLE) AS dot
        FROM f JOIN cent USING (pos) GROUP BY 1, 2, 3),
  s AS (SELECT d.vec_id, d.label, d.clabel,
               dot / (sqrt(vnorm2) * sqrt(cnorm2)) AS csim
        FROM d JOIN vn USING (vec_id) JOIN cn USING (clabel)),
  p AS (SELECT vec_id, label, clabel,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, clabel) AS rn
        FROM s)
  SELECT label, clabel AS pred_label, CAST(count(*) AS BIGINT) AS n_vecs
  FROM p WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2
"""

# Unrolled absorbing-chain value iteration at event-type grain.
ORACLES["event_conversion_absorption"] = "WITH " + _absorption_ctes(8)

# Simplified silhouette: squared distances from the decimal-exact
# dot/norm aggregates of the confusion oracle; per-term 9dp rounding.
ORACLES["label_silhouette"] = """
  WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS dvec
             FROM embeddings),
  i AS (SELECT vec_id, label, dvec,
               unnest(range(1, len(dvec) + 1)) AS idx FROM e),
  f AS (SELECT vec_id, label, idx AS pos, dvec[idx] AS v FROM i),
  cent AS (SELECT label AS clabel, pos,
                  round(CAST(CAST(sum(CAST(v AS DECIMAL(27,12)))
                                  AS VARCHAR) AS DOUBLE) / count(*), 6) AS c
           FROM f GROUP BY 1, 2),
  cn AS (SELECT clabel,
                CAST(CAST(sum(CAST(c * c AS DECIMAL(24,12))) AS VARCHAR)
                     AS DOUBLE) AS cnorm2
         FROM cent GROUP BY 1),
  vn AS (SELECT vec_id,
                CAST(CAST(sum(CAST(v * v AS DECIMAL(24,12))) AS VARCHAR)
                     AS DOUBLE) AS vnorm2
         FROM f GROUP BY 1),
  d AS (SELECT f.vec_id, f.label, cent.clabel,
               CAST(CAST(sum(CAST(f.v * cent.c AS DECIMAL(24,12)))
                         AS VARCHAR) AS DOUBLE) AS dot
        FROM f JOIN cent USING (pos) GROUP BY 1, 2, 3),
  dd AS (SELECT d.vec_id, d.label, d.clabel,
                vnorm2 - 2.0 * dot + cnorm2 AS d2
         FROM d JOIN vn USING (vec_id) JOIN cn USING (clabel)),
  a AS (SELECT vec_id, label, d2 AS av FROM dd WHERE label = clabel),
  b AS (SELECT vec_id, min(d2) AS bv FROM dd WHERE label <> clabel
        GROUP BY 1),
  s AS (SELECT a.label,
               CAST(round((bv - av) / greatest(av, bv), 9)
                    AS DECIMAL(12,9)) AS sil
        FROM a JOIN b USING (vec_id))
  SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
         CAST(CAST(sum(sil) AS VARCHAR) AS DOUBLE) / count(*)
           AS mean_silhouette
  FROM s GROUP BY 1 ORDER BY 1
"""

# Newman modularity of the nation partition over the co-supply graph:
# all-integer counts into one fixed IEEE chain per nation.
ORACLES["cosupply_nation_modularity"] = """
  WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
  w AS (SELECT a.s AS s1, b.s AS s2, count(*) AS c
        FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s GROUP BY 1, 2),
  t AS (SELECT CAST(sum(c) AS DOUBLE) / count(*) * 1.1 AS thr FROM w),
  e AS MATERIALIZED (SELECT s1, s2 FROM w, t WHERE c >= thr),
  sn AS (SELECT s_suppkey AS sk, n_name AS nation
         FROM supplier JOIN nation ON s_nationkey = n_nationkey),
  m1 AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
  und AS (SELECT s1 AS node FROM e UNION ALL SELECT s2 FROM e),
  dnat AS (SELECT sn.nation,
                  CAST(count(*) AS BIGINT) AS degree_sum,
                  CAST(count(DISTINCT node) AS BIGINT) AS n_suppliers
           FROM und JOIN sn ON und.node = sn.sk GROUP BY 1),
  intra AS (SELECT a.nation, CAST(count(*) AS BIGINT) AS intra_edges
            FROM e JOIN sn a ON e.s1 = a.sk JOIN sn b ON e.s2 = b.sk
            WHERE a.nation = b.nation GROUP BY 1)
  SELECT dnat.nation, n_suppliers, degree_sum,
         coalesce(intra.intra_edges, 0) AS intra_edges,
         CAST(coalesce(intra.intra_edges, 0) AS DOUBLE) / CAST(m AS DOUBLE)
           - (CAST(degree_sum AS DOUBLE) / CAST(2 * m AS DOUBLE))
             * (CAST(degree_sum AS DOUBLE) / CAST(2 * m AS DOUBLE))
           AS modularity_term
  FROM dnat LEFT JOIN intra USING (nation) CROSS JOIN m1
  ORDER BY nation
"""

# Degree assortativity: exact decimal edge-moment accumulation, one
# IEEE chain (sum_j == sum_k by both-orientation symmetry).
ORACLES["cosupply_degree_assortativity"] = """
  WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
  w AS (SELECT a.s AS s1, b.s AS s2, count(*) AS c
        FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s GROUP BY 1, 2),
  t AS (SELECT CAST(sum(c) AS DOUBLE) / count(*) * 1.1 AS thr FROM w),
  e AS MATERIALIZED (SELECT s1, s2 FROM w, t WHERE c >= thr),
  und AS (SELECT s1 AS src, s2 AS dst FROM e
          UNION ALL SELECT s2, s1 FROM e),
  deg AS (SELECT src AS n_, count(*) AS d FROM und GROUP BY 1),
  ed AS (SELECT dj.d AS j, dk.d AS k
         FROM und JOIN deg dj ON und.src = dj.n_
                  JOIN deg dk ON und.dst = dk.n_),
  agg AS (
    SELECT CAST(count(*) AS BIGINT) AS m_directed,
           CAST(sum(j) AS BIGINT) AS sum_j,
           CAST(sum(CAST(j AS DECIMAL(18,0)) * CAST(k AS DECIMAL(19,0)))
                AS DECIMAL(38,0)) AS sjk,
           CAST(sum(CAST(j AS DECIMAL(18,0)) * CAST(j AS DECIMAL(19,0)))
                AS DECIMAL(38,0)) AS sjj
    FROM ed)
  SELECT m_directed, sum_j,
         CAST(CAST(CAST(m_directed AS DECIMAL(8,0)) * CAST(sjk AS DECIMAL(30,0))
                   - CAST(sum_j AS DECIMAL(18,0)) * CAST(sum_j AS DECIMAL(19,0))
                   AS VARCHAR) AS DOUBLE)
           / CAST(CAST(CAST(m_directed AS DECIMAL(8,0)) * CAST(sjj AS DECIMAL(30,0))
                   - CAST(sum_j AS DECIMAL(18,0)) * CAST(sum_j AS DECIMAL(19,0))
                   AS VARCHAR) AS DOUBLE)
           AS assortativity
  FROM agg
"""

# Goh-Barabasi burstiness of same-type interarrival gaps per user:
# exact microsecond gaps, decimal moment accumulation, IEEE tail.
ORACLES["events_interarrival_burstiness"] = """
  WITH g AS (
    SELECT event_type,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id, event_type
             ORDER BY ts, event_id) AS gap
    FROM events),
  agg AS (
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(sum(gap) AS BIGINT) AS s,
           CAST(sum(CAST(gap AS DECIMAL(18,0)) * CAST(gap AS DECIMAL(19,0)))
                AS DECIMAL(38,0)) AS s2
    FROM g WHERE gap IS NOT NULL GROUP BY 1),
  f AS (
    SELECT event_type, n_gaps,
           CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_us,
           CAST(CAST(CAST(n_gaps AS DECIMAL(8,0)) * CAST(s2 AS DECIMAL(30,0))
                     - CAST(s AS DECIMAL(18,0)) * CAST(s AS DECIMAL(19,0))
                     AS VARCHAR) AS DOUBLE)
             / CAST(n_gaps * (n_gaps - 1) AS DOUBLE) AS var_gap_us
    FROM agg WHERE n_gaps >= 2)
  SELECT event_type, n_gaps, mean_gap_us, var_gap_us,
         sqrt(var_gap_us) / mean_gap_us AS cv,
         (sqrt(var_gap_us) - mean_gap_us) / (sqrt(var_gap_us) + mean_gap_us)
           AS burstiness
  FROM f ORDER BY event_type
"""

ORACLES["nation_rank_movers"] = """
  WITH yearly AS (
    SELECT n_name AS nation, year(o_orderdate) AS yr,
           sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
                    * 1000000 AS HUGEINT)) AS rev
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
    WHERE year(o_orderdate) IN (1995, 1996)
    GROUP BY 1, 2),
  ranked AS (
    SELECT nation, yr,
           CAST(row_number() OVER (PARTITION BY yr
                                   ORDER BY rev DESC, nation) AS BIGINT) AS rnk,
           CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS revd
    FROM yearly)
  SELECT a.nation, a.rnk AS rank_1995, b.rnk AS rank_1996,
         a.rnk - b.rnk AS rank_delta,
         a.revd AS rev_1995, b.revd AS rev_1996
  FROM ranked a JOIN ranked b ON a.nation = b.nation
  WHERE a.yr = 1995 AND b.yr = 1996
  ORDER BY rank_delta DESC, a.nation
"""

# Product-limit estimator at duration grain; ln factors rounded 9dp
# and summed as DECIMAL, curve shipped in log form.
ORACLES["user_survival_km"] = """
  WITH spans AS (SELECT user_id, CAST(min(ts) AS DATE) AS f,
                        CAST(max(ts) AS DATE) AS l
                 FROM events GROUP BY 1),
  edge AS (SELECT CAST(max(ts) AS DATE) AS e FROM events),
  subj AS (SELECT date_diff('day', f, l) AS duration,
                  (date_diff('day', l, e) < 7) AS censored
           FROM spans, edge),
  grain AS (SELECT duration,
                   CAST(sum(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT)
                     AS n_events,
                   CAST(sum(CASE WHEN censored THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_censored,
                   count(*) AS n_total
            FROM subj GROUP BY 1),
  km AS (
    SELECT duration, n_events, n_censored,
           sum(n_total) OVER (ORDER BY duration
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
    FROM grain),
  km2 AS (
    SELECT duration, n_risk, n_events, n_censored,
           CASE WHEN n_risk > n_events
                THEN CAST(round(ln(CAST(n_risk - n_events AS DOUBLE)
                                   / CAST(n_risk AS DOUBLE)), 9)
                          AS DECIMAL(20,9)) END AS term,
           max(CASE WHEN n_risk = n_events THEN 1 ELSE 0 END)
             OVER (ORDER BY duration
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) > 0
             AS survival_zero
    FROM km)
  SELECT CAST(duration AS BIGINT) AS duration,
         CAST(n_risk AS BIGINT) AS n_risk, n_events, n_censored,
         survival_zero,
         CASE WHEN NOT survival_zero
              THEN CAST(CAST(sum(term) OVER (ORDER BY duration
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS VARCHAR) AS DOUBLE) END AS log_survival
  FROM km2 ORDER BY duration
"""

# Nelson-Aalen: same lifetimes/grain CTEs as the KM oracle; each
# increment is one long/long division rounded 12dp into the decimal
# running sum (no transcendental anywhere).
ORACLES["user_hazard_na"] = """
  WITH spans AS (SELECT user_id, CAST(min(ts) AS DATE) AS f,
                        CAST(max(ts) AS DATE) AS l
                 FROM events GROUP BY 1),
  edge AS (SELECT CAST(max(ts) AS DATE) AS e FROM events),
  subj AS (SELECT date_diff('day', f, l) AS duration,
                  (date_diff('day', l, e) < 7) AS censored
           FROM spans, edge),
  grain AS (SELECT duration,
                   CAST(sum(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT)
                     AS n_events,
                   CAST(sum(CASE WHEN censored THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_censored,
                   count(*) AS n_total
            FROM subj GROUP BY 1),
  na AS (
    SELECT duration, n_events, n_censored,
           sum(n_total) OVER (ORDER BY duration
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
    FROM grain),
  na2 AS (
    SELECT duration, n_risk, n_events, n_censored,
           CAST(round(CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE), 12)
                AS DECIMAL(20,12)) AS term
    FROM na)
  SELECT CAST(duration AS BIGINT) AS duration,
         CAST(n_risk AS BIGINT) AS n_risk, n_events, n_censored,
         CAST(CAST(sum(term) OVER (ORDER BY duration
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS VARCHAR) AS DOUBLE) AS cum_hazard
  FROM na2 ORDER BY duration
"""

# Tie-aware average precision by the block convention: descending
# cumulatives INCLUDE the block; per-block term rounded 12dp into the
# order-independent decimal sum.
ORACLES["score_average_precision"] = """
  WITH per AS (
    SELECT n_chars AS s, count(*) AS n,
           sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos
    FROM documents GROUP BY 1),
  cum AS (
    SELECT s, n, pos,
           sum(n) OVER (ORDER BY s DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
           sum(pos) OVER (ORDER BY s DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
    FROM per),
  agg AS (
    SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(n) AS BIGINT) AS n_total,
           sum(CAST(round(CAST(pos AS DOUBLE)
                          * (CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE)), 12)
                    AS DECIMAL(27,12))) AS ts
    FROM cum)
  SELECT n_pos, n_total,
         CAST(CAST(ts AS VARCHAR) AS DOUBLE) / CAST(n_pos AS DOUBLE) AS ap
  FROM agg
"""

# Block-assigned gain/lift deciles: decile = integer division of the
# strictly-above count (ties never split); rates are fixed IEEE chains.
ORACLES["score_lift_deciles"] = """
  WITH per AS (
    SELECT n_chars AS s, count(*) AS n,
           sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos
    FROM documents GROUP BY 1),
  cum AS (
    SELECT s, n, pos,
           coalesce(sum(n) OVER (ORDER BY s DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above
    FROM per),
  tot AS (SELECT sum(n) AS tn, sum(pos) AS tp FROM per),
  dec AS (
    SELECT CAST(least(9, (10 * above) // tn) AS BIGINT) AS decile, n, pos
    FROM cum, tot),
  per_dec AS (
    SELECT decile, CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(sum(pos) AS BIGINT) AS n_pos
    FROM dec GROUP BY 1)
  SELECT decile, n_rows, n_pos,
         CAST(n_pos AS DOUBLE) / CAST(n_rows AS DOUBLE) AS resp_rate,
         (CAST(n_pos AS DOUBLE) / CAST(n_rows AS DOUBLE))
           / (CAST(tp AS DOUBLE) / CAST(tn AS DOUBLE)) AS lift,
         CAST(sum(n_pos) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           / CAST(tp AS DOUBLE) AS cum_capture
  FROM per_dec, tot ORDER BY decile
"""

# Chi-square keyness: every input an exact integer count; the
# statistic one fixed IEEE chain (same association order as Spark).
ORACLES["term_chi2_keywords"] = """
  WITH t AS ({TOKS}),
  tk AS (SELECT lang, unnest(toks) AS w FROM t),
  cnt AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS a
          FROM tk GROUP BY 1, 2),
  ltot AS (SELECT lang, CAST(sum(a) AS BIGINT) AS lt FROM cnt GROUP BY 1),
  wtot AS (SELECT w, CAST(sum(a) AS BIGINT) AS wt FROM cnt GROUP BY 1),
  ntot AS (SELECT CAST(sum(lt) AS BIGINT) AS nn FROM ltot),
  j AS (
    SELECT cnt.lang, cnt.w, a, lt, wt, nn,
           CAST(a AS DOUBLE) * CAST(nn - lt - (wt - a) AS DOUBLE)
             - CAST(wt - a AS DOUBLE) * CAST(lt - a AS DOUBLE) AS diff
    FROM cnt JOIN ltot USING (lang) JOIN wtot USING (w), ntot
    WHERE a >= 5),
  scored AS (
    SELECT lang, w, a,
           CAST(nn AS DOUBLE) * (diff * diff)
             / (CAST(wt AS DOUBLE) * CAST(nn - wt AS DOUBLE)
                * CAST(lt AS DOUBLE) * CAST(nn - lt AS DOUBLE)) AS chi2
    FROM j),
  ranked AS (
    SELECT lang, w, a, chi2,
           row_number() OVER (PARTITION BY lang
                              ORDER BY chi2 DESC, w ASC) AS rank
    FROM scored)
  SELECT lang, CAST(rank AS BIGINT) AS rank, w AS word,
         a AS n_in_lang, chi2
  FROM ranked WHERE rank <= 10 ORDER BY lang, rank
""".replace("{TOKS}", _SQL_TOKS)

# Jensen-Shannon: per-word contribution is one fixed IEEE chain
# (0.5*p*ln(p/m) with the zero branch guarded), rounded 12dp into the
# order-independent decimal sum.
ORACLES["lang_js_divergence"] = """
  WITH t AS ({TOKS}),
  tk AS (SELECT lang, unnest(toks) AS w FROM t),
  cnt AS (SELECT lang, w, count(*) AS c FROM tk GROUP BY 1, 2),
  tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
  p AS (SELECT cnt.lang, w, CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS p
        FROM cnt JOIN tot USING (lang)),
  langs AS (SELECT lang FROM tot),
  pairs AS (SELECT a.lang AS la, b.lang AS lb
            FROM langs a JOIN langs b ON a.lang < b.lang),
  pa AS (SELECT la, lb, w, p AS pa FROM p JOIN pairs ON p.lang = pairs.la),
  pb AS (SELECT la, lb, w, p AS pb FROM p JOIN pairs ON p.lang = pairs.lb),
  j AS (
    SELECT coalesce(pa.la, pb.la) AS la, coalesce(pa.lb, pb.lb) AS lb,
           coalesce(pa.pa, 0.0) AS pa, coalesce(pb.pb, 0.0) AS pb
    FROM pa FULL OUTER JOIN pb
      ON pa.la = pb.la AND pa.lb = pb.lb AND pa.w = pb.w),
  terms AS (
    SELECT la, lb,
           CAST(round(
             CASE WHEN pa > 0.0
                  THEN (0.5 * pa) * ln(pa / ((pa + pb) / 2.0))
                  ELSE 0.0 END
             + CASE WHEN pb > 0.0
                    THEN (0.5 * pb) * ln(pb / ((pa + pb) / 2.0))
                    ELSE 0.0 END, 12) AS DECIMAL(16,12)) AS term
    FROM j)
  SELECT la AS lang_a, lb AS lang_b, CAST(count(*) AS BIGINT) AS n_words,
         CAST(CAST(sum(term) AS VARCHAR) AS DOUBLE) AS jsd_nats
  FROM terms GROUP BY 1, 2 ORDER BY 1, 2
""".replace("{TOKS}", _SQL_TOKS)

# Cadence profile: lag gaps on the custkey total order; percentile
# selection at the (segment, distinct-gap) grain.
ORACLES["segment_order_gap_profile"] = """
  WITH g AS (
    SELECT o_custkey,
           CAST(date_diff('day',
                CAST(lag(o_orderdate) OVER w AS DATE),
                CAST(o_orderdate AS DATE)) AS BIGINT) AS gap
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC)),
  gg AS (
    SELECT c_mktsegment AS segment, gap, count(*) AS cnt
    FROM g JOIN customer ON o_custkey = c_custkey
    WHERE gap IS NOT NULL GROUP BY 1, 2),
  tot AS (SELECT segment, CAST(sum(cnt) AS BIGINT) AS n_gaps,
                 CAST(sum(gap * cnt) AS BIGINT) AS sg
          FROM gg GROUP BY 1),
  cum AS (SELECT segment, gap, cnt,
                 sum(cnt) OVER (PARTITION BY segment ORDER BY gap
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
          FROM gg),
  p50 AS (SELECT cum.segment, min(gap) AS median_gap_days
          FROM cum JOIN tot USING (segment)
          WHERE cm >= CAST(floor((n_gaps + 1) / 2.0) AS BIGINT)
          GROUP BY 1),
  p90 AS (SELECT cum.segment, min(gap) AS p90_gap_days
          FROM cum JOIN tot USING (segment)
          WHERE cm * 10 >= n_gaps * 9 GROUP BY 1)
  SELECT tot.segment, n_gaps,
         CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_days,
         median_gap_days, p90_gap_days
  FROM tot JOIN p50 USING (segment) JOIN p90 USING (segment)
  ORDER BY tot.segment
"""

# Quintile migration: integer 5*(rn-1) DIV n boundaries (no ntile,
# no float), rank by exact cents desc with custkey tie-break.
ORACLES["customer_value_migration"] = """
  WITH spend AS (
    SELECT o_custkey AS custkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                              AS HUGEINT)) AS VARCHAR) AS DOUBLE) AS cents
    FROM orders WHERE year(o_orderdate) IN (1995, 1996)
    GROUP BY 1, 2),
  r AS (
    SELECT custkey, yr,
           row_number() OVER (PARTITION BY yr
                              ORDER BY cents DESC, custkey) AS rn,
           count(*) OVER (PARTITION BY yr) AS n
    FROM spend),
  q AS (SELECT custkey, yr,
               CAST(least(4, 5 * (rn - 1) // n) AS BIGINT) AS q
        FROM r)
  SELECT a.q AS q_1995, b.q AS q_1996,
         CAST(count(*) AS BIGINT) AS n_customers
  FROM q a JOIN q b ON a.custkey = b.custkey
       AND a.yr = 1995 AND b.yr = 1996
  GROUP BY 1, 2 ORDER BY 1, 2
"""

# Cohort LTV triangle: exact integer cents, window cumsum at the
# (cohort, age) grain, one IEEE division per row.
ORACLES["customer_cohort_ltv"] = """
  WITH om AS (
    SELECT o_custkey,
           CAST((year(o_orderdate) * 12 + month(o_orderdate))
                - (1992 * 12 + 1) AS BIGINT) AS m,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             AS cents
    FROM orders),
  firsts AS (SELECT o_custkey, min(m) AS cohort FROM om GROUP BY 1),
  sizes AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
            FROM firsts GROUP BY 1),
  cells AS (
    SELECT cohort, om.m - cohort AS age_months,
           CAST(count(DISTINCT om.o_custkey) AS BIGINT) AS n_active,
           sum(CAST(cents AS HUGEINT)) AS rev
    FROM om JOIN firsts ON om.o_custkey = firsts.o_custkey
    GROUP BY 1, 2),
  cum AS (
    SELECT cohort, age_months, n_active, rev,
           sum(rev) OVER (PARTITION BY cohort ORDER BY age_months
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS crev
    FROM cells)
  SELECT cohort AS cohort_month, age_months, n_active, cohort_size,
         CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS rev_cents,
         CAST(CAST(crev AS VARCHAR) AS DOUBLE)
           / CAST(cohort_size AS DOUBLE) AS cum_ltv_cents_per_customer
  FROM cum JOIN sizes USING (cohort)
  ORDER BY cohort_month, age_months
"""

# Bounce profile: the events_sessionize epoch-floor gap convention;
# entry pick via rn = 1 on the session-keyed total order.
ORACLES["session_bounce_rate"] = """
  WITH g AS (
    SELECT user_id, ts, event_id, event_type,
           CAST(floor(epoch(ts)) AS BIGINT)
           - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) AS gap
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
  s AS (
    SELECT user_id, ts, event_id, event_type,
           sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS sid
    FROM g),
  e2 AS (
    SELECT user_id, sid, event_type,
           row_number() OVER (PARTITION BY user_id, sid
                              ORDER BY ts, event_id) AS rn,
           count(*) OVER (PARTITION BY user_id, sid) AS n
    FROM s),
  sess AS (SELECT user_id, sid, event_type AS entry_type,
                  CAST(n AS BIGINT) AS n
           FROM e2 WHERE rn = 1)
  SELECT entry_type, CAST(count(*) AS BIGINT) AS n_sessions,
         CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bounces,
         CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS bounce_rate,
         CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           AS mean_events_per_session
  FROM sess GROUP BY 1 ORDER BY 1
"""

# Delay profile: integer-rank percentile selection (the MAD oracle
# convention), exact integer day sums for the mean.
ORACLES["shipping_delay_profile"] = """
  WITH d AS (
    SELECT CAST((year(o_orderdate) * 12 + month(o_orderdate))
                - (1992 * 12 + 1) AS BIGINT) AS month,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          CAST(l_shipdate AS DATE)) AS BIGINT) AS dd,
           count(*) AS cnt
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2),
  tot AS (SELECT month, CAST(sum(cnt) AS BIGINT) AS n_items,
                 CAST(sum(dd * cnt) AS BIGINT) AS sdd
          FROM d GROUP BY 1),
  cum AS (SELECT month, dd, cnt,
                 sum(cnt) OVER (PARTITION BY month ORDER BY dd
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
          FROM d),
  p50 AS (SELECT cum.month, min(dd) AS p50_delay_days
          FROM cum JOIN tot USING (month)
          WHERE cm >= CAST(floor((n_items + 1) / 2.0) AS BIGINT)
          GROUP BY 1),
  p90 AS (SELECT cum.month, min(dd) AS p90_delay_days
          FROM cum JOIN tot USING (month)
          WHERE cm * 10 >= n_items * 9 GROUP BY 1)
  SELECT tot.month, n_items,
         CAST(sdd AS DOUBLE) / CAST(n_items AS DOUBLE)
           AS mean_delay_days,
         p50_delay_days, p90_delay_days
  FROM tot JOIN p50 USING (month) JOIN p90 USING (month)
  ORDER BY tot.month
"""

# Unbiased Simpson: exact-integer c(c-1) sums (HUGEINT twin), one
# final IEEE division chain, no rounding convention needed.
ORACLES["lang_simpson_diversity"] = """
  WITH t AS ({TOKS}),
  tk AS (SELECT lang, unnest(toks) AS w FROM t),
  cnt AS (SELECT lang, w, count(*) AS c FROM tk GROUP BY 1, 2),
  g AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS vocab,
               sum(CAST(c AS HUGEINT) * CAST(c - 1 AS HUGEINT)) AS s2
        FROM cnt GROUP BY 1)
  SELECT lang, n_tokens, vocab,
         CASE WHEN n_tokens > 1
              THEN CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
                   / (CAST(n_tokens AS DOUBLE)
                      * CAST(n_tokens - 1 AS DOUBLE)) END AS simpson,
         CASE WHEN n_tokens > 1 AND s2 > 0
              THEN CAST(1.0 AS DOUBLE)
                   / (CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
                      / (CAST(n_tokens AS DOUBLE)
                         * CAST(n_tokens - 1 AS DOUBLE))) END
           AS inv_simpson
  FROM g ORDER BY lang
""".replace("{TOKS}", _SQL_TOKS)

# HHI/CR4: exact micro squares as HUGEINT; the only IEEE work is the
# final fixed division chains; CR4 pick by deterministic window rank.
ORACLES["brand_revenue_hhi"] = """
  WITH nb AS (
    SELECT n_name AS nation, p_brand AS brand,
           sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
                    * 1000000 AS HUGEINT)) AS rev
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         JOIN part ON l_partkey = p_partkey
         JOIN nation ON s_nationkey = n_nationkey
    GROUP BY 1, 2),
  ranked AS (
    SELECT nation, brand, rev,
           row_number() OVER (PARTITION BY nation
                              ORDER BY rev DESC, brand ASC) AS rk
    FROM nb),
  g AS (
    SELECT nation, CAST(count(*) AS BIGINT) AS n_brands,
           sum(rev) AS s1, sum(rev * rev) AS s2,
           sum(CASE WHEN rk <= 4 THEN rev ELSE 0 END) AS t4
    FROM ranked GROUP BY 1)
  SELECT nation, n_brands,
         CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
           / (CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
              * CAST(CAST(s1 AS VARCHAR) AS DOUBLE)) AS hhi,
         CAST(CAST(t4 AS VARCHAR) AS DOUBLE)
           / CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS cr4
  FROM g ORDER BY nation
"""

# Gaps-and-islands on the type axis: lag boundary + running count.
ORACLES["events_run_length"] = """
  WITH b AS (
    SELECT user_id, event_type,
           CASE WHEN lag(event_type) OVER w IS NULL
                  OR lag(event_type) OVER w <> event_type
                THEN 1 ELSE 0 END AS bnd,
           ts, event_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
  r AS (
    SELECT user_id, event_type,
           sum(bnd) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
    FROM b),
  runs AS (SELECT user_id, run, event_type,
                  CAST(count(*) AS BIGINT) AS len
           FROM r GROUP BY 1, 2, 3)
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_runs,
         max(len) AS longest_run,
         CAST(sum(len) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           AS mean_run_len
  FROM runs GROUP BY 1 ORDER BY 1
"""

# EWMA: recursive CTE stepping the identical exact-integer-micros
# arithmetic (alpha = 0.5 exact binary; tie rounding probed equal).
ORACLES["events_ewma_control"] = """
  WITH RECURSIVE daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(CAST(CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6)))
                          AS DECIMAL(20,6))
                     * CAST(1000000 AS DECIMAL(7,0)) AS BIGINT)
                AS DOUBLE) AS x
    FROM events GROUP BY 1, 2),
  series AS (
    SELECT event_type, day, x,
           row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
    FROM daily),
  dcount AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
             FROM daily GROUP BY 1),
  rec AS (
    SELECT event_type, CAST(1 AS BIGINT) AS i, x AS z,
           CAST(0.0 AS DOUBLE) AS md
    FROM series WHERE i = 1
    UNION ALL
    SELECT rec.event_type, rec.i + 1,
           round(CAST(0.5 AS DOUBLE) * s.x
                 + CAST(0.5 AS DOUBLE) * rec.z, 0) AS z,
           greatest(rec.md, abs(s.x - rec.z)) AS md
    FROM rec JOIN series s
      ON s.event_type = rec.event_type AND s.i = rec.i + 1),
  last AS (SELECT event_type, max(i) AS mi FROM rec GROUP BY 1)
  SELECT rec.event_type, n_days, z AS ewma_last_micros,
         md AS max_abs_dev_micros
  FROM rec JOIN last ON rec.event_type = last.event_type
                    AND rec.i = last.mi
       JOIN dcount ON dcount.event_type = rec.event_type
  ORDER BY rec.event_type
"""


def _sorted_neighborhood_oracle(window: int = 10) -> str:
    """Oracle for q_linkage_sorted_neighborhood: reuses the m/c
    record CTEs of _linkage_ctes (its blocked-pair CTEs go unused)
    and mirrors the global rank + banded neighborhood + FS scoring.
    Weight literals generated from fs_weights (never drift)."""
    from .operators.linkage import fs_weights

    w = fs_weights()
    score = " + ".join(
        f"CASE WHEN {f}_agree THEN CAST({wa!r} AS DOUBLE) "
        f"ELSE CAST({wd!r} AS DOUBLE) END"
        for f, (wa, wd) in w.items()
    )
    return (
        _linkage_ctes()
        + f""",
  u AS (
    SELECT 0 AS role, custkey AS rid, nm, bal, seg, blk FROM m
    UNION ALL
    SELECT 1, contact_id, nm, bal, seg, CAST(floor(bal) AS BIGINT)
    FROM c),
  r AS (SELECT role, rid, nm, bal, seg, blk,
               row_number() OVER (ORDER BY bal, role, rid) AS rn
        FROM u),
  pr AS (
    SELECT a.rid AS custkey, b.rid AS contact_id,
           abs(a.rn - b.rn) AS rank_gap,
           a.blk <> b.blk AS cross_block,
           a.nm = b.nm AS nm_agree,
           a.bal = b.bal AS bal_agree,
           a.seg = b.seg AS seg_agree
    FROM r a JOIN r b
      ON a.role = 0 AND b.role = 1 AND abs(a.rn - b.rn) <= {window}),
  sn AS (SELECT custkey, contact_id, rank_gap, cross_block,
                nm_agree, bal_agree, seg_agree, ({score}) AS score
         FROM pr)
  SELECT custkey, contact_id, CAST(rank_gap AS BIGINT) AS rank_gap,
         cross_block, nm_agree, bal_agree, seg_agree, score,
         score > 0.0 AS is_match
  FROM sn ORDER BY (score > 0.0 AND cross_block) DESC, score DESC,
                   custkey, contact_id
  LIMIT 100"""
    )


ORACLES["linkage_sorted_neighborhood"] = _sorted_neighborhood_oracle()

# Holt smoothing as a recursive CTE stepping the identical exact
# arithmetic (0.5 multiplies of thousand-micros-rounded states --
# every intermediate an exact-integer double; both engines round
# half-away-from-zero at negative digits, probed 2026-08-16).
ORACLES["nation_revenue_holt"] = """
  WITH RECURSIVE monthly AS (
    SELECT n_name AS nation,
           CAST((year(o_orderdate) * 12 + month(o_orderdate))
                - (1992 * 12 + 1) AS BIGINT) AS x,
           CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
                    * 1000000 AS HUGEINT)) AS VARCHAR) AS DOUBLE) AS yd
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1, 2),
  series AS (
    SELECT nation, x, yd,
           row_number() OVER (PARTITION BY nation ORDER BY x) AS i
    FROM monthly),
  mcount AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_months
             FROM monthly GROUP BY 1),
  rec AS (
    SELECT s2.nation, CAST(2 AS BIGINT) AS i, s2.yd AS l,
           s2.yd - s1.yd AS b
    FROM series s1 JOIN series s2
      ON s1.nation = s2.nation AND s1.i = 1 AND s2.i = 2
    UNION ALL
    SELECT rec.nation, rec.i + 1,
           round(CAST(0.5 AS DOUBLE) * s.yd
                 + CAST(0.5 AS DOUBLE) * (rec.l + rec.b), -3) AS l,
           round(CAST(0.5 AS DOUBLE)
                 * (round(CAST(0.5 AS DOUBLE) * s.yd
                          + CAST(0.5 AS DOUBLE) * (rec.l + rec.b), -3)
                    - rec.l)
                 + CAST(0.5 AS DOUBLE) * rec.b, -3) AS b
    FROM rec JOIN series s
      ON s.nation = rec.nation AND s.i = rec.i + 1),
  last AS (SELECT nation, max(i) AS mi FROM rec GROUP BY 1)
  SELECT rec.nation, n_months, l AS level, b AS trend,
         l + b AS forecast_next
  FROM rec JOIN last ON rec.nation = last.nation AND rec.i = last.mi
       JOIN mcount ON mcount.nation = rec.nation
  ORDER BY rec.nation
"""


def _markov_removal_sql(channels: tuple[str, ...], steps: int = 8) -> str:
    """Generated oracle for q_attribution_markov_removal: the shared
    transition/pi CTEs, one unrolled value-iteration chain for the
    base matrix and one per removed channel (edges INTO the channel
    filtered out), then the effect/share arithmetic on exact
    decimals. The channel universe is the generator's fixed
    event-type set (verified identical at all three SFs); the Spark
    side derives it from the data."""
    head = """WITH nxt AS (
    SELECT event_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events),
  c AS (SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS nn
        FROM nxt WHERE next_type IS NOT NULL GROUP BY 1, 2),
  tot AS (SELECT event_type, CAST(sum(nn) AS BIGINT) AS t
          FROM c GROUP BY 1),
  tr AS (SELECT c.event_type AS s, next_type AS t2, nn / t AS T
         FROM c JOIN tot ON c.event_type = tot.event_type),
  st AS (SELECT s AS node FROM tr UNION SELECT t2 FROM tr),
  fe AS (SELECT user_id, event_type,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS rn
         FROM events),
  pi0 AS (SELECT event_type AS node, CAST(count(*) AS BIGINT) AS cu
          FROM fe WHERE rn = 1 GROUP BY 1),
  ut AS (SELECT CAST(sum(cu) AS BIGINT) AS u FROM pi0),
  pi AS (SELECT node, cu / u AS pi FROM pi0, ut)"""

    def chain(prefix: str, tr_filter: str) -> list[str]:
        parts = [f"""{prefix}p0 AS (
    SELECT node, CASE WHEN node = 'purchase' THEN CAST(1.0 AS DOUBLE)
                      ELSE CAST(0.0 AS DOUBLE) END AS p
    FROM st)"""]
        for k in range(1, steps + 1):
            parts.append(f"""{prefix}p{k} AS (
    SELECT st.node,
           CASE WHEN st.node = 'purchase' THEN CAST(1.0 AS DOUBLE)
                ELSE coalesce(x.sm, CAST(0.0 AS DOUBLE)) END AS p
    FROM st LEFT JOIN (
      SELECT s AS node,
             CAST(CAST(sum(CAST(round(T * p, 12) AS DECIMAL(24,12)))
                       AS VARCHAR) AS DOUBLE) AS sm
      FROM tr JOIN {prefix}p{k - 1} ON tr.t2 = {prefix}p{k - 1}.node
      {tr_filter} GROUP BY 1) x
    USING (node))""")
        return parts

    parts = [head]
    parts.extend(chain("b", ""))
    parts.append(f"""bval AS (
    SELECT CAST(CAST(sum(CAST(round(pi * p, 12) AS DECIMAL(24,12)))
                     AS VARCHAR) AS DOUBLE) AS v
    FROM pi JOIN bp{steps} USING (node))""")
    for i, ch in enumerate(channels):
        parts.extend(chain(f"r{i}", f"WHERE tr.t2 <> '{ch}'"))
        parts.append(f"""r{i}val AS (
    SELECT CAST(CAST(sum(CAST(round(pi * p, 12) AS DECIMAL(24,12)))
                     AS VARCHAR) AS DOUBLE) AS v
    FROM pi JOIN r{i}p{steps} USING (node)
    WHERE pi.node <> '{ch}')""")
    union = "\n    UNION ALL ".join(
        f"SELECT '{ch}' AS channel, bval.v AS p_base, r{i}val.v AS p_removed"
        f" FROM bval, r{i}val"
        for i, ch in enumerate(channels)
    )
    parts.append(f"""eff AS (
    SELECT channel, p_base, p_removed,
           CAST(round(CAST(1 AS DOUBLE) - p_removed / p_base, 12)
                AS DECIMAL(24,12)) AS e
    FROM ({union}))""")
    parts.append("""te AS (SELECT sum(e) AS t FROM eff)""")
    return (
        ",\n  ".join(parts)
        + """
  SELECT channel, p_base, p_removed,
         CAST(CAST(e AS VARCHAR) AS DOUBLE) AS removal_effect,
         CASE WHEN t <> 0 THEN CAST(CAST(e AS VARCHAR) AS DOUBLE)
              / CAST(CAST(t AS VARCHAR) AS DOUBLE) END
           AS attribution_share
  FROM eff, te ORDER BY channel"""
    )


ORACLES["attribution_markov_removal"] = _markov_removal_sql(
    MARKOV_ORACLE_CHANNELS
)

# Information gain: every entropy term from exact integer counts,
# 9dp-rounded into order-independent decimal sums.
ORACLES["feature_information_gain"] = """
  WITH f AS (
    SELECT 'has_digit' AS feature,
           CASE WHEN regexp_matches(text, '[0-9]') THEN 'y' ELSE 'n' END AS val,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
    FROM documents
    UNION ALL
    SELECT 'len_bucket', CAST(least(9, n_chars // 200) AS VARCHAR),
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END
    FROM documents
    UNION ALL
    SELECT 'source', source, CASE WHEN lang = 'en' THEN 1 ELSE 0 END
    FROM documents),
  cells AS (SELECT feature, val, y, CAST(count(*) AS BIGINT) AS nxy
            FROM f GROUP BY 1, 2, 3),
  nx AS (SELECT feature, val, CAST(sum(nxy) AS BIGINT) AS nx
         FROM cells GROUP BY 1, 2),
  nf AS (SELECT feature, CAST(sum(nxy) AS BIGINT) AS n
         FROM cells GROUP BY 1),
  hyx AS (
    SELECT cells.feature,
           sum(CAST(round(
             -(CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE))
               * ln(CAST(nxy AS DOUBLE) / CAST(nx AS DOUBLE)), 9)
             AS DECIMAL(12,9))) AS s
    FROM cells JOIN nx USING (feature, val) JOIN nf USING (feature)
    GROUP BY 1),
  lab AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                 CAST(count(*) AS BIGINT) AS ny
          FROM documents GROUP BY 1),
  nt AS (SELECT CAST(sum(ny) AS BIGINT) AS n FROM lab),
  hy AS (
    SELECT sum(CAST(round(
             -(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE))
               * ln(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE)), 9)
             AS DECIMAL(12,9))) AS s
    FROM lab, nt)
  SELECT feature,
         CAST(CAST(hy.s AS VARCHAR) AS DOUBLE) AS h_y,
         CAST(CAST(hyx.s AS VARCHAR) AS DOUBLE) AS h_y_given_x,
         CAST(CAST(hy.s AS VARCHAR) AS DOUBLE)
           - CAST(CAST(hyx.s AS VARCHAR) AS DOUBLE) AS ig_nats
  FROM hyx, hy ORDER BY feature
"""

# Dunning G2 keyness: four O ln(O/E) terms each 9dp-rounded to
# DECIMAL, summed exactly; the per-lang ranking happens ON the exact
# decimal so the order is ulp-identical cross-engine.
ORACLES["term_keyness_g2"] = """
  WITH t AS ({TOKS}),
  tk AS (SELECT lang, unnest(toks) AS w FROM t),
  cnt AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS a
          FROM tk GROUP BY 1, 2),
  ltot AS (SELECT lang, CAST(sum(a) AS BIGINT) AS lt FROM cnt GROUP BY 1),
  wtot AS (SELECT w, CAST(sum(a) AS BIGINT) AS wt FROM cnt GROUP BY 1),
  ntot AS (SELECT CAST(sum(lt) AS BIGINT) AS nn FROM ltot),
  j AS (
    SELECT cnt.lang, cnt.w, a, lt, wt, nn,
           wt - a AS b, lt - a AS c, nn - lt - (wt - a) AS d
    FROM cnt JOIN ltot USING (lang) JOIN wtot USING (w), ntot
    WHERE a >= 5),
  g AS (
    SELECT lang, w, a,
           CAST(CASE WHEN a > 0 THEN round(
               2.0 * CAST(a AS DOUBLE)
               * ln(CAST(a AS DOUBLE)
                    / ((CAST(lt AS DOUBLE) * CAST(wt AS DOUBLE))
                       / CAST(nn AS DOUBLE))), 9)
             ELSE 0.0 END AS DECIMAL(20,9))
           + CAST(CASE WHEN b > 0 THEN round(
               2.0 * CAST(b AS DOUBLE)
               * ln(CAST(b AS DOUBLE)
                    / ((CAST(nn - lt AS DOUBLE) * CAST(wt AS DOUBLE))
                       / CAST(nn AS DOUBLE))), 9)
             ELSE 0.0 END AS DECIMAL(20,9))
           + CAST(CASE WHEN c > 0 THEN round(
               2.0 * CAST(c AS DOUBLE)
               * ln(CAST(c AS DOUBLE)
                    / ((CAST(lt AS DOUBLE) * CAST(nn - wt AS DOUBLE))
                       / CAST(nn AS DOUBLE))), 9)
             ELSE 0.0 END AS DECIMAL(20,9))
           + CAST(CASE WHEN d > 0 THEN round(
               2.0 * CAST(d AS DOUBLE)
               * ln(CAST(d AS DOUBLE)
                    / ((CAST(nn - lt AS DOUBLE) * CAST(nn - wt AS DOUBLE))
                       / CAST(nn AS DOUBLE))), 9)
             ELSE 0.0 END AS DECIMAL(20,9)) AS g2d
    FROM j),
  ranked AS (
    SELECT lang, w, a, g2d,
           row_number() OVER (PARTITION BY lang
                              ORDER BY g2d DESC, w ASC) AS rank
    FROM g)
  SELECT lang, CAST(rank AS BIGINT) AS rank, w AS word,
         a AS n_in_lang, CAST(CAST(g2d AS VARCHAR) AS DOUBLE) AS g2
  FROM ranked WHERE rank <= 10 ORDER BY lang, rank
""".replace("{TOKS}", _SQL_TOKS)

# Theil-Sen: same monthly-micros series as the OLS trend oracle; the
# median pair slope by lower-median integer-rank selection.
ORACLES["nation_theilsen_trend"] = """
  WITH monthly AS (
    SELECT n_name AS nation,
           CAST((year(o_orderdate) * 12 + month(o_orderdate))
                - (1992 * 12 + 1) AS BIGINT) AS x,
           sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
                    * 1000000 AS HUGEINT)) AS y
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1, 2),
  slopes AS (
    SELECT a.nation,
           CAST(CAST(b.y - a.y AS VARCHAR) AS DOUBLE)
             / CAST(b.x - a.x AS DOUBLE) AS slope
    FROM monthly a JOIN monthly b
      ON a.nation = b.nation AND a.x < b.x),
  sc AS (SELECT nation, slope, count(*) AS cnt FROM slopes GROUP BY 1, 2),
  tot AS (SELECT nation, CAST(sum(cnt) AS BIGINT) AS np FROM sc GROUP BY 1),
  cum AS (SELECT nation, slope, cnt,
                 sum(cnt) OVER (PARTITION BY nation ORDER BY slope
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
          FROM sc),
  med AS (SELECT cum.nation, min(slope) AS theil_sen_slope
          FROM cum JOIN tot USING (nation)
          WHERE cm >= CAST(floor((np + 1) / 2.0) AS BIGINT) GROUP BY 1),
  months AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_months
             FROM monthly GROUP BY 1)
  SELECT months.nation, n_months, np AS n_pairs, theil_sen_slope
  FROM months JOIN tot USING (nation) JOIN med USING (nation)
  ORDER BY 1
"""

# Mean-cleared integer ACF: z = n*y - S makes both sums exact
# integers; the n^2 scale factor cancels in the ratio.
ORACLES["events_acf"] = """
  WITH b AS (SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
             FROM events),
  days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                    AS day, d0
           FROM b),
  types AS (SELECT DISTINCT event_type FROM events),
  counts AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
             FROM events GROUP BY 1, 2),
  series AS (
    SELECT t.event_type, date_diff('day', d.d0, d.day) AS tt,
           coalesce(c.y, 0) AS y
    FROM types t CROSS JOIN days d
         LEFT JOIN counts c ON c.event_type = t.event_type AND c.day = d.day),
  st AS (SELECT event_type, count(*) AS n, sum(y) AS s FROM series GROUP BY 1),
  z AS (SELECT series.event_type, tt,
               CAST(st.n * series.y - st.s AS HUGEINT) AS z, st.n
        FROM series JOIN st USING (event_type)),
  den AS (SELECT event_type, sum(z * z) AS den, max(n) AS n_points
          FROM z GROUP BY 1),
  lagged AS (SELECT event_type, tt, z, l.lag
             FROM z CROSS JOIN
                  (SELECT unnest(generate_series(1, 7)) AS lag) l),
  num AS (SELECT a.event_type, a.lag, sum(a.z * b2.z) AS num
          FROM lagged a JOIN z b2 ON b2.event_type = a.event_type
                                 AND b2.tt = a.tt + a.lag
          GROUP BY 1, 2)
  SELECT n.event_type, CAST(n.lag AS BIGINT) AS lag,
         CAST(d.n_points AS BIGINT) AS n_points,
         CAST(CAST(n.num AS VARCHAR) AS DOUBLE)
           / CAST(CAST(d.den AS VARCHAR) AS DOUBLE) AS acf
  FROM num n JOIN den d USING (event_type)
  WHERE d.den <> 0 ORDER BY event_type, lag
"""

# HUGEINT mirror of the exact-integer OLS sufficient statistics; the
# final divisions run on string-routed identical doubles.
ORACLES["nation_revenue_trend"] = """
  WITH monthly AS (
    SELECT n_name AS nation,
           CAST((year(o_orderdate) * 12 + month(o_orderdate))
                - (1992 * 12 + 1) AS BIGINT) AS x,
           sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
                    * 1000000 AS HUGEINT)) AS y
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1, 2),
  stats AS (
    SELECT nation, count(*) AS n,
           sum(CAST(x AS HUGEINT)) AS sx, sum(y) AS sy,
           sum(CAST(x AS HUGEINT) * y) AS sxy,
           sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
           sum(y * y) AS syy
    FROM monthly GROUP BY 1),
  vals AS (
    SELECT nation, CAST(n AS BIGINT) AS n_points,
           CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS num,
           CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS den,
           CAST(CAST(sy * sxx - sx * sxy AS VARCHAR) AS DOUBLE) AS inum,
           CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS ydev
    FROM stats)
  SELECT nation, n_points, num / den AS slope, inum / den AS intercept,
         CASE WHEN ydev <> 0 THEN num * num / (den * ydev) END AS r2
  FROM vals WHERE den <> 0 ORDER BY nation
"""

ORACLES["zipf_word_fit"] = f"""
  WITH wc AS ({_SQL_WORDCOUNT}),
  top AS (SELECT word, cnt FROM wc ORDER BY cnt DESC, word LIMIT 500),
  pts AS (
    SELECT CAST(round(ln(CAST(row_number() OVER (ORDER BY cnt DESC, word)
                              AS DOUBLE)), 9) AS DECIMAL(12,9)) AS lx,
           CAST(round(ln(CAST(cnt AS DOUBLE)), 9) AS DECIMAL(12,9)) AS ly
    FROM top),
  agg AS (
    SELECT CAST(count(*) AS BIGINT) AS n_words,
           CAST(CAST(sum(lx) AS VARCHAR) AS DOUBLE) AS sx,
           CAST(CAST(sum(ly) AS VARCHAR) AS DOUBLE) AS sy,
           CAST(CAST(sum(lx * ly) AS VARCHAR) AS DOUBLE) AS sxy,
           CAST(CAST(sum(lx * lx) AS VARCHAR) AS DOUBLE) AS sxx,
           CAST(CAST(sum(ly * ly) AS VARCHAR) AS DOUBLE) AS syy
    FROM pts)
  SELECT n_words,
         (n_words * sxy - sx * sy) / (n_words * sxx - sx * sx) AS slope,
         (sy * sxx - sx * sxy) / (n_words * sxx - sx * sx) AS intercept,
         (n_words * sxy - sx * sy) * (n_words * sxy - sx * sy)
           / ((n_words * sxx - sx * sx) * (n_words * syy - sy * sy)) AS r2
  FROM agg
"""

# Quadratic NOT-EXISTS dominance -- the oracle's simplicity is the
# point: it proves the distributed grid-prune/staircase forms lossless.
ORACLES["customer_skyline"] = """
  WITH agg AS (
    SELECT o_custkey AS custkey,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS spend_cents,
           count(*) AS n_orders,
           CAST(date_diff('day', DATE '1970-01-01',
                          CAST(max(o_orderdate) AS DATE)) AS BIGINT) AS last_day
    FROM orders GROUP BY 1)
  SELECT p.* FROM agg p
  WHERE NOT EXISTS (
    SELECT 1 FROM agg q
    WHERE q.spend_cents >= p.spend_cents AND q.n_orders >= p.n_orders
      AND q.last_day >= p.last_day
      AND (q.spend_cents > p.spend_cents OR q.n_orders > p.n_orders
           OR q.last_day > p.last_day))
  ORDER BY spend_cents DESC, custkey
"""

ORACLES["part_sales_skyline"] = """
  WITH agg AS (
    SELECT l_partkey AS partkey,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,0))) AS BIGINT) AS total_qty,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem GROUP BY 1)
  SELECT p.* FROM agg p
  WHERE NOT EXISTS (
    SELECT 1 FROM agg q
    WHERE q.total_qty >= p.total_qty AND q.revenue_cents >= p.revenue_cents
      AND (q.total_qty > p.total_qty OR q.revenue_cents > p.revenue_cents))
  ORDER BY total_qty DESC, partkey
"""

# Weighted median: SELECTION by exact integer-cent comparisons --
# the picked quantity is a value present in the data, so neither
# engine interpolates. DuckDB's HUGEINT window sums cast back to
# BIGINT to match Spark's long.
ORACLES["brand_weighted_median"] = """
  WITH j AS (
    SELECT p_brand,
           CAST(CAST(l_quantity AS DECIMAL(12,2)) AS BIGINT) AS qty,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                AS BIGINT) AS cents
    FROM lineitem JOIN part ON l_partkey = p_partkey),
  grain AS (
    SELECT p_brand, qty, CAST(sum(cents) AS BIGINT) AS w
    FROM j GROUP BY 1, 2),
  cum AS (
    SELECT p_brand, qty, w,
           sum(w) OVER (PARTITION BY p_brand ORDER BY qty
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
           sum(w) OVER (PARTITION BY p_brand) AS tw
    FROM grain)
  SELECT p_brand, CAST(min(qty) AS BIGINT) AS weighted_median,
         CAST(max(tw) AS BIGINT) AS total_weight
  FROM cum WHERE tw > 0 AND 2 * cw >= tw
  GROUP BY 1 ORDER BY 1
"""

# Chi-square cells: (o*n - r*c)^2 / (r*c*n) on exact integers,
# HUGEINT here / DECIMAL(38,0) in Spark, string-routed to double on
# both sides before the one square-and-divide; terms 9dp-decimal
# summed exactly, string-routed out.
ORACLES["segment_nation_chisq"] = """
  WITH cells AS (
    SELECT c_mktsegment AS r_cat, n_name AS c_cat,
           count(*) AS o
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1, 2),
  tot AS (
    SELECT r_cat, c_cat, o,
           CAST(sum(o) OVER (PARTITION BY r_cat) AS HUGEINT) AS r,
           CAST(sum(o) OVER (PARTITION BY c_cat) AS HUGEINT) AS c,
           CAST(sum(o) OVER () AS HUGEINT) AS n
    FROM cells),
  dims AS (
    SELECT CAST(count(DISTINCT r_cat) AS BIGINT) AS nr,
           CAST(count(DISTINCT c_cat) AS BIGINT) AS nc
    FROM cells),
  scored AS (
    SELECT r_cat, c_cat, o, r, c, n, nr, nc,
           CAST(CAST(CAST(o AS HUGEINT) * n - r * c AS VARCHAR)
                AS DOUBLE) AS numd,
           CAST(CAST(r * c * n AS VARCHAR) AS DOUBLE) AS dend,
           CAST(CAST(r * c AS VARCHAR) AS DOUBLE) AS rcd
    FROM tot CROSS JOIN dims),
  t9 AS (
    SELECT r_cat, c_cat, o, nr, nc,
           rcd / CAST(n AS DOUBLE) AS expected,
           CAST(round(numd * numd / dend, 9) AS DECIMAL(20,9)) AS term9
    FROM scored)
  SELECT r_cat AS c_mktsegment, c_cat AS n_name,
         CAST(o AS BIGINT) AS observed, expected,
         CAST(CAST(term9 AS VARCHAR) AS DOUBLE) AS term,
         CAST(CAST(sum(term9) OVER () AS VARCHAR) AS DOUBLE) AS chi2,
         CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof
  FROM t9 ORDER BY 1, 2
"""

# Benford: digit by string head; the transcendental benford_p frozen
# at 9dp as DECIMAL(10,9) BEFORE expected = n*p (exact decimal
# product, string-routed), so both engines square/divide identical
# doubles; 9dp-decimal terms summed exactly into chi2.
ORACLES["orders_benford"] = """
  WITH c AS (
    SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                AS BIGINT) AS cents
    FROM orders),
  d AS (
    SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
           count(*) AS o
    FROM c GROUP BY 1),
  spine AS (SELECT CAST(range AS BIGINT) AS digit FROM range(1, 10)),
  f AS (
    SELECT s.digit, CAST(COALESCE(o, 0) AS BIGINT) AS observed
    FROM spine s LEFT JOIN d USING (digit)),
  t AS (
    SELECT digit, observed,
           CAST(sum(observed) OVER () AS BIGINT) AS total_n,
           CAST(round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 9)
                AS DECIMAL(10,9)) AS p9
    FROM f),
  s2 AS (
    SELECT digit, observed, total_n, p9,
           CAST(CAST(CAST(CAST(total_n AS DECIMAL(19,0)) * p9
                          AS DECIMAL(30,9)) AS VARCHAR) AS DOUBLE) AS e
    FROM t),
  s3 AS (
    SELECT *, CAST(round((CAST(observed AS DOUBLE) - e)
                         * (CAST(observed AS DOUBLE) - e) / e, 9)
                   AS DECIMAL(20,9)) AS term9
    FROM s2)
  SELECT digit, observed, total_n,
         CAST(observed AS DOUBLE) / CAST(total_n AS DOUBLE)
           AS observed_share,
         CAST(CAST(p9 AS VARCHAR) AS DOUBLE) AS benford_p,
         e AS expected,
         CAST(CAST(term9 AS VARCHAR) AS DOUBLE) AS term,
         CAST(CAST(sum(term9) OVER () AS VARCHAR) AS DOUBLE) AS chi2
  FROM s3 ORDER BY digit
"""

# Lorenz deciles: exact integer cents, integer decile boundaries
# ((rn-1)*10 // n), shares divide exact longs.
ORACLES["customer_spend_lorenz"] = """
  WITH spend AS (
    SELECT o_custkey AS custkey,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY 1),
  ranked AS (
    SELECT custkey, cents,
           row_number() OVER (ORDER BY cents, custkey) AS rn,
           count(*) OVER () AS n
    FROM spend),
  per AS (
    SELECT CAST(((rn - 1) * 10) // n AS BIGINT) AS decile,
           count(*) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS cents
    FROM ranked GROUP BY 1)
  SELECT decile, n_customers, cents,
         CAST(cents AS DOUBLE)
           / CAST(CAST(sum(cents) OVER () AS BIGINT) AS DOUBLE)
           AS share_of_total,
         CAST(CAST(sum(cents) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS DOUBLE)
           / CAST(CAST(sum(cents) OVER () AS BIGINT) AS DOUBLE)
           AS cum_share
  FROM per ORDER BY decile
"""

# Trimmed mean: integer rank boundaries (k = n*5 div 100), clamp
# arithmetic on exact cumulative counts, two final long/long
# divisions -- no interpolation.
ORACLES["events_trimmed_mean"] = """
  WITH grain AS (
    SELECT event_type AS g,
           CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
           count(*) AS cnt
    FROM events GROUP BY 1, 2),
  cum AS (
    SELECT g, v, cnt,
           CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum,
           CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
    FROM grain),
  k AS (
    SELECT *, (n * 5) // 100 AS k FROM cum),
  kept AS (
    SELECT g, v, cnt, n, k,
           greatest(CAST(0 AS BIGINT),
                    least(cum, n - k) - greatest(cum - cnt, k)) AS kp
    FROM k)
  SELECT g AS event_type,
         CAST(max(n) AS BIGINT) AS n,
         CAST(max(k) AS BIGINT) AS n_trimmed_each_side,
         CAST(CAST(sum(kp * v) AS BIGINT) AS DOUBLE)
           / CAST(max(n) - 2 * max(k) AS DOUBLE) AS trimmed_mean_cents,
         CAST(CAST(sum(cnt * v) AS BIGINT) AS DOUBLE)
           / CAST(max(n) AS DOUBLE) AS mean_cents
  FROM kept GROUP BY 1 ORDER BY 1
"""

# Duplicate charges: adjacent same-(user, type, cents) repeats
# within 7 days via lag -- integer cents/microsecond gaps decide
# everything.
ORACLES["duplicate_charge_screen"] = """
  WITH base AS (
    SELECT user_id, event_type,
           CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
           event_id, epoch_us(ts) AS us
    FROM events),
  lagged AS (
    SELECT user_id, event_type, cents,
           lag(event_id) OVER w AS first_event_id,
           event_id AS second_event_id,
           us - lag(us) OVER w AS gap_us
    FROM base
    WINDOW w AS (PARTITION BY user_id, event_type, cents
                 ORDER BY us, event_id))
  SELECT user_id, event_type, cents, first_event_id, second_event_id,
         CAST(gap_us AS BIGINT) AS gap_us
  FROM lagged
  WHERE first_event_id IS NOT NULL
    AND gap_us <= CAST(604800 AS BIGINT) * 1000000
  ORDER BY user_id, event_type, cents, second_event_id
"""

# Quantile normalization: rank r of m -> global order statistic at
# ceil(r*N/m); all-integer, selection not interpolation.
ORACLES["doc_length_quantile_norm"] = """
  WITH local AS (
    SELECT doc_id, lang, n_chars,
           row_number() OVER (PARTITION BY lang
             ORDER BY n_chars, doc_id) AS r,
           count(*) OVER (PARTITION BY lang) AS m
    FROM documents),
  gl AS (
    SELECT n_chars AS norm_n_chars,
           row_number() OVER (ORDER BY n_chars, doc_id) AS k,
           count(*) OVER () AS total_n
    FROM documents),
  keyed AS (
    SELECT doc_id, lang, n_chars,
           (r * (SELECT max(total_n) FROM gl) + m - 1) // m AS k
    FROM local)
  SELECT keyed.doc_id, lang, n_chars, norm_n_chars
  FROM keyed JOIN gl USING (k)
  ORDER BY doc_id
"""

# Theil T: exact-long ratios, ln 9dp per row, 9dp-decimal term sum.
ORACLES["customer_spend_theil"] = """
  WITH spend AS (
    SELECT o_custkey AS custkey,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY 1),
  t AS (
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM spend),
  terms AS (
    SELECT n_customers, total_cents,
           CAST(round(
             (CAST(cents AS DOUBLE) / CAST(total_cents AS DOUBLE))
             * round(ln(CAST(cents AS DOUBLE) * CAST(n_customers AS DOUBLE)
                        / CAST(total_cents AS DOUBLE)), 9),
           9) AS DECIMAL(20,9)) AS term9
    FROM spend, t WHERE cents > 0)
  SELECT n_customers, total_cents,
         CAST(CAST(sum(term9) AS VARCHAR) AS DOUBLE) AS theil
  FROM terms GROUP BY 1, 2
"""

# Rolling WAU: contribute-forward expansion at the user-day grain
# (sliding distinct counts don't decompose into window sums).
ORACLES["events_rolling_wau"] = """
  WITH ud AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
  days AS (SELECT DISTINCT d FROM ud),
  expanded AS (
    SELECT user_id, d + CAST(t.i AS INTEGER) AS dx
    FROM ud CROSS JOIN (SELECT range AS i FROM range(0, 7)) t),
  wau AS (
    SELECT dx, count(DISTINCT user_id) AS wau
    FROM expanded JOIN days ON dx = days.d GROUP BY 1),
  dau AS (
    SELECT d, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1)
  SELECT strftime(dau.d, '%Y-%m-%d') AS day, dau, wau,
         CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness
  FROM dau JOIN wau ON dau.d = wau.dx
  ORDER BY 1
"""

# Hamilton-apportioned stratified sample: all-integer quota
# arithmetic, md5-hex selection order (portable string compare).
ORACLES["stratified_sample_exact"] = """
  WITH c AS (SELECT lang AS g, count(*) AS n_h FROM documents
             GROUP BY 1),
  t AS (
    SELECT g, n_h,
           CAST(sum(n_h) OVER () AS BIGINT) AS tot
    FROM c),
  q AS (
    SELECT g, n_h, tot,
           (tot // 10 * n_h) // tot AS q0,
           (tot // 10 * n_h) % tot AS r,
           tot // 10 AS n_samp
    FROM t),
  rk AS (
    SELECT *, row_number() OVER (ORDER BY r DESC, g) AS rr,
           n_samp - sum(q0) OVER () AS deficit
    FROM q),
  quota AS (
    SELECT g, n_h,
           CAST(q0 + CASE WHEN rr <= deficit THEN 1 ELSE 0 END
                AS BIGINT) AS quota
    FROM rk),
  sel AS (
    SELECT lang, doc_id,
           row_number() OVER (PARTITION BY lang
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
    FROM documents)
  SELECT sel.lang, doc_id, n_h, qt.quota AS quota
  FROM sel JOIN quota qt ON sel.lang = qt.g
  WHERE rnk <= qt.quota
  ORDER BY lang, doc_id
"""

# Trailing OLS: exact HUGEINT window statistics over the day grain,
# RANGE frame (gaps shrink n), string-routed num/den, one division.
ORACLES["events_trailing_slope"] = """
  WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY 1, 2),
  xd AS (
    SELECT event_type, day,
           CAST(day - DATE '1970-01-01' AS BIGINT) AS x, cents
    FROM daily),
  wsum AS (
    SELECT event_type, day, cents,
           CAST(count(*) OVER wnd AS BIGINT) AS n,
           CAST(sum(x) OVER wnd AS HUGEINT) AS sx,
           CAST(sum(cents) OVER wnd AS HUGEINT) AS sy,
           CAST(sum(x * cents) OVER wnd AS HUGEINT) AS sxy,
           CAST(sum(x * x) OVER wnd AS HUGEINT) AS sxx
    FROM xd
    WINDOW wnd AS (PARTITION BY event_type ORDER BY x
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
  SELECT event_type, strftime(day, '%Y-%m-%d') AS day, cents,
         n AS n_points,
         CASE WHEN CAST(n AS HUGEINT) * sxx - sx * sx <> 0 THEN
           CAST(CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS VARCHAR)
                AS DOUBLE)
           / CAST(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS VARCHAR)
                  AS DOUBLE)
         END AS slope
  FROM wsum ORDER BY 1, 2
"""

# Top-N + OTHERS: exact-micros rank with deterministic tie-break,
# tail rolled into one row so shares sum to 1.
ORACLES["nation_top_brands_others"] = """
  WITH base AS (
    SELECT n_name, p_brand,
           CAST(sum(CAST(
             (CAST(l_extendedprice AS DECIMAL(12,2))
              * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
             * 1000000 AS BIGINT)) AS BIGINT) AS micros
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN part ON l_partkey = p_partkey
    GROUP BY 1, 2),
  rk AS (
    SELECT *, row_number() OVER (PARTITION BY n_name
              ORDER BY micros DESC, p_brand) AS rk
    FROM base),
  rolled AS (
    SELECT n_name,
           CASE WHEN rk <= 3 THEN p_brand ELSE 'OTHERS' END AS brand,
           count(*) AS n_brands,
           CAST(sum(micros) AS BIGINT) AS mi
    FROM rk GROUP BY 1, 2)
  SELECT n_name, brand, n_brands,
         CAST(mi AS DOUBLE) / 1000000.0 AS revenue,
         CAST(mi AS DOUBLE)
           / CAST(CAST(sum(mi) OVER (PARTITION BY n_name) AS BIGINT)
                  AS DOUBLE) AS share
  FROM rolled ORDER BY 1, 5 DESC, 2
"""

# z-test: all inputs exact integer counts; identical float
# expression shape on both sides; sqrt is IEEE-correctly-rounded.
ORACLES["ab_conversion_ztest"] = """
  WITH s AS (
    SELECT user_id, min(ts) AS s0 FROM events
    WHERE event_type = 'signup' GROUP BY 1),
  pu AS (
    SELECT s.user_id,
           max(CASE WHEN e.event_type = 'purchase'
                     AND e.ts >= s.s0
                     AND e.ts < s.s0 + INTERVAL 24 HOURS
                    THEN 1 ELSE 0 END) AS conv
    FROM s JOIN events e USING (user_id) GROUP BY 1),
  v AS (
    SELECT user_id % 2 AS variant, count(*) AS n,
           CAST(sum(conv) AS BIGINT) AS c
    FROM pu GROUP BY 1),
  w AS (
    SELECT max(CASE WHEN variant = 0 THEN n END) AS n_a,
           max(CASE WHEN variant = 0 THEN c END) AS conv_a,
           max(CASE WHEN variant = 1 THEN n END) AS n_b,
           max(CASE WHEN variant = 1 THEN c END) AS conv_b
    FROM v),
  p AS (
    SELECT *,
           CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
           CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
           CAST(conv_a + conv_b AS DOUBLE)
             / CAST(n_a + n_b AS DOUBLE) AS pool
    FROM w)
  SELECT n_a, conv_a, p_a, n_b, conv_b, p_b,
         (p_a - p_b) / sqrt(pool * (1.0 - pool)
           * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
           AS z_score
  FROM p
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # faithful surface
    "wordcount": q_wordcount,
    "wordcount_textfile": q_wordcount_textfile,
    "wordcount_topn": q_wordcount_topn,
    "wordcount_rdd": q_wordcount_rdd,
    "wordcount_sql": q_wordcount_sql,
    "wordcount_salted": q_wordcount_salted,
    "doc_idf_salted_join": q_doc_idf_salted_join,
    "pricing_summary_sql": q_pricing_summary_sql,
    "corpus_stats": q_corpus_stats,
    "word_skew_profile": q_word_skew_profile,
    "map_task_stats": q_map_task_stats,
    # text analysis
    "text_stats": q_text_stats,
    "quality_score": q_quality_score,
    "lang_id": q_lang_id,
    "token_counts": q_token_counts,
    "bpe_pair_counts": q_bpe_pair_counts,
    "bpe_merges": q_bpe_merges,
    "bpe_encode": q_bpe_encode,
    "bpe_compression_by_lang": q_bpe_compression_by_lang,
    "pack_sequences_bpe": q_pack_sequences_bpe,
    "doc_fingerprint": q_doc_fingerprint,
    "tfidf_top_terms": q_tfidf_top_terms,
    "bm25_topk": q_bm25_topk,
    "hybrid_rrf_topk": q_hybrid_rrf_topk,
    "prf_rerank": q_prf_rerank,
    "bm25_snippets": q_bm25_snippets,
    "doc_perplexity": q_doc_perplexity,
    "doc_tf_cosine": q_doc_tf_cosine,
    # training-data shaping
    "doc_chunks": q_doc_chunks,
    "pack_sequences": q_pack_sequences,
    "ngram_counts": q_ngram_counts,
    "vocab_ids": q_vocab_ids,
    "vocab_ids_scalable": q_vocab_ids_scalable,
    "training_shuffle_order": q_training_shuffle_order,
    "inverted_index": q_inverted_index,
    "bigram_pmi": q_bigram_pmi,
    "top_terms_per_lang": q_top_terms_per_lang,
    # curation / filtering
    "decontaminate": q_decontaminate,
    "bloom_decontaminate": q_bloom_decontaminate,
    "bloom_pruned_revenue": q_bloom_pruned_revenue,
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "cms_screened_wordcount": q_cms_screened_wordcount,
    "hll_users_portable": q_hll_users_portable,
    "hll_user_rollup": q_hll_user_rollup,
    "kmv_user_overlap": q_kmv_user_overlap,
    "copurchase_butterflies": q_copurchase_butterflies,
    "cosupply_triangles": q_cosupply_triangles,
    "events_gap_fill": q_events_gap_fill,
    "dq_audit": q_dq_audit,
    "market_basket_pairs": q_market_basket_pairs,
    "market_basket_triples": q_market_basket_triples,
    "item_item_cf": q_item_item_cf,
    "training_negatives": q_training_negatives,
    "rake_keyphrases": q_rake_keyphrases,
    "cosupply_kcore": q_cosupply_kcore,
    "cosupply_clustering": q_cosupply_clustering,
    "supplier_reach": q_supplier_reach,
    "cosupply_link_prediction": q_cosupply_link_prediction,
    "cosupply_link_prediction_capped": q_cosupply_link_prediction_capped,
    "supplier_cheapest_reach": q_supplier_cheapest_reach,
    "score_auc": q_score_auc,
    "calibration_bins": q_calibration_bins,
    "corpus_drift_psi": q_corpus_drift_psi,
    "value_drift_ks": q_value_drift_ks,
    "record_linkage_fs": q_record_linkage_fs,
    "linkage_golden_record": q_linkage_golden_record,
    "parts_abc_analysis": q_parts_abc_analysis,
    "customer_spend_gini": q_customer_spend_gini,
    "customer_skyline": q_customer_skyline,
    "part_sales_skyline": q_part_sales_skyline,
    "nation_revenue_trend": q_nation_revenue_trend,
    "zipf_word_fit": q_zipf_word_fit,
    "events_acf": q_events_acf,
    "user_survival_km": q_user_survival_km,
    "user_hazard_na": q_user_hazard_na,
    "score_average_precision": q_score_average_precision,
    "score_lift_deciles": q_score_lift_deciles,
    "term_chi2_keywords": q_term_chi2_keywords,
    "term_keyness_g2": q_term_keyness_g2,
    "lang_js_divergence": q_lang_js_divergence,
    "feature_information_gain": q_feature_information_gain,
    "nation_theilsen_trend": q_nation_theilsen_trend,
    "nation_revenue_holt": q_nation_revenue_holt,
    "linkage_sorted_neighborhood": q_linkage_sorted_neighborhood,
    "lang_simpson_diversity": q_lang_simpson_diversity,
    "brand_revenue_hhi": q_brand_revenue_hhi,
    "events_run_length": q_events_run_length,
    "events_ewma_control": q_events_ewma_control,
    "customer_value_migration": q_customer_value_migration,
    "segment_order_gap_profile": q_segment_order_gap_profile,
    "customer_cohort_ltv": q_customer_cohort_ltv,
    "session_bounce_rate": q_session_bounce_rate,
    "shipping_delay_profile": q_shipping_delay_profile,
    "attribution_markov_removal": q_attribution_markov_removal,
    "embedding_mutual_nn": q_embedding_mutual_nn,
    "embedding_mutual_nn_lsh": q_embedding_mutual_nn_lsh,
    "events_winsorized_mean": q_events_winsorized_mean,
    "event_markov_entropy": q_event_markov_entropy,
    "nation_rank_spearman": q_nation_rank_spearman,
    "basket_rules": q_basket_rules,
    "heaps_law_fit": q_heaps_law_fit,
    "ngram_novelty": q_ngram_novelty,
    "nearest_centroid_confusion": q_nearest_centroid_confusion,
    "label_silhouette": q_label_silhouette,
    "event_conversion_absorption": q_event_conversion_absorption,
    "cosupply_nation_modularity": q_cosupply_nation_modularity,
    "cosupply_degree_assortativity": q_cosupply_degree_assortativity,
    "events_interarrival_burstiness": q_events_interarrival_burstiness,
    "brand_weighted_median": q_brand_weighted_median,
    "segment_nation_chisq": q_segment_nation_chisq,
    "orders_benford": q_orders_benford,
    "customer_spend_lorenz": q_customer_spend_lorenz,
    "events_trimmed_mean": q_events_trimmed_mean,
    "ab_conversion_ztest": q_ab_conversion_ztest,
    "nation_top_brands_others": q_nation_top_brands_others,
    "events_trailing_slope": q_events_trailing_slope,
    "duplicate_charge_screen": q_duplicate_charge_screen,
    "stratified_sample_exact": q_stratified_sample_exact,
    "events_rolling_wau": q_events_rolling_wau,
    "customer_spend_theil": q_customer_spend_theil,
    "doc_length_quantile_norm": q_doc_length_quantile_norm,
    "lang_lexical_richness": q_lang_lexical_richness,
    "embedding_dim_correlation": q_embedding_dim_correlation,
    "nation_rank_movers": q_nation_rank_movers,
    "user_wallet_balance": q_user_wallet_balance,
    "lang_token_entropy": q_lang_token_entropy,
    "k_anonymity_report": q_k_anonymity_report,
    "containment_pairs": q_containment_pairs,
    "frequent_event_trigrams": q_frequent_event_trigrams,
    "events_anomaly_mad": q_events_anomaly_mad,
    "events_dow_seasonality": q_events_dow_seasonality,
    "user_day_snapshot_diff": q_user_day_snapshot_diff,
    "purchase_hits": q_purchase_hits,
    "event_transitions": q_event_transitions,
    "funnel_strict_sequence": q_funnel_strict_sequence,
    "user_activity_streaks": q_user_activity_streaks,
    "embedding_dim_stats": q_embedding_dim_stats,
    "eval_overlap_report": q_eval_overlap_report,
    "purchase_pagerank": q_purchase_pagerank,
    "segment_affinity_suppliers": q_segment_affinity_suppliers,
    "fuzzy_word_pairs": q_fuzzy_word_pairs,
    "repetition_stats": q_repetition_stats,
    "pii_redact": q_pii_redact,
    "mixture_sample": q_mixture_sample,
    "token_budget_mixture": q_token_budget_mixture,
    "shard_manifest": q_shard_manifest,
    # dedup
    "documents_sample": q_documents_sample,
    "dedup_exact": q_dedup_exact,
    "dedup_keep_best": q_dedup_keep_best,
    "incremental_dedup": q_incremental_dedup,
    "ngram_jaccard": q_ngram_jaccard,
    "jaccard_prefix_pairs": q_jaccard_prefix_pairs,
    "minhash_near_dup": q_minhash_near_dup,
    "dedup_clusters": q_dedup_clusters,
    "leakage_safe_split": q_leakage_safe_split,
    "dedup_clusters_jaccard": q_dedup_clusters_jaccard,
    "simhash": q_simhash,
    "simhash_pairs": q_simhash_pairs,
    # similarity
    "knn_cosine": q_knn_cosine,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "ann_recall": q_ann_recall,
    "ann_rank_quality": q_ann_rank_quality,
    "mmr_rerank": q_mmr_rerank,
    "ann_recall_sweep": q_ann_recall_sweep,
    "kmeans_cells": q_kmeans_cells,
    "cluster_topics": q_cluster_topics,
    "ann_ivf_kmeans": q_ann_ivf_kmeans,
    "embedding_dup_pairs": q_embedding_dup_pairs,
    "embedding_dup_pairs_lsh": q_embedding_dup_pairs_lsh,
    "embedding_quantize": q_embedding_quantize,
    "pq_codes": q_pq_codes,
    "pq_search": q_pq_search,
    "ann_ivfpq": q_ann_ivfpq,
    "ann_ivfpq_residual": q_ann_ivfpq_residual,
    "semantic_dedup": q_semantic_dedup,
    "dsir_weights": q_dsir_weights,
    "select_pretraining_corpus": q_select_pretraining_corpus,
    "nb_lang_scores": q_nb_lang_scores,
    "nb_confusion": q_nb_confusion,
    "late_shipments": q_late_shipments,
    "events_anomaly_zscore": q_events_anomaly_zscore,
    "weighted_doc_sample": q_weighted_doc_sample,
    "events_profile": q_events_profile,
    "user_activity_decay": q_user_activity_decay,
    "user_activity_decay_fold": q_user_activity_decay_fold,
    "customer_spend_percentiles": q_customer_spend_percentiles,
    "customer_spend_percentiles_scalable": analytics.customer_spend_percentiles_scalable,
    "temperature_sample": q_temperature_sample,
    "orders_grouping_sets": q_orders_grouping_sets,
    "purchase_and_signup_users": q_purchase_and_signup_users,
    "events_quantiles_binned": q_events_quantiles_binned,
    "duplicate_spans": q_duplicate_spans,
    "embedding_project": q_embedding_project,
    # multimodal
    "multimodal_meta": q_multimodal_meta,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_phash_dup": q_multimodal_phash_dup,
    "multimodal_frames": q_multimodal_frames,
    "multimodal_resize": q_multimodal_resize,
    # relational analytics
    "pricing_summary": q_pricing_summary,
    "revenue_by_nation": q_revenue_by_nation,
    "volume_shipping": q_volume_shipping,
    "market_share": q_market_share,
    "large_volume_customers": q_large_volume_customers,
    "disjunctive_revenue": q_disjunctive_revenue,
    "customer_distribution": q_customer_distribution,
    "top_supplier": q_top_supplier,
    "small_qty_revenue": q_small_qty_revenue,
    "waiting_suppliers": q_waiting_suppliers,
    "product_profit": q_product_profit,
    "supplier_part_counts": q_supplier_part_counts,
    "dominant_suppliers": q_dominant_suppliers,
    "cheapest_supplier": q_cheapest_supplier,
    "nation_market_share": q_nation_market_share,
    "events_last_per_user": q_events_last_per_user,
    "segment_event_stats": q_segment_event_stats,
    "top_customers": q_top_customers,
    "customer_order_ranks": q_customer_order_ranks,
    "events_hourly": q_events_hourly,
    "user_retention": q_user_retention,
    "events_sessionize": q_events_sessionize,
    "session_concurrency": q_session_concurrency,
    "user_value_twap": q_user_value_twap,
    "events_cusum": q_events_cusum,
    "customer_rfm": q_customer_rfm,
    "events_session_window": q_events_session_window,
    "user_state_intervals": analytics.user_state_intervals,
    "user_state_asof": analytics.user_state_asof,
    "purchase_attribution": q_purchase_attribution,
    "attribution_summary": q_attribution_summary,
    "attribution_position_weighted": analytics.attribution_position_weighted,
    "events_json_stats": q_events_json_stats,
    "events_rollup": q_events_rollup,
    "events_cube": q_events_cube,
    "orders_price_deciles": q_orders_price_deciles,
    "stratified_sample": q_stratified_sample,
    "repeat_customers": q_repeat_customers,
    "distinct_users": q_distinct_users,
    "approx_distinct_users": q_approx_distinct_users,  # rows-only (HLL sketch)
    "orders_monthly": q_orders_monthly,
    "events_asof_error": q_events_asof_error,
    "events_asof_features": q_events_asof_features,
    "events_asof_nearest": q_events_asof_nearest,
    "events_range_join": q_events_range_join,
    "events_hopping": q_events_hopping,
    "events_pivot": q_events_pivot,
    "events_unpivot": q_events_unpivot,
    "zorder_cells": q_zorder_cells,
    "zorder_skipping_summary": q_zorder_skipping_summary,
    "hilbert_cells": q_hilbert_cells,
    "hilbert_skipping_summary": q_hilbert_skipping_summary,
    "curve_locality_stats": q_curve_locality_stats,
    "orders_running_total": q_orders_running_total,
    "customers_without_orders": q_customers_without_orders,
    "brands_shipped": q_brands_shipped,
    "events_quantiles": q_events_quantiles,
    "events_quantiles_approx": q_events_quantiles_approx,  # rows-only (GK sketch)
    "events_trailing_hour": q_events_trailing_hour,
    "events_type_trend": q_events_type_trend,
    "curate_documents": q_curate_documents,
    "revenue_forecast": q_revenue_forecast,
    "signup_funnel": q_signup_funnel,
    "shipping_priority": q_shipping_priority,
    "large_orders": q_large_orders,
    "label_centroids": q_label_centroids,
    "order_priority_backlog": q_order_priority_backlog,
    "returned_items": q_returned_items,
    "important_parts": q_important_parts,
    "promo_revenue": q_promo_revenue,
    "sales_opportunity": q_sales_opportunity,
}

# Headline set for bench.py: widest-coverage representatives, excluding
# the deliberately-quadratic oracle variants and the Python-RDD path.
BENCH_QUERIES = [
    "wordcount",
    "wordcount_topn",
    "wordcount_salted",
    "tfidf_top_terms",
    "events_rollup",
    "distinct_users",
    "orders_monthly",
    "events_asof_error",
    "events_range_join",
    "events_hopping",
    "events_pivot",
    "orders_running_total",
    "text_stats",
    "quality_score",
    "token_counts",
    "bpe_encode",
    "decontaminate",
    "repetition_stats",
    "pii_redact",
    "mixture_sample",
    "token_budget_mixture",
    "temperature_sample",
    "duplicate_spans",
    "dsir_weights",
    "select_pretraining_corpus",
    "nb_lang_scores",
    "late_shipments",
    "events_quantiles_binned",
    "events_anomaly_zscore",
    "dedup_exact",
    "incremental_dedup",
    "inverted_index",
    "bigram_pmi",
    "top_terms_per_lang",
    "minhash_near_dup",
    "doc_perplexity",
    "doc_tf_cosine",
    "simhash",
    "knn_cosine",
    "ann_lsh",
    "ann_recall",
    "bm25_topk",
    "hybrid_rrf_topk",
    "embedding_quantize",
    "embedding_project",
    "pricing_summary",
    "revenue_by_nation",
    "volume_shipping",
    "market_share",
    "large_volume_customers",
    "disjunctive_revenue",
    "customer_distribution",
    "waiting_suppliers",
    "product_profit",
    "purchase_pagerank",
    "revenue_forecast",
    "shipping_priority",
    "top_customers",
    "customer_order_ranks",
    "events_hourly",
    "events_sessionize",
    "events_session_window",
    "events_json_stats",
    # r4: the distributed-ranking rewrites (orders_price_deciles lost
    # its single-partition fact sort; the *_scalable variants rank via
    # the two-level bucket scheme) -- benched so the cost of the
    # scale-correct plans is measured, not assumed
    "orders_price_deciles",
    "customer_spend_percentiles_scalable",
    "vocab_ids_scalable",
    "training_shuffle_order",
    # r4 second wave: curation/retrieval/profiling additions
    "dedup_keep_best",
    "events_unpivot",
    "user_activity_decay",
    "prf_rerank",
    "weighted_doc_sample",
    "events_profile",
    "jaccard_prefix_pairs",
    "zorder_cells",
    "zorder_skipping_summary",
    "hilbert_skipping_summary",
    "curve_locality_stats",
    "hll_user_rollup",
    "cms_screened_wordcount",
    "user_state_intervals",
    "bloom_pruned_revenue",
    "kmv_user_overlap",
    # r5: skew-join evidence + the motif counter's cost as a measured
    # row (VERDICT r4 #4/#5). copurchase_butterflies is the heaviest
    # bench entry by design: ~6.7M exact segment-scoped wedges at
    # sf0.1 -- the honest price of an exact motif count, visible here
    # instead of buried in a comment.
    "doc_idf_salted_join",
    "copurchase_butterflies",
    # r5 continuation: triangle motif (degree-oriented wedges),
    # dense gap-fill resample, and the one-scan-per-table DQ audit
    "cosupply_triangles",
    "events_gap_fill",
    "dq_audit",
    "market_basket_pairs",
    "purchase_hits",
    "event_transitions",
    # r5 continuation: nearest as-of attach + graded index eval +
    # sweep-line peak concurrency + MMR diversified rerank
    "events_asof_nearest",
    "ann_rank_quality",
    "session_concurrency",
    "mmr_rerank",
    "user_value_twap",
    "market_basket_triples",
    "supplier_reach",
    "user_day_snapshot_diff",
    "item_item_cf",
    "training_negatives",
    "rake_keyphrases",
    "events_cusum",
    "customer_rfm",
    # r6 continuation: skyline / clustering coefficient / OLS trend /
    # ACF / Kaplan-Meier / reciprocal-NN matching
    "customer_skyline",
    "cosupply_clustering",
    "nation_revenue_trend",
    "events_acf",
    "user_survival_km",
    "embedding_mutual_nn",
    "brand_weighted_median",
    "segment_nation_chisq",
    "orders_benford",
    "customer_spend_lorenz",
    "events_trimmed_mean",
    "ab_conversion_ztest",
    "nation_top_brands_others",
    "events_trailing_slope",
    "duplicate_charge_screen",
    "stratified_sample_exact",
    "events_rolling_wau",
    "customer_spend_theil",
    "doc_length_quantile_norm",
    "lang_lexical_richness",
    "embedding_dim_correlation",
    # r7: the 100 TB scale-path twins (VERDICT r6 #4/#5) -- headline
    # rows so their cost is directly comparable to the exact forms
    "embedding_mutual_nn_lsh",
    "cosupply_link_prediction_capped",
    # r7 second wave: robust/rank/association/markov statistics
    "events_winsorized_mean",
    "event_markov_entropy",
    "nation_rank_spearman",
    "basket_rules",
    "heaps_law_fit",
    "ngram_novelty",
    "nearest_centroid_confusion",
    "label_silhouette",
    "event_conversion_absorption",
    "cosupply_nation_modularity",
    "cosupply_degree_assortativity",
    "events_interarrival_burstiness",
    # r7 sixth wave: ranking-evaluation / survival / keyness /
    # corpus-distance / robust-trend companions
    "user_hazard_na",
    "score_average_precision",
    "score_lift_deciles",
    "term_chi2_keywords",
    "lang_js_divergence",
    "nation_theilsen_trend",
    # r7 seventh wave: attribution / feature-selection / keyness
    "term_keyness_g2",
    "feature_information_gain",
    # r7 eighth wave: sorted-neighborhood linkage / Holt smoothing
    "linkage_sorted_neighborhood",
    "nation_revenue_holt",
    # r7 ninth wave: diversity / concentration / runs / EWMA
    "lang_simpson_diversity",
    "brand_revenue_hhi",
    "events_run_length",
    "events_ewma_control",
    # r7 tenth wave: cohort LTV / bounce / delay percentiles
    "customer_cohort_ltv",
    "session_bounce_rate",
    "shipping_delay_profile",
    # r7 eleventh wave: quintile migration / cadence profile
    "customer_value_migration",
    "segment_order_gap_profile",
]

# The EAGER family: queries whose DataFrame CONSTRUCTION runs the
# expensive algorithm (driver-side iterative loops -- Lloyd rounds,
# BPE merges, label-propagation/k-core fixpoints, BFS frontiers --
# or a parameter sweep of them). bench.py times fn(spark, sf) + noop
# eval for EVERY query, so these get real build-inclusive rows; they
# live in their own BENCH.json section because their cost profile
# (N materialized rounds) is not comparable to a one-plan query, and
# because median-of-3 on multi-round trainers would triple the bench
# wall clock for algorithms whose round count is deterministic.
EAGER_BENCH_QUERIES = [
    "kmeans_cells",
    "cluster_topics",
    "ann_ivf",
    "ann_ivf_kmeans",
    "ann_recall_sweep",
    "pq_codes",
    "pq_search",
    "ann_ivfpq",
    "ann_ivfpq_residual",
    "semantic_dedup",
    "bpe_merges",
    "bpe_compression_by_lang",
    "pack_sequences_bpe",
    "dedup_clusters",
    "dedup_clusters_jaccard",
    "leakage_safe_split",
    "curate_documents",
    "cosupply_kcore",
    "segment_affinity_suppliers",
    "supplier_cheapest_reach",
    "attribution_markov_removal",
]

# Everything else: measured once per bench run so every registry
# query has a BENCH row (VERDICT r5 #1). Includes the deliberately-
# quadratic oracle baselines (embedding_dup_pairs brute force, the
# Python-RDD wordcount) -- their honest cost is the point of the row.
EXTENDED_BENCH_QUERIES = [
    q for q in QUERIES
    if q not in BENCH_QUERIES and q not in EAGER_BENCH_QUERIES
]

# Every registry query must land in exactly one bench section.
assert not (set(BENCH_QUERIES) & set(EAGER_BENCH_QUERIES))
assert (
    set(BENCH_QUERIES) | set(EAGER_BENCH_QUERIES) | set(EXTENDED_BENCH_QUERIES)
) == set(QUERIES)


# ---------------------------------------------------------------------------
# bench canary (round-comparable measurement surface, VERDICT r7 #1)
# ---------------------------------------------------------------------------
# PINNED set of 25 headline queries spanning every plan family
# (scan-agg, multi-join, window/session, percentile, dedup/LSH, ANN,
# text ranking, graph motif/iteration, banded linkage, data layout).
# bench.py times these FIRST, in their own fresh JVM subprocess,
# median-of-3 -- so their numbers are comparable across rounds no
# matter how many queries later rounds append. r6->r7 taught us the
# sequential single-JVM battery drifts ~1.3x on untouched plans as
# the registry grows; this set is the stable reference frame. DO NOT
# reorder or remove entries -- append-only changes keep old rounds
# comparable (contract-tested).
CANARY_QUERIES = [
    "wordcount",
    "pricing_summary",
    "revenue_by_nation",
    "market_share",
    "top_customers",
    "orders_monthly",
    "events_rollup",
    "events_sessionize",
    "events_hopping",
    "orders_running_total",
    "events_quantiles_binned",
    "dedup_exact",
    "minhash_near_dup",
    "simhash",
    "knn_cosine",
    "ann_lsh",
    "bm25_topk",
    "tfidf_top_terms",
    "doc_perplexity",
    "purchase_pagerank",
    "cosupply_triangles",
    "embedding_mutual_nn_lsh",
    "linkage_sorted_neighborhood",
    "heaps_law_fit",
    "zorder_skipping_summary",
]

# Canary entries are headline queries (their fresh-JVM timing IS the
# headline row; bench.py skips re-timing them in the batched tier).
assert set(CANARY_QUERIES) <= set(BENCH_QUERIES)
assert len(CANARY_QUERIES) == len(set(CANARY_QUERIES))
