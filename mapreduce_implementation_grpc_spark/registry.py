"""Query registry: name -> (spark, sf_dir) -> DataFrame, plus the
equivalent DuckDB oracle SQL for the driver's correctness gate.

Conventions (driver compares row-count + schema + order-insensitive
value-hash, joining columns by NAME):
- every computed column aliased identically in Spark and SQL;
- floating-point aggregates rounded to 6 decimals on BOTH sides so
  summation-order ulp differences cannot flip the hash;
- every ordering used inside a query has a deterministic tie-break.

Queries without an oracle entry (hash-based sketches whose hash
function only exists in Spark) get the driver's rows-only check and
are validated by metamorphic pytest properties instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.normalize import normalized_col
from .operators.tokenize import tokenize, tokens_col
from .operators.wordcount import word_count, word_count_rdd
from .operators.topk import top_k
from .sources.catalog import load_table
from .sources.text import corpus_from_documents, task_id_col

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


# ---------------------------------------------------------------------------
# faithful reference surface (SURVEY.md section 2a)
# ---------------------------------------------------------------------------

def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1..O9: the reference's entire job as one declarative plan."""
    return word_count(corpus_from_documents(spark, sf_dir))


def q_wordcount_topn(spark: SparkSession, sf_dir: str, n: int = 100) -> DataFrame:
    """O11: top-N report with deterministic tie-break."""
    return top_k(q_wordcount(spark, sf_dir), n)


def q_wordcount_rdd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BASELINE 'RDD API' surface: flatMap -> map -> reduceByKey."""
    return word_count_rdd(corpus_from_documents(spark, sf_dir))


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 line count generalized: corpus-level totals in one pass."""
    docs = corpus_from_documents(spark, sf_dir)
    words = tokenize(docs.select(normalized_col("line").alias("norm")), "norm")
    return words.agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("word").alias("n_distinct_words"),
    ).crossJoin(docs.agg(F.count("*").alias("n_lines")))


def q_map_task_stats(spark: SparkSession, sf_dir: str, num_tasks: int = 4) -> DataFrame:
    """O4 observable surface: the reference splits the corpus into 4
    tasks and each mapper emits a per-task (word,count) file
    (MapOutputTask<N>.txt, greeter_server.cc:81-86). Deterministic
    task assignment doc_id % 4 stands in for the contiguous split
    (order-invariant per SURVEY.md section 1); output = per-task
    distinct words + token totals, i.e. the shape of the archived
    intermediate outputs."""
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


_FAITHFUL_ORACLES = {
    "wordcount": _SQL_WORDCOUNT,
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
}


# ---------------------------------------------------------------------------
# registry assembly
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "wordcount": q_wordcount,
    "wordcount_topn": q_wordcount_topn,
    "wordcount_rdd": q_wordcount_rdd,
    "corpus_stats": q_corpus_stats,
    "map_task_stats": q_map_task_stats,
}

ORACLES: dict[str, str] = dict(_FAITHFUL_ORACLES)
