"""Exact set-similarity join via prefix filtering (PPJoin-family,
Chaudhuri et al. ICDE'06 / Xiao et al. WWW'08 shape).

The banded MinHash path (operators/dedup.py) is probabilistic: a true
near-dup pair can miss every band. This operator is the EXACT
complement: all pairs with shingle-set Jaccard >= t, with candidate
generation that is provably lossless -- if J(a,b) >= t then a and b
share at least one element among each set's first
|s| - ceil(t*|s|) + 1 elements under any fixed global order (take the
overlap lower bound ceil(t*|s|); skipping past the prefix leaves
fewer than that many elements). Ordering the sets rarest-token-first
makes those prefix tokens the most selective ones, so the candidate
join stays near-linear instead of quadratic.

Scale shape: one partial-agg'd shuffle for shingle document
frequencies, one doc-keyed shuffle to assemble sorted sets, a
prefix-token self-join whose fan-out per token is bounded by that
token's df (rare-first prefixes keep it small), a distinct on the
candidate PAIR KEYS only (never the arrays), and two keyed joins to
bring the sets back for the exact intersect. Nothing all-pairs.

The registry oracle is deliberately the NAIVE all-pairs SQL: the
driver's hash match is then a proof that the prefix filter dropped
nothing (the same adversarial-oracle pattern as fuzzy_word_pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..materialize import materialize
from .dedup import DEFAULT_SHINGLE_K, shingle_rows_flat


def jaccard_prefix_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = DEFAULT_SHINGLE_K,
    t_num: int = 4,
    t_den: int = 5,
    reliable: bool | None = None,
) -> DataFrame:
    """All (doc_a < doc_b) pairs with Jaccard(shingle sets) >=
    t_num/t_den, exactly. The threshold is a RATIONAL so the final
    predicate is pure integer arithmetic (t_den*inter >= t_num*union)
    -- no float compare to disagree across engines; the reported
    jaccard itself is the one rounded double division.

    `reliable` picks the executor-loss story for the shared
    sorted-shingle-sets table (see materialize.py): the table is
    CORPUS-SIZED, so on a long 100 TB run pass reliable=True to
    survive executor loss at the cost of a disk persist."""
    sh = shingle_rows_flat(docs, text_col=text_col, k=k).distinct()
    dfreq = sh.groupBy("sh").agg(F.count("*").alias("df"))
    sets = (
        sh.join(dfreq, "sh")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "sh"))),
                lambda x: x["sh"],
            ).alias("st")
        )
        .withColumn("sz", F.size("st"))
    )
    # prefix explode + 2 pair joins reuse it -- one materialization
    sets = materialize(sets, reliable=reliable)
    plen = (
        F.col("sz")
        - F.ceil(F.col("sz") * F.lit(t_num) / F.lit(t_den)).cast("int")
        + F.lit(1)
    )
    pref = sets.select(
        "doc_id", "sz", F.explode(F.slice("st", F.lit(1), plen)).alias("ptok")
    )
    # size lemma inside the candidate join (J >= t => t|b| <= |a| <=
    # |b|/t: intersect <= min size, union >= max size): provably drops
    # no qualifying pair, and prunes frequent-prefix-token collisions
    # between very differently-sized sets before the distinct
    cand = (
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a.ptok") == F.col("b.ptok"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.sz") * t_den >= F.col("b.sz") * t_num)
            & (F.col("b.sz") * t_den >= F.col("a.sz") * t_num),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    inter = F.size(F.array_intersect("sa", "sb")).cast("long")
    return (
        cand.join(
            sets.select(
                F.col("doc_id").alias("doc_a"),
                F.col("st").alias("sa"),
                F.col("sz").alias("za"),
            ),
            "doc_a",
        )
        .join(
            sets.select(
                F.col("doc_id").alias("doc_b"),
                F.col("st").alias("sb"),
                F.col("sz").alias("zb"),
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            inter.alias("inter"),
            (F.col("za").cast("long") + F.col("zb") - inter).alias("un"),
        )
        .filter(F.lit(t_den) * F.col("inter") >= F.lit(t_num) * F.col("un"))
        .select(
            "doc_a",
            "doc_b",
            "inter",
            F.col("un").alias("union_sz"),
            F.round(F.col("inter") / F.col("un"), 6).alias("jaccard"),
        )
    )
