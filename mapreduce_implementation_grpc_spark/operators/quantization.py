"""Embedding scalar quantization (extension surface, SURVEY.md 2b):
per-dimension min/max int8 codes for a 4x memory reduction on the
ANN serve path, with reconstruction-error accounting.

Spark-first shape:
- per-dimension [min, max] is a 64-row aggregate (posexplode ->
  groupBy(pos)), rebuilt into two ordered array columns in a 1-row
  DataFrame and broadcast -- the corpus never shuffles;
- encode/reconstruct are flat HOF expressions over the row's own
  vector and the broadcast stats arrays (all plain attributes, so
  Catalyst's project-collapsing cannot inline anything expensive
  into the per-element lambdas);
- codes are exact integers in both engines (floor of identical
  double arithmetic), which makes the whole pipeline DuckDB-oracle-
  checkable -- unusual for a lossy-compression operator.

At 100 TB: the dim-stats aggregate is one pass producing dim rows
(map-side partial min/max), the broadcast is 2*dim doubles, and
encoding is embarrassingly parallel. Quantized codes shrink the
serve-side working set so more of the corpus fits in executor
memory during ANN probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LEVELS = 255  # int8 code range [0, 255]


def dim_minmax(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """1-row DataFrame[mins: array<double>, maxs: array<double>] of
    per-dimension bounds, ordered by dimension index."""
    flat = emb.select(F.posexplode(vec_col).alias("pos", "x"))
    st = flat.groupBy("pos").agg(
        F.min("x").cast("double").alias("mn"), F.max("x").cast("double").alias("mx")
    )
    return st.agg(
        F.array_sort(F.collect_list(F.struct("pos", "mn", "mx"))).alias("sm")
    ).select(
        F.transform("sm", lambda s: s["mn"]).alias("mins"),
        F.transform("sm", lambda s: s["mx"]).alias("maxs"),
    )


def quantize_embeddings(
    emb: DataFrame, vec_col: str = "embedding", levels: int = DEFAULT_LEVELS
) -> DataFrame:
    """DataFrame[vec_id, codes: array<int>, mse: double].

    code_i = floor((x_i - mn_i) * levels / (mx_i - mn_i)), clamped to
    the degenerate-dimension case; reconstruction uses the cell
    midpoint mn_i + (code_i + 0.5) * (mx_i - mn_i) / levels. The
    expression order is mirrored token-for-token in the oracle SQL so
    codes match exactly and mse matches at 6 decimals."""
    one = dim_minmax(emb, vec_col)
    base = emb.select("vec_id", F.col(vec_col).alias("v")).crossJoin(F.broadcast(one))
    lv = F.lit(float(levels))
    idx = F.sequence(F.lit(1), F.size("v"))

    def _parts(i):
        x = F.element_at("v", i).cast("double")
        mn = F.element_at("mins", i)
        mx = F.element_at("maxs", i)
        return x, mn, mx

    def code(i):
        x, mn, mx = _parts(i)
        return (
            F.when(mx > mn, F.floor(((x - mn) * lv) / (mx - mn)).cast("int"))
            .otherwise(F.lit(0))
        )

    def err2(i):
        x, mn, mx = _parts(i)
        xh = mn + ((code(i).cast("double") + F.lit(0.5)) * (mx - mn)) / lv
        d = x - xh
        return F.when(mx > mn, d * d).otherwise(F.lit(0.0))

    return base.select(
        "vec_id",
        F.transform(idx, code).alias("codes"),
        F.round(
            F.aggregate(F.transform(idx, err2), F.lit(0.0), lambda a, b: a + b)
            / F.size("v"),
            6,
        ).alias("mse"),
    )
