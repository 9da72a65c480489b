"""O2 -- normalize (SURVEY.md section 2a).

Reference: greeter_client.cc:316-321 walks the whole corpus char by
char on the master, keeping isalnum/isspace and lowercasing. Here it
is a single JVM-side expression -- `lower(regexp_replace(...))` --
that stays inside whole-stage codegen and runs per-executor on each
input split; no driver materialization, no Python in the hot path.

Semantics pinned to the DuckDB oracle (FIXTURES.md):
  trim(lower(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))
`trim` is added on both sides so leading/trailing whitespace cannot
produce empty tokens in only one engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NORMALIZE_PATTERN = r"[^a-zA-Z0-9\s]"


def normalized_col(col: Column | str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return F.trim(F.lower(F.regexp_replace(col, NORMALIZE_PATTERN, "")))


def normalize_text(df: DataFrame, in_col: str = "line", out_col: str = "norm") -> DataFrame:
    return df.withColumn(out_col, normalized_col(in_col))
