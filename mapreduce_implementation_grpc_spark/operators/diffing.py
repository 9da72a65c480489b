"""Snapshot diff: compare two versions of a keyed table and emit one
row per CHANGED key -- insert / delete / update plus which compared
columns moved. The table-reconciliation primitive of an incremental
pipeline ("what did this reload change"), and the read-side complement
of the copy-on-write MERGE sink (operators/incremental.py): MERGE
applies a changeset, snapshot_diff derives one.

Scale shape: ONE full-outer equi-join on the key columns (a keyed
shuffle of each side, short keys); change classification and the
changed-column list are row-local expressions -- no windows, no
second pass, nothing driver-side. Unchanged keys are filtered out, so
the output is changeset-sized, not table-sized.

Null-safe by construction: presence is tracked with literal marker
columns (a key present with an all-NULL payload is still "present"),
and column comparison uses null-safe equality (NULL -> NULL is
unchanged, NULL -> value is a change).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Diff `new` against `old` on `keys`. Returns [*keys, change,
    changed_cols, old_<c>..., new_<c>...] where change is
    'insert' (key only in new), 'delete' (key only in old) or
    'update' (key in both, >=1 compared column differs null-safely);
    changed_cols is the comma-joined sorted list of differing columns
    for updates ('' for insert/delete). Unchanged keys are dropped."""
    o = old.select(
        *keys,
        F.lit(True).alias("_old_present"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("_new_present"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(n, keys, "full_outer")
    diffs = [
        F.when(
            ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")), F.lit(c)
        )
        for c in sorted(compare_cols)
    ]
    changed = F.concat_ws(",", F.array_compact(F.array(*diffs)))
    change = (
        F.when(F.col("_new_present").isNull(), F.lit("delete"))
        .when(F.col("_old_present").isNull(), F.lit("insert"))
        .when(changed != "", F.lit("update"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            *keys,
            "change",
            F.when(F.col("change") == "update", changed)
            .otherwise(F.lit(""))
            .alias("changed_cols"),
            *[F.col(f"old_{c}") for c in compare_cols],
            *[F.col(f"new_{c}") for c in compare_cols],
        )
    )
