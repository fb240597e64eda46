"""Snapshot diff — incremental-recrawl / index-maintenance primitive.

A production crawler does not refetch 10^10 pages; it diffs the previous
crawl's state against the current one and schedules only added/changed
keys (SURVEY.md §2.10e). The same operator is the training-data
pipeline's ingest dedup step: which documents are new or changed since
the last snapshot.

Plan shape at scale: ONE full-outer hash join keyed on the snapshot key —
both sides shuffle once on the key (or zero times when both snapshots are
bucketed/partitioned on it, the Iceberg layout the crawl catalog writes);
classification is a codegen'd projection. Unchanged keys are dropped
before anything downstream materializes, so the output is O(churn), not
O(corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_cols: list[str], value_col: str
) -> DataFrame:
    """(key..., change, old_value, new_value) for every key whose state
    differs between the two snapshots.

    change ∈ {'added', 'removed', 'changed'}:
      added    key present only in `new`
      removed  key present only in `old`
      changed  present in both with value_col differing (null-safe
               comparison — a null value is a real state, not absence;
               presence is tracked with explicit flags so rows with null
               values classify correctly)
    Unchanged keys are filtered out. Deterministic given deterministic
    inputs; feed as-of-deduplicated snapshots (e.g. latest_pages) so each
    key appears at most once per side.
    """
    o = old.select(
        *key_cols,
        F.col(value_col).alias("old_value"),
        F.lit(True).alias("_has_old"),
    )
    n = new.select(
        *key_cols,
        F.col(value_col).alias("new_value"),
        F.lit(True).alias("_has_new"),
    )
    j = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_has_old").isNull(), "added")
        .when(F.col("_has_new").isNull(), "removed")
        .when(~F.col("old_value").eqNullSafe(F.col("new_value")), "changed")
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*key_cols, "change", "old_value", "new_value")
    )
