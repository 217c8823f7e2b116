"""Forward-fill / backward-fill backfill (SURVEY.md §2 C6; north_rule 'backfill').

``last(col, ignorenulls=True)`` over an unbounded-preceding frame propagates
the most recent non-null observation forward per entity — leakage-safe (the
frame never looks past the current row).  Backward fill is the mirrored
frame and is NOT leakage-safe; it exists for offline imputation only and is
flagged as such.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def forward_fill(df: DataFrame, key, order, cols: Sequence[str]) -> DataFrame:
    key = [key] if isinstance(key, str) else list(key)
    order = [order] if isinstance(order, str) else list(order)
    w = (
        Window.partitionBy(*key).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def backward_fill(df: DataFrame, key, order, cols: Sequence[str]) -> DataFrame:
    """Offline-only: reads FUTURE rows; never use inside the feature path."""
    key = [key] if isinstance(key, str) else list(key)
    order = [order] if isinstance(order, str) else list(order)
    w = (
        Window.partitionBy(*key).orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.first(c, ignorenulls=True).over(w))
    return out
