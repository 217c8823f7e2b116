"""Lag/lead, rolling and tumbling/sliding windows (SURVEY.md §2 C3, C4, C7).

All pure Window/groupBy expressions — JVM-side, whole-stage-codegen-friendly,
sharing one partitioner per (key, order) so a chain of these operators costs
a single Exchange + Sort (SURVEY.md §4 sort-elimination row).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from featureextraction_jl_spark.functions.timeutil import epoch_micros


def entity_window(key: Sequence[str] | str, order: Sequence[str] | str) -> WindowSpec:
    key = [key] if isinstance(key, str) else list(key)
    order = [order] if isinstance(order, str) else list(order)
    return Window.partitionBy(*key).orderBy(*order)


def with_lag_lead(df: DataFrame, key, order, cols: Sequence[str],
                  offsets: Sequence[int] = (1,)) -> DataFrame:
    """Add lag_{k}_{col} / lead_{k}_{col} per entity (prior/next turn features)."""
    w = entity_window(key, order)
    exprs: list[Column] = [F.col(c) for c in df.columns]
    for c in cols:
        for k in offsets:
            exprs.append(F.lag(c, k).over(w).alias(f"lag_{k}_{c}"))
            exprs.append(F.lead(c, k).over(w).alias(f"lead_{k}_{c}"))
    return df.select(*exprs)


def rolling_rows(df: DataFrame, key, order, aggs: dict[str, Column | str],
                 lookback_rows: int) -> DataFrame:
    """Trailing row-count window: the ``lookback_rows`` PRECEDING rows plus
    the current row (frame size ``lookback_rows + 1`` — rowsBetween bounds
    are inclusive; pass n-1 for an n-row window).

    ``aggs`` maps output name -> aggregate Column (or a column name, meaning
    avg).  All aggregates share one frame => one Sort.
    """
    w = entity_window(key, order).rowsBetween(-lookback_rows, 0)
    exprs = [F.col(c) for c in df.columns]
    for name, agg in aggs.items():
        agg = F.avg(agg) if isinstance(agg, str) else agg
        exprs.append(agg.over(w).alias(name))
    return df.select(*exprs)


def rolling_time(df: DataFrame, key, ts_col: str, aggs: dict[str, Column],
                 lookback_seconds: float) -> DataFrame:
    """Trailing time window: rows with ts in [current - lookback, current].

    CLOSED on both ends — rangeBetween bounds are inclusive, so a row at
    exactly ``current - lookback_seconds`` IS aggregated (the q24 oracle
    implements the same closed interval).  Leakage-safe: never looks past
    the current ts.
    """
    key = [key] if isinstance(key, str) else list(key)
    # rangeBetween needs integer bounds: order on microsecond epoch longs.
    # round(), not int(): int() truncates toward zero, so a lookback whose
    # seconds*1e6 is not exactly representable (8.2 -> 8199999.999...)
    # loses 1 us and a row at exactly current - lookback falls OUT of the
    # documented closed interval (the boundary-shift class epoch_micros
    # itself was introduced to kill).
    micros = epoch_micros(ts_col)
    w = (
        Window.partitionBy(*key)
        .orderBy(micros)
        .rangeBetween(-round(lookback_seconds * 1e6), 0)
    )
    exprs = [F.col(c) for c in df.columns]
    for name, agg in aggs.items():
        exprs.append(agg.over(w).alias(name))
    return df.select(*exprs)


def tumbling(df: DataFrame, key, ts_col: str, duration: str,
             aggs: list[Column], slide: str | None = None) -> DataFrame:
    """Tumbling (or sliding, if ``slide``) time-window groupBy aggregation.

    Partial+final HashAggregate; feeds per-window moment accumulation for
    windowed PCA/whitening features (SURVEY.md §2 C7 -> A3).
    """
    key = [key] if isinstance(key, str) else list(key)
    win = F.window(ts_col, duration, slide) if slide else F.window(ts_col, duration)
    return df.groupBy(*key, win.alias("window")).agg(*aggs)
