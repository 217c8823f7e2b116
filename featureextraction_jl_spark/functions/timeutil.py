"""Timestamp helpers shared by the temporal operators.

Driver parquet files carry TIMESTAMP_NTZ, which Spark will not cast directly
to DOUBLE; routing through timestamp_ltz (session tz pinned to UTC in
session.py) yields naive-UTC epoch seconds — exactly DuckDB's epoch(ts).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp_ltz").cast("double")


def epoch_micros(col: Column | str) -> Column:
    return (epoch_seconds(col) * F.lit(1e6)).cast("long")
