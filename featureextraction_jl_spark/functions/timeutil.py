"""Timestamp helpers shared by the temporal operators.

Driver parquet files carry TIMESTAMP_NTZ, which Spark will not cast directly
to DOUBLE; routing through timestamp_ltz (session tz pinned to UTC in
session.py) yields naive-UTC epoch seconds — exactly DuckDB's epoch(ts).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col: Column | str) -> Column:
    """Epoch seconds as DOUBLE — bit-identical to DuckDB's epoch(ts), which
    the oracle SQL uses; keep this form wherever results are oracle-compared
    (sessionize gaps, as-of tolerances)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp_ltz").cast("double")


def epoch_micros(col: Column | str) -> Column:
    """EXACT integer microseconds (unix_micros), for rangeBetween order
    keys.  The old double round-trip (seconds * 1e6, truncating cast) could
    come out one microsecond low for post-2004 epochs (double spacing
    ~0.24us there), shifting exact-boundary rows in/out of time windows."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp_ltz"))
