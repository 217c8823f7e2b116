"""Structured Streaming twins of the batch operators (SURVEY.md §2 E5/E6).

Same kernel math as the batch path — only the driver loop differs: the
mergeable moment triple (functions/moments.py) becomes per-key streaming
state, and gap sessionization becomes ``session_window``.
"""

from featureextraction_jl_spark.streaming.ingest import (
    finalize_windowed_moments,
    read_transcript_stream,
    sessionized_turn_counts,
    streaming_windowed_moments,
    windowed_turn_stats,
)
from featureextraction_jl_spark.streaming.state import streaming_moments

__all__ = [
    "finalize_windowed_moments",
    "read_transcript_stream",
    "sessionized_turn_counts",
    "streaming_windowed_moments",
    "windowed_turn_stats",
    "streaming_moments",
]
