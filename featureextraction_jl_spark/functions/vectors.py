"""Column-level dense-vector primitives shared by the similarity family.

The exact cosine over ``array<double>`` columns appears in three operators
(brute-force top-k, IVF batch serving, embedding near-dup scoring); before
this module each re-implemented the same zip_with/aggregate folds inline,
so a fix to the fold (null-element policy, overflow handling) had to be
applied three times and the copies had already started to drift.  These are
pure JVM expressions — whole-stage-codegen'd, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_cols(a: Column, b: Column) -> Column:
    """Elementwise dot product of two array<double> columns (JVM fold)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm_col(a: Column) -> Column:
    """L2 norm of an array<double> column (JVM fold)."""
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_cols(a: Column, b: Column) -> Column:
    """Exact cosine similarity of two array<double> columns.

    Callers that join one vector column against many (near-dup scoring)
    should precompute ``norm_col`` per side BEFORE the join instead — the
    norms are per-row constants and recomputing them per candidate pair
    wastes the fold; this composed form is for one-shot comparisons.
    """
    return dot_cols(a, b) / (norm_col(a) * norm_col(b))
