"""Streaming mean/covariance moment accumulation (SURVEY.md §2 op A3/A4).

The reference accumulates (mean, covariance) over dense Float64 matrices with
Julia ``Statistics.mean`` / ``Statistics.cov`` semantics (Bessel-corrected,
n-1).  Here the accumulator is the *mergeable* centered-moment triple

    (n, mean, M2)    with    M2 = sum_i (x_i - mean)(x_i - mean)^T

merged pairwise with the Chan/Golub/LeVeque update (SURVEY.md §1.4.4), which
is associative and commutative up to float round-off — this exactness under
arbitrary splits is what makes skew salting (plans/salting.py) and
treeAggregate partials correct.

Two distributed strategies, both Arrow-vectorized (no per-row Python):

* :func:`compute_moments` — ``mapInPandas`` emits one partial row per Arrow
  batch; partials (1 + p + p*p doubles each) are collected to the driver and
  Chan-merged.  At 1000 executors x 100 TB this collect is
  O(num_batches * p^2) bytes of *moments*, never row data.
* :func:`compute_moments_tree` — same per-batch partials, reduced with
  ``RDD.treeAggregate(depth=2)`` so the merge itself happens on executors
  ("treeAggregate-style partial moment matrices", BASELINE.json:6).  Use for
  very large batch counts.

Grouped/windowed variant: :func:`compute_grouped_moments` emits one moment
row per group key via ``applyInPandas`` (feeds windowed PCA features).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Moments:
    """Mergeable centered moments: count, mean vector, comoment matrix."""

    n: int
    mean: np.ndarray  # shape (p,)
    m2: np.ndarray    # shape (p, p); sum of outer products of deviations

    @property
    def cov(self) -> np.ndarray:
        """Bessel-corrected sample covariance (Julia Statistics.cov default)."""
        if self.n < 2:
            return np.full_like(self.m2, np.nan)
        return self.m2 / (self.n - 1)

    @property
    def std(self) -> np.ndarray:
        """Corrected per-feature standard deviation."""
        return np.sqrt(np.clip(np.diag(self.cov), 0.0, None))

    @property
    def corr(self) -> np.ndarray:
        """Correlation matrix R = D^{-1/2} Sigma D^{-1/2}; zero-variance -> 0."""
        sd = self.std
        with np.errstate(divide="ignore", invalid="ignore"):
            r = self.cov / np.outer(sd, sd)
        r[~np.isfinite(r)] = 0.0
        return r


def batch_moments(x: np.ndarray) -> Moments:
    """Moments of one dense batch (rows = observations). One BLAS GEMM."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    if n == 0:
        p = x.shape[1] if x.ndim == 2 else 0
        return Moments(0, np.zeros(p), np.zeros((p, p)))
    mean = x.mean(axis=0)
    xc = x - mean
    return Moments(n, mean, xc.T @ xc)


def merge_moments(a: Moments, b: Moments) -> Moments:
    """Chan/Golub/LeVeque pairwise merge — associative, numerically stable."""
    if a.n == 0:
        return b
    if b.n == 0:
        return a
    n = a.n + b.n
    delta = b.mean - a.mean
    mean = a.mean + delta * (b.n / n)
    m2 = a.m2 + b.m2 + np.outer(delta, delta) * (a.n * b.n / n)
    return Moments(n, mean, m2)


# ---------------------------------------------------------------------------
# Distributed accumulation
# ---------------------------------------------------------------------------

_PARTIAL_SCHEMA = "n long, mean array<double>, m2 array<double>"


def _batch_to_matrix(col) -> np.ndarray:
    """Arrow list column -> (n, p) float64 matrix, zero-copy when possible.

    Fixed-dim vectors let us reshape the flat values buffer directly —
    ~5x faster than np.stack over per-row object arrays (measured in-sandbox).
    Ragged or null-bearing columns fall back to the object path.
    """
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count == 0:
        flat = np.asarray(col.values, dtype=np.float64)
        n = len(col)
        if n > 0 and flat.size % n == 0:
            return flat.reshape(n, flat.size // n)
    return np.stack(col.drop_null().to_numpy(zero_copy_only=False))


def _arrow_partials(batches, col_idx: int = 0):
    """mapInArrow worker: one (n, mean, flattened m2) row per Arrow batch."""
    import pyarrow as pa

    for b in batches:
        if b.num_rows == 0:
            continue
        x = _batch_to_matrix(b.column(col_idx))
        m = batch_moments(x)
        yield pa.RecordBatch.from_pydict({
            "n": pa.array([m.n], pa.int64()),
            "mean": pa.array([m.mean.tolist()], pa.list_(pa.float64())),
            "m2": pa.array([m.m2.ravel().tolist()], pa.list_(pa.float64())),
        })


def _arrow_partials_cols(batches):
    """mapInArrow worker over p scalar double columns — column_stack is
    zero-copy per column (no per-row array objects anywhere).

    Null semantics mirror the array-column path (_batch_to_matrix): rows
    containing any null are dropped before the moments are computed —
    np.asarray alone would render Arrow nulls as NaN and silently poison
    every moment (pinned in tests/test_kernels.py).
    """
    import pyarrow as pa

    for b in batches:
        if b.num_rows == 0:
            continue
        cols = [b.column(i) for i in range(b.num_columns)]
        if any(c.null_count for c in cols):
            keep = np.ones(b.num_rows, dtype=bool)
            for c in cols:
                keep &= np.asarray(c.is_valid())
            cols = [c.filter(pa.array(keep)) for c in cols]
            if len(cols[0]) == 0:
                continue
        x = np.column_stack([np.asarray(c, dtype=np.float64) for c in cols])
        m = batch_moments(x)
        yield pa.RecordBatch.from_pydict({
            "n": pa.array([m.n], pa.int64()),
            "mean": pa.array([m.mean.tolist()], pa.list_(pa.float64())),
            "m2": pa.array([m.m2.ravel().tolist()], pa.list_(pa.float64())),
        })


def _partials_df(df: DataFrame, vec_col) -> DataFrame:
    # Select-before-map: column pruning can't see inside the UDF, so prune
    # explicitly (SURVEY.md §4 column-pruning caveat).  A list of scalar
    # double columns takes the fully-columnar path (preferred: the plan
    # never builds a per-row array); a single array<double> column reshapes
    # the flat Arrow values buffer.
    if isinstance(vec_col, (list, tuple)):
        return df.select(*vec_col).mapInArrow(_arrow_partials_cols,
                                              schema=_PARTIAL_SCHEMA)
    return df.select(vec_col).mapInArrow(_arrow_partials, schema=_PARTIAL_SCHEMA)


def _row_to_moments(row) -> Moments:
    mean = np.asarray(row["mean"], dtype=np.float64)
    p = mean.shape[0]
    return Moments(int(row["n"]), mean, np.asarray(row["m2"], dtype=np.float64).reshape(p, p))


def compute_moments(df: DataFrame, vec_col) -> Moments:
    """Driver-merge strategy: per-batch Arrow partials -> collect -> Chan-merge.

    ``vec_col``: an array<double> column name, or a list of scalar double
    column names (faster — fully columnar Arrow transfer).  Only moment
    partials cross the executor->driver boundary — O(batches*p^2) doubles,
    independent of row count.
    """
    rows = _partials_df(df, vec_col).collect()
    acc = Moments(0, np.zeros(0), np.zeros((0, 0)))
    for row in rows:
        acc = merge_moments(acc, _row_to_moments(row))
    return acc


def compute_moments_expr(df: DataFrame, vec_col, p: int | None = None) -> Moments:
    """Whole-stage-codegen strategy: raw sums as JVM aggregate expressions.

    No Python boundary at all — ``count``, ``sum(x_i)`` and the upper
    triangle of ``sum(x_i * x_j)`` run inside Catalyst HashAggregate with
    map-side partials (1 + p + p(p+1)/2 agg buffers), then the driver
    recovers the centered moments:

        mean = s / n
        M2   = Q - n * outer(mean, mean)

    Trade-off vs :func:`compute_moments` (Arrow partials + Chan merge):
    raw sums lose the Chan update's cancellation protection, so this path
    is for well-scaled features (the flagship's log1p-scaled raw_vec);
    exactness vs the NumPy oracle at the 1e-8 gate is pinned in
    tests/test_kernels.py.  Null semantics match the Arrow paths: rows with
    a null vector (or any null element via the column-list form) are
    dropped before accumulation.

    ``vec_col``: array<double> column name (pass ``p`` to skip the one-row
    dimension probe) or a list of scalar double column names.
    """
    if isinstance(vec_col, (list, tuple)):
        cols = [F.col(c).cast("double") for c in vec_col]
        src = df.select(*[c.alias(f"_x{i}") for i, c in enumerate(cols)])
        cond = None
        for i in range(len(cols)):
            c = F.col(f"_x{i}").isNotNull()
            cond = c if cond is None else (cond & c)
        src = src.filter(cond)
        xs = [F.col(f"_x{i}") for i in range(len(cols))]
    else:
        if p is None:
            probe = df.select(F.size(F.col(vec_col)).alias("p")) \
                      .filter("p >= 0").limit(1).collect()
            if not probe:
                return Moments(0, np.zeros(0), np.zeros((0, 0)))
            p = int(probe[0]["p"])
        src = df.select(F.col(vec_col).alias("_v")) \
                .filter(F.col("_v").isNotNull())
        xs = [F.col("_v")[i] for i in range(p)]

    p = len(xs)
    aggs = [F.count(F.lit(1)).alias("_n")]
    aggs += [F.sum(xs[i]).alias(f"_s{i}") for i in range(p)]
    aggs += [F.sum(xs[i] * xs[j]).alias(f"_q{i}_{j}")
             for i in range(p) for j in range(i, p)]
    row = src.agg(*aggs).collect()[0]

    n = int(row["_n"])
    if n == 0:
        return Moments(0, np.zeros(p), np.zeros((p, p)))
    s = np.array([row[f"_s{i}"] for i in range(p)], dtype=np.float64)
    q = np.zeros((p, p))
    for i in range(p):
        for j in range(i, p):
            q[i, j] = q[j, i] = row[f"_q{i}_{j}"]
    mean = s / n
    m2 = q - n * np.outer(mean, mean)
    return Moments(n, mean, m2)


def compute_moments_tree(df: DataFrame, vec_col: str, depth: int = 2) -> Moments:
    """treeAggregate strategy: executor-side pairwise merge of partials.

    The leaves are already per-Arrow-batch partials (vectorized); the tree
    only merges tiny (n, mean, m2) rows, so seqOp per-element cost is O(p^2)
    on a handful of rows per partition — no per-row loop over data rows.
    """
    zero = Moments(0, np.zeros(0), np.zeros((0, 0)))
    return _partials_df(df, vec_col).rdd.treeAggregate(
        zero,
        lambda acc, row: merge_moments(acc, _row_to_moments(row)),
        merge_moments,
        depth=depth,
    )


def compute_grouped_moments(df: DataFrame, group_cols: list[str], vec_col: str) -> DataFrame:
    """Per-group moments via applyInPandas: one (group, n, mean, m2) row each.

    Feeds windowed PCA/whitening (group = (conv_id, window) or a time bucket).
    Group state is O(p^2), not O(group rows): the incoming group frame is
    reduced immediately.  Mega-groups should be pre-salted (plans/salting.py)
    because applyInPandas materializes each group in memory (SURVEY.md §4
    spill row).
    """
    out_schema = ", ".join(f"{c} {t}" for c, t in
                           [(c, dict(df.dtypes)[c]) for c in group_cols]) \
        + ", n long, mean array<double>, m2 array<double>"

    def reduce_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        x = np.stack(pdf[vec_col].to_numpy())
        m = batch_moments(x)
        row = {c: [k] for c, k in zip(group_cols, key)}
        row.update({"n": [m.n], "mean": [m.mean.tolist()], "m2": [m.m2.ravel().tolist()]})
        return pd.DataFrame(row)

    return (
        df.select(*group_cols, vec_col)
        .groupBy(*group_cols)
        .applyInPandas(reduce_group, schema=out_schema)
    )


def merge_moment_rows(df: DataFrame) -> Moments:
    """Merge a (small) DataFrame of (n, mean, m2) partial rows on the driver.

    Used to re-merge salted partials (plans/salting.py) — exact because the
    Chan merge is associative/commutative.
    """
    acc = Moments(0, np.zeros(0), np.zeros((0, 0)))
    for row in df.select("n", "mean", "m2").collect():
        acc = merge_moments(acc, _row_to_moments(row))
    return acc
