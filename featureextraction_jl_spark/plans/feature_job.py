"""The flagship point-in-time feature job (SURVEY.md §3.2).

scan -> char_len projection (text bytes never shuffle in the fit pass)
     -> as-of join feature snapshots        [shuffle #1, union-trick —
        the ONLY full-data exchange; its hash(conv_id) partitioning is
        reused by every Window after it]
     -> sessionize -> lag/lead -> forward-fill      (same partitioner
        => sort-only, no extra shuffle)
     -> assemble numeric raw feature vector (pure JVM exprs)
     -> global moment accumulation          [Arrow partials: one row per
        partition (in-worker Chan merge); auto-switches to the executor-side
        bucketed reduce above 2048 partitions, so driver traffic is
        O(buckets * p^2) at the 10^12-turn design point]
     -> driver-side PCA/whitening fit (p x p eigh) -> broadcast model
     -> Arrow-batched projection UDF -> features + byte-equal text passthrough

Measured plan decisions (local[32], 6.6M-turn fixture):

* As-of join FIRST: its union window must shuffle both sides anyway, so a
  prior ``bucket_and_sort`` exchange was pure waste — one full shuffle+sort
  of every turn, thrown away.  Partition count is governed by
  ``spark.sql.shuffle.partitions`` (the Spark-idiomatic bucket knob); the
  explicit ``bucket(n, conv_id)`` layout lives at the SINK
  (sources/tables.py write path) where it persists for the next reader.
* ``char_len`` is computed below the shuffle: the fit pass reads only
  ``raw_vec``, so Catalyst prunes the text column out of the exchange
  entirely — the fit pass shuffles ~25 doubles/row instead of the text
  payload.  The projection pass still carries text (byte-equal passthrough).
* Recompute beats cache: persisting the prepared frame between the two
  passes measured 365s vs 197s recompute (text-heavy rows defeat the
  cache; codegen fusion is lost).  ``cache_prepared`` remains for
  compute-bound configs (wide windows, many snapshots).

Zero temporal leakage by construction: every input to the vector at
(conv_id, ts) is a backward-looking Window (rowsBetween ... currentRow), the
backward as-of match, or the row itself.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from featureextraction_jl_spark.functions.moments import compute_moments, Moments
from featureextraction_jl_spark.functions.timeutil import epoch_seconds
from featureextraction_jl_spark.functions.pca import PCAModel, fit_pca, project_udf
from featureextraction_jl_spark.operators.sessionize import sessionize
from featureextraction_jl_spark.operators.backfill import forward_fill
from featureextraction_jl_spark.operators.asof import asof_join


@dataclass
class FeatureJobConfig:
    gap_seconds: float = 1800.0
    num_buckets: int = 64
    k: int = 8                      # PCA components
    mode: str = "pca_whiten"        # pca | pca_whiten | zca
    snap_dim: int = 16              # dim of snapshot vectors
    rolling_turns: int = 8
    cache_prepared: bool = False    # persist the pre-kernel frame between passes
    #: fit one model PER TUMBLING WINDOW of this duration (e.g. "1 hour")
    #: instead of one global model — the "windowed PCA/whitening features"
    #: path (plans/windowed_pca.py).  None = global model (default).
    window_duration: str | None = None
    #: with window_duration: project through the model fitted ``n`` windows
    #: EARLIER (strict point-in-time serving; first windows -> NULL).
    window_lag_models: int = 0


ORDER = ["ts", "turn_idx"]  # deterministic total order under duplicate ts


def assemble_raw_vector(df: DataFrame, cfg: FeatureJobConfig) -> DataFrame:
    """Backward-looking numeric raw vector per turn — pure Catalyst exprs.

    Components: log1p(char len), gap seconds to previous turn, session id,
    turn_idx, lag-1 char len, rolling mean char len, role flags, plus the
    as-of snapshot vector (zeros when no snapshot preceded this turn).
    ``char_len`` arrives precomputed from below the shuffle so the fit
    pass's pruned plan never carries text bytes through the exchange.
    """
    w = Window.partitionBy("conv_id").orderBy(*ORDER)
    wtrail = w.rowsBetween(-cfg.rolling_turns, 0)
    char_len = F.col("char_len")
    gap = epoch_seconds("ts") - F.lag(epoch_seconds("ts")).over(w)
    base = F.array(
        F.log1p(char_len),
        F.coalesce(F.log1p(gap), F.lit(0.0)),
        F.col("session_id").cast("double"),
        F.log1p(F.col("turn_idx").cast("double")),
        F.coalesce(F.log1p(F.lag(char_len, 1).over(w)), F.lit(0.0)),
        F.log1p(F.avg(char_len).over(wtrail)),
        F.when(F.col("role") == "assistant", 1.0).otherwise(0.0),
        F.when(F.col("role") == "tool", 1.0).otherwise(0.0),
        F.when(F.col("tool").isNotNull(), 1.0).otherwise(0.0),
    )
    zeros = F.array(*[F.lit(0.0)] * cfg.snap_dim)
    snap = F.coalesce(F.col("snap_vec"), zeros)
    return df.withColumn("raw_vec", F.concat(base, snap)).drop("char_len")


def build_turn_features(transcripts: DataFrame, snapshots: DataFrame | None,
                        cfg: FeatureJobConfig) -> DataFrame:
    """Everything before the statistical kernels — JVM-only plan.

    Operator order is chosen for shuffle reuse (see module docstring): the
    as-of union window performs the single hash(conv_id) exchange, and the
    sessionize/backfill/assemble windows inherit that clustering (sort-only).
    The operators are pairwise independent, so any order is semantically
    identical — this one is the cheapest physical plan.
    """
    # coalesce: a NULL text (legal per the schema) must yield char_len 0.0,
    # not a null raw_vec element — the Arrow moments path would render that
    # null as NaN and one such turn would poison the global covariance and
    # the fitted model for the entire run.
    df = transcripts.withColumn(
        "char_len", F.coalesce(F.length("text").cast("double"), F.lit(0.0)))
    if snapshots is not None:
        # Prune the snapshot side to the columns this job consumes BEFORE
        # the join (round-5 review): the as-of sweep carries the whole
        # right payload in one struct through the job's single full-data
        # Exchange+Sort, and the window aggregate blocks Catalyst
        # struct-field pruning — unused snapshot columns (snap_score)
        # would be shuffled for every row and then dropped.
        snapshots = snapshots.select("conv_id", "snapshot_ts", "snap_vec")
        # left_order=ORDER[1:]: fold turn_idx into the sweep's sort so the
        # sessionize/lag/backfill windows' (ts, turn_idx) ordering is already
        # delivered — Catalyst elides their Sort (one sort per pass, not two;
        # pinned by test_flagship_plan_invariants).
        df = asof_join(df, snapshots, on="conv_id", left_ts="ts",
                       right_ts="snapshot_ts", direction="backward",
                       left_order=tuple(ORDER[1:]))
    else:
        df = df.withColumn("snap_vec", F.lit(None).cast("array<double>"))
    df = sessionize(df, gap_seconds=cfg.gap_seconds, order=ORDER)
    df = forward_fill(df, "conv_id", ORDER, ["tool"])
    return assemble_raw_vector(df, cfg)


def run_features(transcripts: DataFrame, snapshots: DataFrame | None = None,
                 cfg: FeatureJobConfig | None = None,
                 model=None) -> tuple[DataFrame, "PCAModel"]:
    """Full flagship job; returns (features DataFrame, fitted model).

    Pass a pre-fitted ``model`` to skip the moment pass (transform-only mode,
    e.g. on resume or on a new day's partition).  With
    ``cfg.window_duration`` set, the fitted model is a
    :class:`~featureextraction_jl_spark.plans.windowed_pca.WindowedPCA`
    (one model per tumbling window) instead of a global PCAModel.
    """
    cfg = cfg or FeatureJobConfig()
    prepared = build_turn_features(transcripts, snapshots, cfg)

    if cfg.window_duration is not None:
        # Per-window models (north star's "windowed PCA/whitening features"):
        # same prepared chain, but the fit is per tumbling window and every
        # row projects through its OWN window's model (or an earlier one
        # with window_lag_models).  ``model`` may be a pre-fitted
        # WindowedPCA (transform-only mode, mirroring the global path).
        from featureextraction_jl_spark.plans.windowed_pca import (
            WindowedPCA,
            fit_windowed_pca,
            project_windowed,
        )

        if model is None:
            # Same two-pass shape as the global path (moment fit +
            # projection both traverse `prepared`), so the same opt-in
            # cache applies — but ONLY when fitting: a transform-only call
            # (pre-fitted model, e.g. once per resumable unit) traverses
            # the chain exactly once and would just leak a cached
            # text-heavy frame per unit.
            if cfg.cache_prepared:
                prepared = prepared.persist()
            model = fit_windowed_pca(prepared, "raw_vec", "ts",
                                     cfg.window_duration, k=cfg.k,
                                     mode=cfg.mode)
        elif not isinstance(model, WindowedPCA):
            raise TypeError(
                "window_duration is set but the pre-fitted model is a "
                f"global {type(model).__name__}; pass a WindowedPCA")
        out = project_windowed(prepared, model, "raw_vec", "ts",
                               out_col="feature_vec",
                               lag_models=cfg.window_lag_models).select(
            "conv_id", "turn_idx", "ts", "role", "text", "tool",
            "session_id", "feature_vec")
        return out, model

    from featureextraction_jl_spark.plans.windowed_pca import WindowedPCA

    if model is not None and isinstance(model, WindowedPCA):
        # symmetric twin of the windowed branch's TypeError (round-5
        # review): without it project_udf dies with an opaque
        # AttributeError instead of pointing at the missing
        # window_duration
        raise TypeError(
            "pre-fitted model is a WindowedPCA but window_duration is not "
            "set; set cfg.window_duration to the duration it was fitted "
            "with (or pass a global PCAModel)")
    if model is None:
        # Fit pass reads only raw_vec (column-pruned chain); the projection
        # pass recomputes the chain with the text payload.  Measured: caching
        # `prepared` costs more than recomputing the JVM chain because cache
        # population materializes the text-heavy rows; set
        # cfg.cache_prepared=True to trade memory for the second pass when
        # the chain is compute-bound instead (wide windows, many snapshots).
        if cfg.cache_prepared:
            prepared = prepared.persist()
        moments = compute_moments(prepared, "raw_vec")
        model = fit_pca(moments, k=cfg.k, mode=cfg.mode)
    # A/B (5 reps, 1.26M turns, local[32]): Arrow-batched project_udf median
    # 4.6s vs 7.7s for the p*k codegen expression (project_expr) — the BLAS
    # GEMM per Arrow batch wins even at p=25, so the UDF is the default.
    out = prepared.select(
        "conv_id", "turn_idx", "ts", "role", "text", "tool", "session_id",
        project_udf(model, "raw_vec").alias("feature_vec"),
    )
    return out, model
