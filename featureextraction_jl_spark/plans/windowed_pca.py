"""Per-window PCA/whitening models, end-to-end (VERDICT r04 next #1).

The flagship (plans/feature_job.py) fits ONE global model; this module
delivers the "windowed PCA/whitening features" phrase of the north star as a
per-window fit -> keyed projection pipeline:

    bucket rows into tumbling time windows (C7, optionally x extra keys)
        -> per-(keys, window) moment accumulation      [A3 grouped path]
        -> per-group eigh fit on the driver            [A5, p x p each]
        -> broadcast the model map, project each row
           through ITS OWN window's model              [A6, Arrow-batched]

Scale shape (the 100 TB argument):

* the grouped moment pass defaults to the SALTED two-stage plan for pure
  time windows (``salted_grouped_moments(salt_all=True)``: partials per
  (window, content salt) -> tiny per-window re-merge) because time-window
  groups are heavy by construction — a direct per-group applyInPandas
  would cap parallelism at the window count and materialize whole windows
  in single tasks.  Keyed windows (per-conversation) have bounded groups
  and use ``compute_grouped_moments`` directly;
* what reaches the driver is ONE (n, mean, m2) row per group — O(groups *
  p^2) bytes, never row data.  The eigh per group is p x p (p ~ tens), so
  10^4 windows fit in well under a second; ``max_models`` guards the driver
  against a mis-bucketed explosion (10^12 distinct groups) by raising with
  the count instead of OOMing mid-collect;
* projection ships the model map as an explicit ``sc.broadcast`` (once per
  executor, not per task — at 10^5 windows the map is ~100 MB) and runs ONE
  GEMM per (window, Arrow batch) slice — batches are grouped by window key
  in NumPy, never per-row Python.

Leakage property (test-pinned): a row's features depend ONLY on rows in its
own (keys, window) group — perturbing every other window leaves them
byte-identical.  Fit-and-project-within-window is the standard windowed-
model semantics; for strict point-in-time serving use the PREVIOUS window's
model (``lag_models=1``), which makes every input strictly older than the
row's window start (zero temporal leakage in the as-of sense).

Windows whose group has n < 2 rows have no covariance; their rows project
to NULL (SQL null semantics — poisoning or crashing are the alternatives,
and both are worse; count them via the returned manifest).  Rows with NULL
ts have no window: excluded from the fit, projected to NULL.

Group keys are computed as window-start EPOCH SECONDS with the same JVM
expression on the fit and projection sides (``epoch_seconds``), so the
model match is independent of both the driver OS timezone and the Spark
session timezone; the datetime in each model key is the naive-UTC label of
that epoch (see ``_win_dt``).  NULL extra keys (e.g. NULL conv_id) are real
groups on both sides: the fit keeps them (Spark groupBy semantics) and the
projection matches them (``dropna=False`` + NaN->None normalization).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from featureextraction_jl_spark.functions.moments import (
    Moments,
    compute_grouped_moments,
)
from featureextraction_jl_spark.functions.pca import PCAModel, fit_pca
from featureextraction_jl_spark.functions.timeutil import epoch_seconds

#: driver-side guard: refuse to collect more per-group moment rows than this
#: (a mis-bucketed group key at design scale would otherwise stream 10^12
#: tiny rows at the driver).  4 bytes * p^2 * 100k is still < 1 GB at p=50.
DEFAULT_MAX_MODELS = 100_000

_WIN = "__win_epoch"


def _win_dt(epoch: float):
    """Canonical model-key datetime for a window-start epoch: the naive-UTC
    rendering, derived ON THE DRIVER from the JVM-computed epoch seconds.

    Never derived from a ``collect()``-ed TimestampType value: Spark renders
    those via ``datetime.fromtimestamp`` in the DRIVER OS timezone, while the
    projection UDF sees the SESSION-timezone rendering — on any host whose OS
    timezone differs from the session's, keys built from collected timestamps
    would miss every UDF-side lookup and silently NULL the whole output.
    Keying both sides off ``epoch_seconds(...)`` (the same JVM expression)
    removes the timezone from the contract entirely; the datetime here is a
    human-facing label whose round-trip back to epoch
    (``pd.Timestamp(dt).value / 1e9``) is exact at microsecond granularity.
    """
    import datetime as _dt

    return _dt.datetime.fromtimestamp(
        epoch, _dt.timezone.utc).replace(tzinfo=None)


@dataclass
class WindowedPCA:
    """Fitted per-window models keyed by (extra keys..., window start).

    ``models``: dict mapping the group key tuple to a PCAModel; ``skipped``:
    groups with n < 2 (no covariance — their rows project to NULL).
    """

    models: dict
    skipped: dict
    duration: str
    key_cols: tuple
    #: rows accumulated per fitted group (manifests/metrics; not required
    #: for projection)
    counts: dict = None
    #: per-(applicationId, lag) broadcast of the projection lut, reused
    #: across project_windowed calls on the same fitted object — the
    #: resumable runner projects once PER UNIT, and re-broadcasting a
    #: ~100 MB model map 256 times would pile ~25 GB of never-destroyed
    #: broadcast blocks onto the block manager
    _bc_cache: dict = field(default_factory=dict, repr=False, compare=False)

    def save(self, dir_path: str) -> None:
        """Persist as a directory: one ``.npz`` per window model plus an
        ``index.json`` manifest (duration, key_cols, skipped, key->file map)
        — the windowed twin of ``PCAModel.save`` so a transform-only rerun
        (``run_features(model=WindowedPCA.load(...))``) skips the fit pass.

        Group-key serialization: JSON list, window start as ISO-8601.
        """
        import json
        import os

        os.makedirs(dir_path, exist_ok=True)
        counts = self.counts or {}
        index = {"duration": self.duration,
                 "key_cols": list(self.key_cols),
                 "skipped": [[_key_to_json(gk), n]
                             for gk, n in self.skipped.items()],
                 "models": []}
        for i, (gk, model) in enumerate(sorted(self.models.items(),
                                               key=lambda kv: str(kv[0]))):
            fname = f"model_{i:06d}.npz"
            model.save(os.path.join(dir_path, fname))
            index["models"].append([_key_to_json(gk), fname,
                                    counts.get(gk)])
        tmp = os.path.join(dir_path, "index.json.tmp")
        with open(tmp, "w") as f:
            json.dump(index, f)
        os.replace(tmp, os.path.join(dir_path, "index.json"))

    @staticmethod
    def load(dir_path: str) -> "WindowedPCA":
        import json
        import os

        with open(os.path.join(dir_path, "index.json")) as f:
            index = json.load(f)
        models, counts = {}, {}
        for jk, fname, n in index["models"]:
            gk = _key_from_json(jk)
            models[gk] = PCAModel.load(os.path.join(dir_path, fname))
            if n is not None:
                counts[gk] = n
        skipped = {_key_from_json(jk): n for jk, n in index["skipped"]}
        return WindowedPCA(models, skipped, index["duration"],
                           tuple(index["key_cols"]), counts)


def _key_to_json(gk: tuple) -> list:
    """Group key -> JSON-safe list; the trailing window start becomes ISO."""
    import datetime as _dt

    out = []
    for v in gk:
        if isinstance(v, _dt.datetime):
            out.append({"ts": v.isoformat()})
        else:
            out.append(v)
    return out


def _key_from_json(jk: list) -> tuple:
    import datetime as _dt

    return tuple(_dt.datetime.fromisoformat(v["ts"])
                 if isinstance(v, dict) and "ts" in v else v
                 for v in jk)


def _window_epoch(ts_col: str, duration: str) -> Column:
    """Window-start EPOCH SECONDS (double) — the timezone-free group key the
    fit AND the projection both compute with the same JVM expression.

    Computed ARITHMETICALLY (``floor(epoch / W) * W``), not via
    ``F.window(...)["start"]``: Spark's TimeWindowing analyzer rule injects
    an implicit ``Filter isnotnull(ts)`` into any plan containing a window
    expression — even wrapped in ``when()`` — which silently DROPPED every
    NULL-ts row from the projection output instead of projecting it to NULL
    (round-5 review, verified live).  The arithmetic form is NULL-preserving
    (epoch_seconds(NULL) -> NULL) and produces bit-identical window starts
    to ``F.window`` for fixed durations, including pre-1970 timestamps
    (mathematical floor; equivalence test-pinned).  Calendar durations
    (months) are not fixed-length and raise in ``_duration_seconds`` — a
    loud limit where the old path had a silent row-drop.
    """
    w = _duration_seconds(duration)
    e = epoch_seconds(F.col(ts_col) if isinstance(ts_col, str) else ts_col)
    return (F.floor(e / F.lit(w)) * F.lit(w)).cast("double")


def _norm_gk(v):
    """Normalize a pandas group-key component for model-map lookup: NaN/NaT
    (pandas' rendering of a NULL Spark key under ``dropna=False``) -> None,
    matching the ``None`` the fit side collects for NULL keys."""
    return None if pd.isna(v) else v


def fit_windowed_pca(df: DataFrame, vec_col: str, ts_col: str, duration: str,
                     key_cols: tuple | list = (), k: int | None = None,
                     mode: str = "pca_whiten",
                     max_models: int = DEFAULT_MAX_MODELS,
                     moments_strategy: str = "auto") -> WindowedPCA:
    """Fit one PCA/whitening model per (key_cols..., tumbling window).

    Only MOMENTS are distributed (one (n, mean, m2) row per group reaches
    the driver); each group's p x p eigh runs driver-side, mirroring the
    global fit (functions/pca.py).  Groups with n < 2 are recorded in
    ``skipped`` instead of fitted.

    ``moments_strategy`` picks the grouped-moment plan (both are exact —
    the Chan merge is associative; equivalence is test-pinned):

    * ``"salted"`` — two-stage via ``salted_grouped_moments(salt_all=True)``:
      partials per (window, content salt), tiny re-merge per window.  THE
      pure-time-window scale path: with key_cols=(), the groups are heavy
      by construction (a handful of windows x millions of rows each), so a
      direct applyInPandas would materialize whole windows in single tasks
      and cap parallelism at the window count.
    * ``"grouped"`` — direct ``compute_grouped_moments``: one applyInPandas
      task per group.  Right when key_cols makes groups small/numerous
      (per-conversation windows).
    * ``"auto"`` — salted when ``key_cols`` is empty, grouped otherwise.
    """
    key_cols = tuple(key_cols)
    # Group on the window-start EPOCH (double, JVM-computed) — never on a
    # collected TimestampType, whose driver rendering is OS-timezone-local
    # (see _win_dt).  Rows with NULL ts have no window: they are excluded
    # from the fit here and project to NULL (the family's null convention).
    bucketed = df.select(*key_cols,
                         _window_epoch(ts_col, duration).alias(_WIN),
                         vec_col).filter(F.col(_WIN).isNotNull())
    if moments_strategy == "auto":
        moments_strategy = "salted" if not key_cols else "grouped"
    if moments_strategy == "salted":
        if key_cols:
            raise ValueError(
                "moments_strategy='salted' supports pure time windows only "
                "(key_cols=()); keyed windows have bounded groups — use "
                "'grouped'")
        from featureextraction_jl_spark.plans.salting import (
            salted_grouped_moments,
        )
        grouped = salted_grouped_moments(bucketed, _WIN, vec_col,
                                         salt_all=True)
    elif moments_strategy == "grouped":
        grouped = compute_grouped_moments(bucketed, [*key_cols, _WIN], vec_col)
    else:
        raise ValueError(
            f"moments_strategy must be auto|salted|grouped, got "
            f"{moments_strategy!r}")
    # Bound the collect BEFORE it happens: limit(max_models + 1) makes the
    # guard itself O(max_models), not a second full count pass.
    rows = grouped.limit(max_models + 1).collect()
    if len(rows) > max_models:
        raise ValueError(
            f"fit_windowed_pca: more than max_models={max_models} "
            f"(key, window) groups — the driver-side per-group fit is "
            f"designed for time buckets (10^2-10^5 models), not per-entity "
            f"grouping at full cardinality; widen the window, drop key_cols, "
            f"or raise max_models explicitly")
    models, skipped, counts = {}, {}, {}
    seen = set()
    for r in rows:
        gk = tuple(r[c] for c in key_cols) + (_win_dt(r[_WIN]),)
        if gk in seen:
            # Two JVM-side groups collapsed to one key: Spark's groupBy
            # distinguishes NULL from float NaN, but the pandas->Arrow
            # emission of the group kernels renders a NaN key as NULL — a
            # corpus with BOTH in one window would silently overwrite one
            # group's model with the other's.  (NaN-only float keys are
            # fine: they collapse to the NULL group consistently on the fit
            # AND projection sides.)  Fail loudly.
            raise ValueError(
                f"fit_windowed_pca: duplicate group key {gk!r} after key "
                f"normalization — typically a float key column containing "
                f"BOTH NULL and NaN in one window (indistinguishable in "
                f"the Arrow/pandas kernels); filter or recode such keys "
                f"upstream")
        seen.add(gk)
        mean = np.asarray(r["mean"], dtype=np.float64)
        p = mean.shape[0]
        m = Moments(int(r["n"]), mean,
                    np.asarray(r["m2"], dtype=np.float64).reshape(p, p))
        if m.n < 2:
            skipped[gk] = m.n
            continue
        models[gk] = fit_pca(m, k=k, mode=mode)
        counts[gk] = m.n
    return WindowedPCA(models, skipped, duration, key_cols, counts)


def project_windowed(df: DataFrame, fitted: WindowedPCA, vec_col: str,
                     ts_col: str, out_col: str = "feature_vec",
                     lag_models: int = 0) -> DataFrame:
    """Project each row through ITS window's model (Arrow-batched).

    One pandas UDF over (key cols..., window start, vec): each batch is
    sliced per distinct group key and projected with one GEMM per slice.
    Rows whose group has no model (n < 2, or — with ``lag_models`` — a
    window with no predecessor) get NULL.

    ``lag_models=n``: use the model fitted on the window n steps EARLIER
    (strict point-in-time serving: every model input is older than the
    row's window start).  Requires a fixed-duration window (e.g. "1 hour",
    not calendar months).
    """
    key_cols = fitted.key_cols
    # Model lookup keyed by (keys..., window-start epoch seconds).  The
    # model-key datetime is naive-UTC BY CONSTRUCTION (_win_dt derives it
    # from the JVM epoch), so pd.Timestamp(...).value recovers that epoch
    # exactly; the UDF side receives the SAME JVM expression's value
    # (epoch_seconds over the window start) as a double — no timezone, OS
    # or session, participates in the match on either side.
    if lag_models < 0:
        raise ValueError(
            f"lag_models must be >= 0, got {lag_models}: a negative lag "
            f"serves each row through a FUTURE window's model — exactly "
            f"the temporal leakage the lag exists to prevent")
    lag_s = 0.0
    if lag_models:
        lag_s = lag_models * _duration_seconds(fitted.duration)
    # Explicit sc.broadcast, NOT the closure: a closure-captured map is
    # re-serialized into every task binary, so at max_models=10^5 windows
    # (~10^5 * p*k doubles ~ 100 MB) every task ships the whole model map.
    # The broadcast moves it once per EXECUTOR over the torrent protocol;
    # the closure carries only the handle.  Cached per (app, lag) on the
    # fitted object so per-unit resumable calls reuse ONE broadcast.
    sc = df.sparkSession.sparkContext
    bc_key = (sc.applicationId, lag_s)
    bc = fitted._bc_cache.get(bc_key)
    if bc is None:
        lut = {}
        for gk, model in fitted.models.items():
            key = gk[:-1] + (pd.Timestamp(gk[-1]).value / 1e9 + lag_s,)
            lut[key] = (model.mu, model.projection)
        bc = sc.broadcast(lut)
        fitted._bc_cache[bc_key] = bc

    @F.pandas_udf(ArrayType(DoubleType()))
    def _project(*cols: pd.Series) -> pd.Series:
        models = bc.value
        *keys, win, vecs = cols
        out = pd.Series([None] * len(vecs), dtype=object, index=vecs.index)
        # ``win`` is already epoch seconds (double, JVM-computed); NaN for
        # NULL ts rows.  Those rows can never match a model (the fit
        # filters NULL windows), so exclude them from the groupby up front:
        # besides being dead work, a NaN in a SINGLE-column groupby
        # (key_cols=()) raises 'Categorical categories cannot be null'
        # under dropna=False in pandas 2.x (round-5 review) — their output
        # stays the initialized None.
        gk_frame = pd.DataFrame({i: k for i, k in enumerate(keys)} |
                                {"__w": win})
        gk_frame = gk_frame[win.notna()]
        valid = vecs.notna()
        # dropna=False: a NULL extra key (e.g. NULL conv_id) is a real group
        # on the fit side (Spark groupBy keeps it) — the pandas default
        # would silently drop those rows from projection, NULLing them while
        # the manifest says their model exists.
        for gk, idx in gk_frame.groupby(list(gk_frame.columns),
                                        dropna=False).groups.items():
            gk = gk if isinstance(gk, tuple) else (gk,)
            mw = models.get(tuple(_norm_gk(v) for v in gk))
            if mw is None:
                continue
            mu, w = mw
            take = idx[valid.loc[idx]]
            if len(take) == 0:
                continue
            x = np.stack(vecs.loc[take].to_numpy()).astype(np.float64)
            # vectors with a null ELEMENT arrive as NaN rows: project them
            # to NULL like the fit side dropped them (pandas_clean_stack) —
            # an unmasked NaN row would emit NaN features that pass a
            # feature_vec IS NULL filter downstream
            good = ~np.isnan(x).any(axis=1)
            take = take[good]
            if len(take) == 0:
                continue
            out.loc[take] = pd.Series(list((x[good] - mu) @ w), index=take)
        return out

    win_col = _window_epoch(ts_col, fitted.duration)
    args = [F.col(c) for c in key_cols] + [win_col, F.col(vec_col)]
    return df.withColumn(out_col, _project(*args))


def _duration_seconds(duration: str) -> float:
    """Seconds in a fixed-length window duration string.

    Accepts everything fixed-length that ``F.window`` does (round-5 review:
    the old two-token parser crashed on compound strings like
    '1 hour 30 minutes' and mis-reported capitalized units): any sequence
    of ``<int> <unit>`` pairs, case-insensitive, optional plural, down to
    microseconds.  Calendar units (month, year) are not fixed-length and
    raise — per-window models key on a fixed window width."""
    mult = {"microsecond": 1e-6, "millisecond": 1e-3, "second": 1.0,
            "minute": 60.0, "hour": 3600.0, "day": 86400.0,
            "week": 604800.0}
    toks = duration.split()
    if not toks or len(toks) % 2:
        raise ValueError(
            f"windowed models need a fixed-duration window like "
            f"'30 minutes' or '1 hour 30 minutes', got {duration!r}")
    total = 0.0
    for qty, unit in zip(toks[::2], toks[1::2]):
        u = unit.lower().rstrip("s")
        if u not in mult:
            raise ValueError(
                f"windowed models need a fixed-duration window "
                f"(second/minute/hour/day/week...), got {duration!r} — "
                f"calendar units are not fixed-length")
        total += float(qty) * mult[u]
    if total <= 0:
        raise ValueError(f"window duration must be positive, got "
                         f"{duration!r}")
    return total


def run_windowed_features(df: DataFrame, vec_col: str, ts_col: str,
                          duration: str, key_cols: tuple | list = (),
                          k: int | None = None, mode: str = "pca_whiten",
                          out_col: str = "feature_vec",
                          lag_models: int = 0,
                          max_models: int = DEFAULT_MAX_MODELS
                          ) -> tuple[DataFrame, WindowedPCA]:
    """Fit per-window models and project every row through its own window's
    (or, with ``lag_models``, a strictly earlier window's) model.

    Returns (df + out_col, fitted) — the fitted map doubles as the model
    manifest (persist each PCAModel via .save / plans/checkpoint.py).
    """
    fitted = fit_windowed_pca(df, vec_col, ts_col, duration, key_cols,
                              k=k, mode=mode, max_models=max_models)
    out = project_windowed(df, fitted, vec_col, ts_col, out_col,
                           lag_models=lag_models)
    return out, fitted
