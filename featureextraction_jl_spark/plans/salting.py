"""Skew salting for the grouped-moment aggregation path (SURVEY.md §2 E1).

AQE splits skewed JOIN partitions but not skewed groupBy keys; the
mega-conversation would otherwise materialize as ONE applyInPandas group.
Because moments are associative/commutative under the Chan merge
(functions/moments.py), salting is *exact*:

    heavy keys get salt = pmod(xxhash64(salt_src), num_salts)
    -> partial moments per (key, salt)            [bounded group size]
    -> re-merge partials per key                  [<= num_salts rows/key]

Heavy-key detection is a sampled count — at 100 TB that is a cheap
approximate groupBy over a fraction, broadcast back as a set.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featureextraction_jl_spark.functions.moments import (
    merge_moment_rows,
)


def detect_heavy_keys(df: DataFrame, key: str, threshold_rows: int,
                      sample_fraction: float | None = 0.05,
                      max_keys: int = 4096,
                      seed: int = 42) -> list:
    """Keys whose (estimated) row count exceeds the threshold.

    Defaults are the SCALE-SAFE path (VERDICT r04 "what's wrong" #3):

    * ``sample_fraction=0.05`` — the probe counts a seeded 5% sample and
      scales up, so it shuffles ~f rows per distinct key instead of one,
      and never scans the full input before the real job starts.  Pass
      ``None`` for the exact full count (tiny inputs / tests).  Estimator
      error: a key with true count t appears in the sample ~Binomial(t, f),
      so the estimate's relative sd is sqrt((1-f)/(t*f)) — ~9% at the
      default 100k-row threshold — and misclassification only happens for
      keys within a few sd of the threshold.  Salting stays EXACT either
      way (the Chan merge is associative): a missed heavy key costs one
      oversized applyInPandas group, a false positive costs <= num_salts
      extra partial rows.  Keys with t*f < ~10 are statistically invisible,
      so keep ``threshold_rows * sample_fraction >> 1``.
    * ``max_keys`` — the collected list is bounded: the TOP max_keys keys
      by estimated count (heaviest first), not an unbounded collect, so a
      pathological key distribution cannot OOM the driver.  4096 keys
      x num_salts=32 partials is plenty of salt coverage; anything beyond
      that many "heavy" keys means the threshold is mis-set.
    """
    if sample_fraction and threshold_rows * sample_fraction < 10:
        # a key at the threshold appears ~Binomial(threshold, f) times in
        # the sample; expectation < 10 means borderline-heavy keys are
        # near-invisible and the probe silently under-detects
        import warnings

        warnings.warn(
            f"detect_heavy_keys: threshold_rows*sample_fraction = "
            f"{threshold_rows * sample_fraction:.1f} < 10 — keys near the "
            f"threshold are statistically invisible to the sampled probe; "
            f"raise sample_fraction or pass sample_fraction=None for an "
            f"exact count", stacklevel=2)
    src = df.sample(sample_fraction, seed=seed) if sample_fraction else df
    scale = 1.0 / sample_fraction if sample_fraction else 1.0
    counts = src.groupBy(key).agg((F.count(F.lit(1)) * F.lit(scale)).alias("n"))
    rows = (counts.filter(F.col("n") > threshold_rows)
            .orderBy(F.col("n").desc())
            .limit(max_keys)
            .collect())
    return [r[key] for r in rows]


def salted_grouped_moments(df: DataFrame, key: str, vec_col: str,
                           heavy_threshold: int = 100_000,
                           num_salts: int = 32,
                           sample_fraction: float | None = 0.05,
                           salt_all: bool = False) -> DataFrame:
    """Per-key moments with exact skew salting.

    Returns (key, n, mean array<double>, m2 array<double>) — identical to
    ``compute_grouped_moments`` output (equivalence is test-pinned).

    The heavy-key probe SAMPLES by default (see :func:`detect_heavy_keys`
    — the scale-safe default); the moments stay exact under any detection
    outcome because salting only changes the partial grouping, never the
    Chan-merged total.  Pass ``sample_fraction=None`` on tiny inputs where
    a 5% sample is too small to see the threshold.

    ``salt_all=True`` skips the probe entirely and salts EVERY row — for
    keys that are heavy BY CONSTRUCTION (tumbling time windows: a handful
    of groups each holding millions of rows, plans/windowed_pca.py).  The
    partial stage then has key-cardinality x num_salts bounded groups and
    full parallelism instead of one applyInPandas task per giant group.
    """
    heavy = [] if salt_all else detect_heavy_keys(df, key, heavy_threshold,
                                                  sample_fraction)
    # Null-safe heavy test: isin() is NULL (not false) for a NULL key and
    # for a list containing None, and NULL is a classic dominant skew key —
    # falling through to salt=0 would funnel the whole null group into ONE
    # applyInPandas worker, exactly what salting exists to prevent.
    heavy_nonnull = [k for k in heavy if k is not None]
    is_heavy = F.col(key).isin(heavy_nonnull) if heavy_nonnull else F.lit(False)
    if any(k is None for k in heavy):
        is_heavy = is_heavy | F.col(key).isNull()
    # Deterministic, content-derived salt: monotonically_increasing_id is
    # position-dependent, so a task retry after a fetch failure could
    # re-salt rows differently and double/zero-count them in the shuffled
    # aggregation (the SPARK-23207 failure class).  Hashing the row content
    # gives every recomputation the same salt; duplicate rows sharing a
    # salt is harmless (moments are summed) and does not concentrate load
    # unless the same exact row repeats ~group-size times.
    content_salt = F.pmod(F.xxhash64(F.col(key), F.col(vec_col), F.lit(17)),
                          F.lit(num_salts)).cast("int")
    if salt_all:
        salt = content_salt
    elif heavy:
        salt = (F.when(F.coalesce(is_heavy, F.lit(False)), content_salt)
                .otherwise(F.lit(0)).cast("int"))
    else:
        salt = F.lit(0)
    salted = df.select(key, F.col(vec_col).alias("__vec"), salt.alias("__salt"))

    # stage 1: bounded partials per (key, salt)
    def partial(pdf_key, pdf: pd.DataFrame) -> pd.DataFrame:
        # pandas_clean_stack: NULL vectors and null-element vectors dropped,
        # ragged groups raise — SHARED with compute_grouped_moments so the
        # test-pinned equivalence of the two plans holds by construction.
        from featureextraction_jl_spark.functions.moments import (
            pandas_clean_stack,
        )

        x = pandas_clean_stack(pdf["__vec"])
        if x is None:
            return pd.DataFrame({c: pd.Series([], dtype=object)
                                 for c in [key, "n", "mean", "m2"]})
        n = x.shape[0]
        mean = x.mean(axis=0)
        xc = x - mean
        return pd.DataFrame({
            key: [pdf_key[0]],
            "n": [n],
            "mean": [mean.tolist()],
            "m2": [(xc.T @ xc).ravel().tolist()],
        })

    # Key type derived from the frame, not hardcoded: a literal "string"
    # would Arrow-type-mismatch at runtime for bigint/date keys (the bug
    # class streaming/state.py fixed the same way).
    key_type = dict(df.dtypes)[key]
    partial_schema = (f"{key} {key_type}, n long, "
                      f"mean array<double>, m2 array<double>")
    partials = salted.groupBy(key, "__salt").applyInPandas(partial, partial_schema)

    # stage 2: re-merge per key (<= num_salts tiny rows each)
    def remerge(pdf_key, pdf: pd.DataFrame) -> pd.DataFrame:
        # shared decode+fold (merge_moment_rows): the partial-row format
        # lives in ONE place across the driver/bucketed/salted paths
        acc = merge_moment_rows(row for _, row in pdf.iterrows())
        return pd.DataFrame({
            key: [pdf_key[0]], "n": [acc.n],
            "mean": [acc.mean.tolist()], "m2": [acc.m2.ravel().tolist()],
        })

    return partials.groupBy(key).applyInPandas(remerge, partial_schema)
