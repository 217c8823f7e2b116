"""End-to-end flagship job gates (SURVEY.md §5.2.2, §5.2.4):
leakage-free, byte-equal text passthrough, salting equivalence."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from featureextraction_jl_spark.functions.moments import compute_grouped_moments
from featureextraction_jl_spark.plans import (
    FeatureJobConfig,
    run_features,
    salted_grouped_moments,
)
from featureextraction_jl_spark.sources import generate_transcripts, generate_snapshots

CFG = FeatureJobConfig(snap_dim=4, k=5, num_buckets=8)


@pytest.fixture(scope="module")
def data(spark):
    t = generate_transcripts(spark, num_convs=40, seed=42, max_turns=200,
                             mega_turns=600).cache()
    s = generate_snapshots(spark, num_convs=40, seed=42, dim=4).cache()
    t.count(), s.count()
    return t, s


def text_digest(pdf: pd.DataFrame) -> str:
    pdf = pdf.sort_values(["conv_id", "turn_idx"], kind="stable")
    h = hashlib.sha256()
    for t in pdf["text"]:
        h.update(t.encode("utf-8"))
        h.update(b"\x00")
    return h.hexdigest()


def test_flagship_runs_and_passthrough(spark, data):
    t, s = data
    out, model = run_features(t, s, CFG)
    out_pdf = out.select("conv_id", "turn_idx", "text").toPandas()
    in_pdf = t.select("conv_id", "turn_idx", "text").toPandas()
    # byte-equal text passthrough under stable (conv_id, turn_idx) order
    assert text_digest(out_pdf) == text_digest(in_pdf)
    assert out.count() == t.count()
    assert model.components.shape[1] == CFG.k
    first = out.select("feature_vec").first()[0]
    assert len(first) == CFG.k


def test_flagship_whitened_cov_identity(spark, data):
    t, s = data
    out, _ = run_features(t, s, CFG)
    y = np.stack(out.select("feature_vec").toPandas()["feature_vec"].to_numpy())
    np.testing.assert_allclose(np.cov(y, rowvar=False, ddof=1), np.eye(CFG.k),
                               rtol=1e-6, atol=1e-8)


def test_flagship_leakage_free(spark, data):
    """§1.4.10: truncate input to ts <= cut, refit nothing (reuse model),
    recompute — vectors at surviving (conv_id, ts) must be identical."""
    t, s = data
    out, model = run_features(t, s, CFG)
    cut = t.agg(F.percentile_approx("ts", 0.6)).collect()[0][0]

    t_cut = t.filter(F.col("ts") <= F.lit(cut))
    s_cut = s.filter(F.col("snapshot_ts") <= F.lit(cut))
    out_cut, _ = run_features(t_cut, s_cut, CFG, model=model)

    key = ["conv_id", "turn_idx"]
    full = out.filter(F.col("ts") <= F.lit(cut)).select(
        *key, "feature_vec").toPandas().set_index(key).sort_index()
    trunc = out_cut.select(*key, "feature_vec").toPandas().set_index(key).sort_index()
    assert len(full) == len(trunc)
    a = np.stack(full["feature_vec"].to_numpy())
    b = np.stack(trunc["feature_vec"].to_numpy())
    np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-10)


def test_salting_equivalence(spark, data):
    t, s = data
    from featureextraction_jl_spark.plans.feature_job import build_turn_features
    prepared = build_turn_features(t, s, CFG).select("conv_id", "raw_vec")
    plain = {r["conv_id"]: r for r in
             compute_grouped_moments(prepared, ["conv_id"], "raw_vec").collect()}
    salted = {r["conv_id"]: r for r in
              salted_grouped_moments(prepared, "conv_id", "raw_vec",
                                     heavy_threshold=100, num_salts=8,
                                     sample_fraction=None).collect()}
    assert plain.keys() == salted.keys()
    for k in plain:
        assert plain[k]["n"] == salted[k]["n"]
        np.testing.assert_allclose(plain[k]["mean"], salted[k]["mean"],
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(plain[k]["m2"], salted[k]["m2"],
                                   rtol=1e-8, atol=1e-8)


def test_flagship_null_text_does_not_poison_model(spark, data):
    """A NULL text (legal per the schema) must behave as char_len 0, not
    inject a null raw_vec element — one such element becomes NaN in the
    Arrow moments path and poisons the global covariance / fitted model."""
    t, s = data
    t_null = t.withColumn(
        "text", F.when(F.col("turn_idx") % 97 == 3, None)
                 .otherwise(F.col("text")))
    n_nulled = t_null.filter(F.col("text").isNull()).count()
    assert n_nulled > 0  # the planted rows exist
    out, model = run_features(t_null, s, CFG)
    assert np.isfinite(model.components).all()
    assert np.isfinite(model.mu).all()
    y = np.stack(out.select("feature_vec").toPandas()["feature_vec"].to_numpy())
    assert np.isfinite(y).all()          # every row, nulled ones included
    assert out.count() == t.count()      # no rows silently dropped


def test_salting_null_and_nonstring_key(spark):
    """NULL as the dominant skew key must be salted (isin() is NULL-valued
    for a NULL key), and a bigint key must not Arrow-mismatch the partial
    schema — both verified against the unsalted twin."""
    rng = np.random.default_rng(11)
    rows = [(None if i < 300 else int(i % 3),
             [float(x) for x in rng.normal(size=4)]) for i in range(400)]
    df = spark.createDataFrame(rows, "k long, vec array<double>")
    plain = {r["k"]: r for r in
             compute_grouped_moments(df, ["k"], "vec").collect()}
    salted = {r["k"]: r for r in
              salted_grouped_moments(df, "k", "vec", heavy_threshold=50,
                                     num_salts=8,
                                     sample_fraction=None).collect()}
    assert plain.keys() == salted.keys() and None in plain
    for k in plain:
        assert plain[k]["n"] == salted[k]["n"], k
        np.testing.assert_allclose(plain[k]["mean"], salted[k]["mean"],
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(plain[k]["m2"], salted[k]["m2"],
                                   rtol=1e-8, atol=1e-8)


def test_flagship_plan_invariants(spark, data):
    """SURVEY.md §4 plan promises, pinned so refactors can't regress them.

    * at most 3 Exchanges in the projection-pass plan (the as-of union
      window's hash(conv_id) exchange is the only FULL-data one; anything
      extra would re-shuffle 10^12 turns at scale);
    * no BatchEvalPython (row-at-a-time Python) anywhere — the only Python
      is the Arrow-batched projection (ArrowEvalPython);
    * the windows after the as-of reuse its clustering: every Sort beyond
      the exchange is sort-only (no hashpartitioning re-introduction).
    """
    t, s = data
    out, _model = run_features(t, s, CFG)
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange")
    assert n_exchanges <= 3, f"plan has {n_exchanges} Exchanges:\n{plan[:4000]}"
    assert "BatchEvalPython" not in plan, "row-at-a-time Python crept in"
    assert "ArrowEvalPython" in plan, "projection should be Arrow-batched"
    # ONE sort total: the as-of sweep's (key, ts, left_order, side) sort is
    # the only one — sessionize/lag/backfill/assembly orderings are prefixes
    # of it (asof_join left_order), so Catalyst elides their Sorts.  A second
    # Sort here means a full re-sort of every turn per pass at scale.
    import re
    n_sorts = len(re.findall(r"\bSort \[", plan))
    assert n_sorts <= 1, f"plan has {n_sorts} Sorts:\n{plan[:4000]}"


def test_scan_pushdown_and_pruning(spark, sf01_dir):
    """Filters and projection reach the parquet scan (SURVEY.md §4)."""
    li = spark.read.parquet(f"{sf01_dir}/lineitem.parquet")
    q = (li.filter(F.col("l_quantity") < 10)
         .select("l_orderkey", "l_quantity"))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "LessThan(l_quantity" in plan, plan[:2000]
    # column pruning: the scan schema carries only the 2 referenced columns
    import re
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan[:2000]
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"l_orderkey", "l_quantity"}, cols


def test_detect_heavy_keys_sampled_default_and_bounded_collect(spark):
    """VERDICT r04 "what's wrong" #3: the heavy-key probe must (a) SAMPLE by
    default — never a full unsampled groupBy count before the real job —
    (b) bound the collected list at max_keys (heaviest first), and (c) stay
    deterministic (seeded sample)."""
    import inspect

    from featureextraction_jl_spark.plans.salting import detect_heavy_keys

    sig = inspect.signature(detect_heavy_keys)
    assert sig.parameters["sample_fraction"].default not in (None, 0)  # (a)

    # 10^5-row degenerate corpus: one dominant key (60%) + 20 medium keys.
    # The dominant key must be detected from the 5% sample; bounded time.
    df = spark.range(100_000).select(
        F.when(F.col("id") % 10 < 6, F.lit("mega"))
         .otherwise(F.concat(F.lit("k"), (F.col("id") % 20).cast("string")))
         .alias("k"))
    got = detect_heavy_keys(df, "k", threshold_rows=10_000)
    assert "mega" in got
    assert got == detect_heavy_keys(df, "k", threshold_rows=10_000)  # (c)

    # (b) every key exceeds the threshold, but only the max_keys heaviest
    # are collected, ordered heaviest-first
    skew = spark.range(10_000).select(
        (F.col("id") % 10).alias("k")).withColumn(
        "k", F.col("k").cast("string"))
    top = detect_heavy_keys(skew, "k", threshold_rows=1,
                            sample_fraction=None, max_keys=3)
    assert len(top) == 3


def test_salted_moments_degenerate_corpus_sampled_probe(spark):
    """10^5 rows funneled into ONE key: the sampled probe must flag it and
    the salted two-stage path must equal the unsalted grouped moments
    exactly (Chan merge) — in bounded time."""
    df = spark.range(100_000).select(
        F.lit("all").alias("k"),
        F.array((F.col("id") % 97).cast("double"),
                (F.col("id") % 13).cast("double")).alias("vec"))
    plain = compute_grouped_moments(df, ["k"], "vec").collect()[0]
    salted = salted_grouped_moments(df, "k", "vec", heavy_threshold=10_000,
                                    num_salts=8).collect()[0]
    assert plain["n"] == salted["n"] == 100_000
    np.testing.assert_allclose(plain["mean"], salted["mean"], rtol=1e-10)
    np.testing.assert_allclose(plain["m2"], salted["m2"], rtol=1e-8)


def test_flagship_windowed_models_option(spark, data):
    """cfg.window_duration: the flagship fits one model PER TUMBLING WINDOW
    and every row projects through its own window's model — verified via
    the Mahalanobis invariant against an independent NumPy fit on exactly
    that window's raw_vec rows (the q35 trick, per window)."""
    import datetime as dt

    from featureextraction_jl_spark.plans.feature_job import build_turn_features
    from featureextraction_jl_spark.plans.windowed_pca import WindowedPCA

    t, s = data
    cfg = FeatureJobConfig(snap_dim=4, k=None, mode="pca_whiten",
                           num_buckets=8, window_duration="7 days")
    out, fitted = run_features(t, s, cfg)
    assert isinstance(fitted, WindowedPCA)
    assert len(fitted.models) > 1  # data genuinely spans several windows

    raw = build_turn_features(t, s, CFG).select(
        "conv_id", "turn_idx", "ts", "raw_vec").toPandas()
    feats = out.select("conv_id", "turn_idx", "feature_vec").toPandas()
    pdf = raw.merge(feats, on=["conv_id", "turn_idx"], validate="1:1")
    assert pdf["feature_vec"].notna().all()
    eps = 1e-12
    n_checked = 0
    for w, grp in pdf.groupby(pdf["ts"].dt.floor("7D")):
        X = np.stack(grp["raw_vec"].to_numpy())
        if len(X) < 2:
            continue
        mu = X.mean(axis=0)
        cov = np.cov(X, rowvar=False, ddof=1)
        p = X.shape[1]
        sample = grp.head(25)
        for _, r in sample.iterrows():
            x = np.asarray(r["raw_vec"])
            y = np.asarray(r["feature_vec"])
            want = float((x - mu) @ np.linalg.solve(cov + eps * np.eye(p),
                                                    x - mu))
            np.testing.assert_allclose(y @ y, want, rtol=1e-5, atol=1e-6)
            n_checked += 1
    assert n_checked >= 50



def test_flagship_windowed_plan_invariants(spark, data):
    """The windowed projection pass must keep the global flagship's plan
    shape: the as-of union window's hash(conv_id) exchange stays the only
    full-data shuffle (window-start derivation and the keyed projection are
    NARROW — no extra Exchange, no extra Sort, no row-at-a-time Python)."""
    import re

    t, s = data
    cfg = FeatureJobConfig(snap_dim=4, k=None, mode="pca_whiten",
                           num_buckets=8, window_duration="7 days")
    out, _fitted = run_features(t, s, cfg)
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange")
    assert n_exchanges <= 3, f"plan has {n_exchanges} Exchanges:\n{plan[:4000]}"
    assert "BatchEvalPython" not in plan, "row-at-a-time Python crept in"
    assert "ArrowEvalPython" in plan, "projection should be Arrow-batched"
    n_sorts = len(re.findall(r"\bSort \[", plan))
    assert n_sorts <= 1, f"plan has {n_sorts} Sorts:\n{plan[:4000]}"


def test_detect_heavy_keys_warns_when_probe_blind(spark):
    """threshold*fraction < 10 makes borderline keys statistically invisible
    to the sampled probe — it must say so instead of silently missing them."""
    import warnings

    from featureextraction_jl_spark.plans.salting import detect_heavy_keys

    df = spark.range(1000).select((F.col("id") % 5).cast("string").alias("k"))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        detect_heavy_keys(df, "k", threshold_rows=50, sample_fraction=0.05)
    assert any("statistically invisible" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        detect_heavy_keys(df, "k", threshold_rows=50, sample_fraction=None)
        detect_heavy_keys(df, "k", threshold_rows=10_000, sample_fraction=0.05)
    assert not any("statistically invisible" in str(x.message) for x in w)


def test_global_path_rejects_windowed_model_without_duration(spark, data):
    """Passing a pre-fitted WindowedPCA with window_duration unset must
    raise the symmetric TypeError (round-5 review: it previously died in
    project_udf with an opaque AttributeError that never mentioned
    window_duration)."""
    import pytest

    from featureextraction_jl_spark.plans.feature_job import (
        FeatureJobConfig,
        run_features,
    )
    from featureextraction_jl_spark.plans.windowed_pca import WindowedPCA

    t, s = data
    fake = WindowedPCA({}, {}, "1 hour", ())
    with pytest.raises(TypeError, match="window_duration"):
        run_features(t, s, CFG, model=fake)
