"""E3 checkpoint/resume: kill-resume equivalence + manifest protocol."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from featureextraction_jl_spark.plans import FeatureJobConfig, run_features
from featureextraction_jl_spark.plans.checkpoint import (
    SimulatedCrash,
    config_hash,
    input_fingerprint,
    read_feature_output,
    run_features_resumable,
)
from featureextraction_jl_spark.sources import generate_snapshots, generate_transcripts

CFG = FeatureJobConfig(num_buckets=8, k=4, snap_dim=16)
N_UNITS = 4


@pytest.fixture(scope="module")
def inputs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("ckpt_inputs")
    tdir, sdir = str(base / "transcripts"), str(base / "snapshots")
    generate_transcripts(spark, 150, seed=7, max_turns=60, mega_turns=400) \
        .write.parquet(tdir)
    generate_snapshots(spark, 150, seed=7, dim=16).write.parquet(sdir)
    return tdir, sdir


def _collect(df):
    rows = df.select("conv_id", "turn_idx", "text", "feature_vec") \
        .orderBy("conv_id", "turn_idx").collect()
    vecs = np.array([r.feature_vec for r in rows])
    keys = [(r.conv_id, r.turn_idx, r.text) for r in rows]
    return keys, vecs


@pytest.fixture(scope="module")
def direct(spark, inputs):
    tdir, sdir = inputs
    out, _ = run_features(spark.read.parquet(tdir),
                          spark.read.parquet(sdir), CFG)
    return _collect(out)


def test_resumable_equals_direct(spark, inputs, direct, tmp_path):
    tdir, sdir = inputs
    out = str(tmp_path / "out")
    job = run_features_resumable(spark, tdir, out, sdir, CFG, n_units=N_UNITS)

    k1, v1 = _collect(read_feature_output(spark, out))
    k2, v2 = direct
    assert k1 == k2                      # byte-equal text, identical ordering
    np.testing.assert_allclose(v1, v2, rtol=1e-8, atol=1e-10)
    assert job["rows"] == len(k1)
    assert sorted(job["units_computed_this_run"]) == list(range(N_UNITS))


def test_kill_then_resume(spark, inputs, direct, tmp_path):
    tdir, sdir = inputs
    out = str(tmp_path / "out")
    with pytest.raises(SimulatedCrash):
        run_features_resumable(spark, tdir, out, sdir, CFG, n_units=N_UNITS,
                               fail_after_units=2)
    # crash left exactly 2 unit manifests + the fit manifest behind
    mdir = os.path.join(out, "_manifest")
    done = sorted(f for f in os.listdir(mdir) if f.startswith("unit_"))
    assert len(done) == 2
    assert os.path.exists(os.path.join(mdir, "model.npz"))

    job = run_features_resumable(spark, tdir, out, sdir, CFG, n_units=N_UNITS)
    assert len(job["units_resumed"]) == 2        # crashed units were kept
    assert len(job["units_computed_this_run"]) == 2

    k1, v1 = _collect(read_feature_output(spark, out))
    k2, v2 = direct
    assert k1 == k2
    np.testing.assert_allclose(v1, v2, rtol=1e-8, atol=1e-10)

    with open(os.path.join(mdir, "job.json")) as f:
        man = json.load(f)
    assert man["rows"] == len(k1)
    assert set(man["wall_s_per_unit"]) == {str(u) for u in range(N_UNITS)}


def test_manifest_invalidation_keys():
    # config changes and input changes must invalidate manifests
    assert config_hash(CFG, 4) != config_hash(CFG, 8)
    assert config_hash(CFG, 4) != config_hash(FeatureJobConfig(num_buckets=8, k=5), 4)
    assert input_fingerprint("/root/testdata/sf0.001") \
        != input_fingerprint("/root/testdata/sf0.01")
    # ...but pure performance knobs must NOT (round-5 review: toggling
    # cache_prepared between a run and its resume invalidated every
    # manifest and recomputed byte-identical outputs from scratch)
    import dataclasses
    assert config_hash(CFG, 4) == config_hash(
        dataclasses.replace(CFG, cache_prepared=not CFG.cache_prepared), 4)


def test_shrinking_n_units_removes_stale_outputs(spark, inputs, direct, tmp_path):
    """Re-running with a smaller n_units must delete the old split's
    unit=k (k >= new n_units) dirs — read_feature_output's unit=* glob
    would otherwise union the old and new splits, duplicating rows while
    job.json reports clean totals."""
    import shutil as _sh

    tdir, sdir = inputs
    out = str(tmp_path / "out")
    run_features_resumable(spark, tdir, out, sdir, CFG, n_units=N_UNITS)
    job = run_features_resumable(spark, tdir, out, sdir, CFG, n_units=2)
    dirs = sorted(e for e in os.listdir(out) if e.startswith("unit="))
    assert dirs == ["unit=0", "unit=1"]          # stale unit=2,3 removed
    k1, v1 = _collect(read_feature_output(spark, out))
    k2, v2 = direct
    assert k1 == k2                              # no duplicated rows
    np.testing.assert_allclose(v1, v2, rtol=1e-8, atol=1e-10)
    assert job["rows"] == len(k1)

    # And a valid manifest whose DATA dir was lost must recompute, not skip
    _sh.rmtree(os.path.join(out, "unit=1"))
    job2 = run_features_resumable(spark, tdir, out, sdir, CFG, n_units=2)
    assert job2["units_computed_this_run"] == [1]
    k3, _ = _collect(read_feature_output(spark, out))
    assert k3 == k2


def test_resumable_windowed_equals_direct_and_resumes(spark, inputs, tmp_path):
    """Windowed resumable mode (cfg.window_duration): the per-window model
    map persists as a wmodels/ manifest directory, the job output equals a
    direct windowed run_features, and a second invocation resumes every
    unit AND skips the fit (loads the saved WindowedPCA)."""
    tdir, sdir = inputs
    wcfg = FeatureJobConfig(num_buckets=8, k=None, mode="pca_whiten",
                            snap_dim=16, window_duration="7 days")
    out = str(tmp_path / "wout")
    job = run_features_resumable(spark, tdir, out, sdir, wcfg, n_units=N_UNITS)
    assert job["fit"]["windowed"] is True
    assert job["fit"]["windows_fitted"] >= 2
    idx = os.path.join(out, "_manifest", "wmodels", "index.json")
    assert os.path.exists(idx)
    with open(idx) as f:
        assert len(json.load(f)["models"]) == job["fit"]["windows_fitted"]

    got_keys, got_vecs = _collect(read_feature_output(spark, out))
    want, _ = run_features(spark.read.parquet(tdir),
                           spark.read.parquet(sdir), wcfg)
    want_keys, want_vecs = _collect(want)
    assert got_keys == want_keys
    # atol 5e-9, not the global test's 1e-10: k=None FULL-RANK whitening
    # amplifies near-singular directions by 1/sqrt(lambda+eps), so the
    # direct run's independently re-accumulated moments (different Chan
    # partial order) legitimately wiggle those ~1e-9-magnitude components
    # by a few 1e-10.
    np.testing.assert_allclose(np.stack(got_vecs), np.stack(want_vecs),
                               rtol=1e-6, atol=5e-9)

    job2 = run_features_resumable(spark, tdir, out, sdir, wcfg, n_units=N_UNITS)
    assert job2["units_resumed"] == list(range(N_UNITS))
    assert job2["units_computed_this_run"] == []
    assert job2["rows"] == job["rows"]


def test_stale_model_artifact_triggers_refit(spark, inputs, direct, tmp_path):
    """A model artifact left by a DIFFERENT run (crash between model.save
    and fit.json: newer artifact beside an older-valid manifest) must not
    be loaded — the sidecar model.meta.json ties the artifact bytes to the
    (input, config) that produced them, so a mismatch refits instead of
    silently projecting every unit through the wrong model."""
    tdir, sdir = inputs
    out = str(tmp_path / "out_meta")
    run_features_resumable(spark, tdir, out, sdir, CFG, n_units=N_UNITS)
    mdir = os.path.join(out, "_manifest")
    meta = json.load(open(os.path.join(mdir, "model.meta.json")))

    # simulate the foreign artifact: poison model.npz AND its sidecar with
    # a different config's hash, keep fit.json (still valid for CFG)
    other = FeatureJobConfig(num_buckets=8, k=2, snap_dim=16)
    t = spark.read.parquet(tdir)
    s = spark.read.parquet(sdir)
    _, wrong_model = run_features(t, s, other)
    wrong_model.save(os.path.join(mdir, "model.npz"))
    meta["config_hash"] = config_hash(other, N_UNITS)
    with open(os.path.join(mdir, "model.meta.json"), "w") as f:
        json.dump(meta, f)
    # invalidate one unit so the resume actually recomputes something
    os.remove(os.path.join(mdir, "unit_0.json"))

    run_features_resumable(spark, tdir, out, sdir, CFG, n_units=N_UNITS)
    k2, v2 = _collect(read_feature_output(spark, out))
    k1, v1 = direct
    assert k2 == k1
    np.testing.assert_allclose(v2, v1, rtol=1e-9, atol=1e-10)
    # and the sidecar was rewritten for THIS run
    meta2 = json.load(open(os.path.join(mdir, "model.meta.json")))
    assert meta2["config_hash"] == config_hash(CFG, N_UNITS)


def test_read_feature_output_rejects_mixed_versions(spark, inputs, tmp_path):
    """A crashed re-run over CHANGED input leaves v2 units beside v1 units;
    the validated reader must refuse the mixed union (validate=False reads
    it for inspection)."""
    tdir, sdir = inputs
    out = str(tmp_path / "out_mixed")
    run_features_resumable(spark, tdir, out, sdir, CFG, n_units=N_UNITS)

    # change the input bytes (append one conversation) -> new fingerprint
    extra = generate_transcripts(spark, 3, seed=99, max_turns=5,
                                 mega_turns=0)
    extra.write.mode("append").parquet(tdir)
    try:
        with pytest.raises(SimulatedCrash):
            run_features_resumable(spark, tdir, out, sdir, CFG,
                                   n_units=N_UNITS, fail_after_units=1)
        with pytest.raises(ValueError, match="mixed"):
            read_feature_output(spark, out)
        # escape hatch for partial inspection
        assert read_feature_output(spark, out, validate=False).count() > 0
        # completing the run heals the output
        run_features_resumable(spark, tdir, out, sdir, CFG, n_units=N_UNITS)
        read_feature_output(spark, out)
    finally:
        # restore the shared module-scoped input for later tests
        import shutil
        shutil.rmtree(tdir)
        generate_transcripts(spark, 150, seed=7, max_turns=60,
                             mega_turns=400).write.parquet(tdir)


def test_resumable_asserts_input_schema(spark, tmp_path):
    """Inputs go through the schema-asserting reader: a transcripts table
    whose ts is a LONG (or with a missing column) fails loudly at entry,
    not deep in the plan."""
    bad = str(tmp_path / "bad_transcripts")
    spark.range(10).selectExpr(
        "cast(id as string) conv_id", "cast(id as int) turn_idx",
        "'user' role", "'x' text", "cast(null as string) tool",
        "id as ts").write.parquet(bad)
    with pytest.raises(ValueError, match="transcripts column ts"):
        run_features_resumable(spark, bad, str(tmp_path / "o"), None, CFG,
                               n_units=2)


def test_iceberg_inputs_take_snapshot_fingerprint_branch(spark, tmp_path):
    """fmt='iceberg' must reach the snapshot-id fingerprint, not die in the
    file-listing fingerprint (a catalog table name is not a local dir).  No
    Iceberg runtime exists in this container, so the branch surfaces the
    catalog error — the point is it is NOT the FileNotFoundError the dead
    path raised."""
    with pytest.raises(Exception) as ei:
        run_features_resumable(spark, "nosuch.db.transcripts",
                               str(tmp_path / "o"), None, CFG, n_units=2,
                               fmt="iceberg")
    assert not isinstance(ei.value, FileNotFoundError)
