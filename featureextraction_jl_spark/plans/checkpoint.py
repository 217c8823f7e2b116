"""Checkpoint-resumable feature runs with per-unit lineage manifests (E3/E4).

The north rule requires runs to be "checkpoint-resumable with per-partition
lineage manifests and metrics" (BASELINE.json:14).  Spark has no built-in
batch-job resume, so the unit of resumption here is a **conv_id hash bucket
group**: unit *i* owns every conversation with ``pmod(xxhash64(conv_id),
n_units) == i``.  Every engine operator (sessionize, lag/lead, backfill,
as-of join, projection) partitions by conv_id, so the per-unit decomposition
is exact — running units independently and unioning their outputs equals one
global run (tested in tests/test_checkpoint.py).

Protocol (manifest-last, crash-safe):

1. **Fingerprint** the input (file listing: relative path, size, mtime ->
   sha256).  On Iceberg the fingerprint is the snapshot id — same role:
   detect that a manifest refers to the same immutable input.
2. **Fit stage**: global moment accumulation + driver-side eigh, persisted as
   ``_manifest/model.npz`` + ``_manifest/fit.json`` (n, wall_s, explained
   variance, moment checksum).  Skipped on resume when fingerprint+config
   match.
3. **Transform stage**, one unit at a time: filter -> transform-only
   ``run_features`` -> parquet ``unit=<i>/`` -> gather metrics (rows via
   ``Observation`` — no second pass — plus bytes/files/wall) -> atomically
   write ``_manifest/unit_<i>.json`` (tmp + ``os.replace``).  A crash between
   data write and manifest write simply redoes the unit; the data write is
   idempotent (per-unit overwrite).
4. ``_manifest/job.json`` aggregates per-unit metrics (rows, bytes, seconds).

At the 10^12-turn design scale the unit filter aligns with the Iceberg
``bucket(n, conv_id)`` partition transform, so each unit's scan prunes to its
own files instead of filtering a full scan; the parquet sandbox path filters
(still one scan per unit, stated in the manifest as ``pruning: "filter"``).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import asdict
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from featureextraction_jl_spark.functions.pca import PCAModel, fit_pca
from featureextraction_jl_spark.functions.moments import compute_moments
from featureextraction_jl_spark.plans.windowed_pca import WindowedPCA
from featureextraction_jl_spark.plans.feature_job import (
    FeatureJobConfig,
    build_turn_features,
    run_features,
)

MANIFEST_DIR = "_manifest"


class SimulatedCrash(RuntimeError):
    """Raised by the test-only fail_after_units hook to model a mid-run kill."""


# ---------------------------------------------------------------------------
# Fingerprints and atomic manifest IO
# ---------------------------------------------------------------------------

def iceberg_fingerprint(spark: SparkSession, *tables: str) -> str:
    """Snapshot-id fingerprint for Iceberg inputs (the remote-input twin of
    :func:`input_fingerprint` — an Iceberg table name is not a local dir, so
    a file listing is impossible AND unnecessary: the current snapshot id
    already answers "same immutable input bytes?").  Container-gated like
    every Iceberg branch (needs the runtime JAR + catalog)."""
    h = hashlib.sha256()
    for t in tables:
        if t is None:
            h.update(b"<none>")
            continue
        rows = spark.sql(
            f"SELECT snapshot_id FROM {t}.snapshots "
            f"ORDER BY committed_at DESC LIMIT 1").collect()
        sid = str(rows[0][0]) if rows else "<empty>"
        h.update(f"{t}:{sid}".encode())
    return h.hexdigest()[:16]


def input_fingerprint(*paths: str) -> str:
    """sha256 over the (path, size, mtime_ns) listing of the input files.

    Iceberg equivalent: the table's current snapshot id.  Both answer "is
    this manifest about the same immutable input bytes?".
    """
    h = hashlib.sha256()
    for root in paths:
        if root is None:
            h.update(b"<none>")
            continue
        if os.path.isfile(root):
            # single-file parquet input (e.g. the driver's
            # documents.parquet): same (name, size, mtime) identity as the
            # directory listing below
            st = os.stat(root)
            h.update(f"{os.path.basename(root)}|{st.st_size}|"
                     f"{st.st_mtime_ns}\n".encode())
            continue
        if not os.path.isdir(root):
            # os.walk on a missing/remote path yields NOTHING, which would
            # silently fingerprint every such input identically — and on
            # resume with different data the model/units would be wrongly
            # reused.  Remote inputs (s3://, hdfs://, Iceberg tables) need a
            # snapshot-id based fingerprint instead of a file listing.
            raise FileNotFoundError(
                f"input_fingerprint: {root!r} is not a local directory; "
                "for remote/Iceberg inputs pass a snapshot-id fingerprint "
                "(see module docstring) instead of a path listing")
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for name in sorted(filenames):
                if name.startswith(("_", ".")):
                    continue
                full = os.path.join(dirpath, name)
                st = os.stat(full)
                rel = os.path.relpath(full, root)
                h.update(f"{rel}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    return h.hexdigest()


#: config fields that CANNOT change what a run writes — pure performance
#: knobs.  Excluded from config_hash so toggling one between a run and its
#: resume does not invalidate every manifest and force a full recompute of
#: byte-identical outputs (round-5 review).
NON_SEMANTIC_CONFIG_FIELDS = ("cache_prepared",)


def config_hash(cfg: FeatureJobConfig, n_units: int) -> str:
    semantic = {k: v for k, v in asdict(cfg).items()
                if k not in NON_SEMANTIC_CONFIG_FIELDS}
    payload = json.dumps({**semantic, "n_units": n_units}, sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _write_json_atomic(path: str, obj: dict[str, Any]) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)  # atomic on POSIX: manifest appears fully or not at all


def _read_json(path: str) -> dict[str, Any] | None:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def _dir_stats(path: str) -> tuple[int, int]:
    """(num data files, total bytes) under a written parquet dir."""
    files = bytes_ = 0
    for dirpath, _dirs, names in os.walk(path):
        for name in names:
            if name.startswith(("_", ".")):
                continue
            files += 1
            bytes_ += os.stat(os.path.join(dirpath, name)).st_size
    return files, bytes_


# ---------------------------------------------------------------------------
# The resumable runner
# ---------------------------------------------------------------------------

def _unit_filter(df: DataFrame, unit: int, n_units: int) -> DataFrame:
    return df.filter(F.pmod(F.xxhash64("conv_id"), F.lit(n_units)) == unit)


def run_features_resumable(
    spark: SparkSession,
    transcripts_path: str,
    out_dir: str,
    snapshots_path: str | None = None,
    cfg: FeatureJobConfig | None = None,
    n_units: int = 8,
    fail_after_units: int | None = None,
    fmt: str | None = None,
) -> dict[str, Any]:
    """Run (or resume) the flagship feature job; returns the job manifest.

    Re-invoking with the same inputs/config/out_dir skips every unit whose
    manifest is valid — a killed run resumes where it stopped.  Changed input
    bytes or config invalidate all manifests (fingerprint mismatch) and the
    job recomputes from scratch.
    """
    cfg = cfg or FeatureJobConfig()
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)

    # Iceberg inputs are catalog names, not local dirs: fingerprint them by
    # snapshot id (a file listing would raise FileNotFoundError before the
    # Iceberg reader branch could ever run).
    fp = (iceberg_fingerprint(spark, transcripts_path, snapshots_path)
          if fmt == "iceberg"
          else input_fingerprint(transcripts_path, snapshots_path))
    chash = config_hash(cfg, n_units)

    def valid(man: dict[str, Any] | None) -> bool:
        return bool(man) and man.get("input_fingerprint") == fp \
            and man.get("config_hash") == chash

    # Through the schema-asserting reader, not a bare spark.read.parquet:
    # a transcripts dir with ts stored as long or a missing column must
    # fail HERE with the contract error, not deep in the plan; ``fmt``
    # ("iceberg") selects the catalog branch on a real cluster.
    from featureextraction_jl_spark.sources.tables import (
        read_table,
        read_transcripts,
    )

    transcripts = read_transcripts(spark, transcripts_path, fmt)
    snapshots = (read_table(spark, snapshots_path, fmt)
                 if snapshots_path else None)

    # ---- fit stage -------------------------------------------------------
    # Global mode persists ONE model.npz; windowed mode (cfg.window_duration)
    # persists a wmodels/ directory (one .npz per window + index.json — the
    # WindowedPCA manifest).  config_hash covers window_duration, so
    # switching modes invalidates every manifest.
    windowed = cfg.window_duration is not None
    model_path = os.path.join(mdir, "wmodels" if windowed else "model.npz")
    model_ready = os.path.exists(
        os.path.join(model_path, "index.json") if windowed else model_path)
    fit_man_path = os.path.join(mdir, "fit.json")
    fit_man = _read_json(fit_man_path)
    # The artifact carries its own provenance sidecar (written atomically
    # AFTER the artifact, BEFORE fit.json): fit.json alone cannot vouch for
    # the artifact bytes — a crash between a NEWER run's model.save and its
    # fit.json write leaves a mismatched artifact next to an older-valid
    # manifest, and resuming would project every remaining unit through the
    # wrong model (windowed keys would all miss -> silent all-NULL units).
    meta_path = os.path.join(mdir, "model.meta.json")
    model_ready = model_ready and valid(_read_json(meta_path))
    if valid(fit_man) and model_ready:
        model = (WindowedPCA.load(model_path) if windowed
                 else PCAModel.load(model_path))
    elif windowed:
        from featureextraction_jl_spark.plans.windowed_pca import (
            fit_windowed_pca,
        )

        t0 = time.monotonic()
        prepared = build_turn_features(transcripts, snapshots, cfg)
        model = fit_windowed_pca(prepared, "raw_vec", "ts",
                                 cfg.window_duration, k=cfg.k, mode=cfg.mode)
        model.save(model_path)
        _write_json_atomic(meta_path, {
            "input_fingerprint": fp, "config_hash": chash,
            "artifact": os.path.basename(model_path)})
        fit_man = {
            "stage": "fit",
            "input_fingerprint": fp,
            "config_hash": chash,
            "windowed": True,
            "window_duration": cfg.window_duration,
            "n_rows": int(sum(model.counts.values())
                          + sum(model.skipped.values())),
            "windows_fitted": len(model.models),
            "windows_skipped": len(model.skipped),
            "wall_s": round(time.monotonic() - t0, 3),
        }
        _write_json_atomic(fit_man_path, fit_man)
    else:
        t0 = time.monotonic()
        prepared = build_turn_features(transcripts, snapshots, cfg)
        moments = compute_moments(prepared, "raw_vec")
        model = fit_pca(moments, k=cfg.k, mode=cfg.mode)
        model.save(model_path)
        _write_json_atomic(meta_path, {
            "input_fingerprint": fp, "config_hash": chash,
            "artifact": os.path.basename(model_path)})
        fit_man = {
            "stage": "fit",
            "input_fingerprint": fp,
            "config_hash": chash,
            "n_rows": int(moments.n),
            "p": int(moments.mean.shape[0]),
            "moment_checksum": hashlib.sha256(
                moments.mean.tobytes() + moments.m2.tobytes()).hexdigest()[:16],
            "explained_variance_ratio": [
                round(float(r), 8) for r in model.explained_variance_ratio],
            "wall_s": round(time.monotonic() - t0, 3),
        }
        _write_json_atomic(fit_man_path, fit_man)

    # ---- transform stage, unit by unit ----------------------------------
    # Stale-unit sweep: a re-run with a smaller n_units would otherwise
    # leave unit=k (k >= n_units) data dirs from the old split on disk, and
    # read_feature_output's unit=* glob would union them — duplicating rows
    # while job.json (which sums only 0..n_units-1) reports clean totals.
    for entry in os.listdir(out_dir):
        if entry.startswith("unit="):
            try:
                k = int(entry.split("=", 1)[1])
            except ValueError:
                continue
            if k >= n_units:
                shutil.rmtree(os.path.join(out_dir, entry))
                stale_man = os.path.join(mdir, f"unit_{k}.json")
                if os.path.exists(stale_man):
                    os.remove(stale_man)

    units_done, units_skipped = [], []
    for unit in range(n_units):
        upath = os.path.join(mdir, f"unit_{unit}.json")
        man = _read_json(upath)
        # Skip only when the manifest is valid AND its data still exists:
        # a lost/deleted unit dir with a surviving manifest would otherwise
        # be silently omitted from the output while job.json reports its
        # rows as present.
        if valid(man) and os.path.isdir(os.path.join(out_dir, f"unit={unit}")):
            units_skipped.append(unit)
            continue
        if fail_after_units is not None and len(units_done) >= fail_after_units:
            raise SimulatedCrash(f"injected crash before unit {unit}")
        t0 = time.monotonic()
        t_u = _unit_filter(transcripts, unit, n_units)
        s_u = _unit_filter(snapshots, unit, n_units) if snapshots is not None else None
        out, _ = run_features(t_u, s_u, cfg, model=model)
        obs = Observation(f"unit_{unit}")
        out = out.observe(obs, F.count(F.lit(1)).alias("rows"))
        data_dir = os.path.join(out_dir, f"unit={unit}")
        out.write.mode("overwrite").parquet(data_dir)
        n_files, n_bytes = _dir_stats(data_dir)
        man = {
            "stage": "transform",
            "unit": unit,
            "n_units": n_units,
            "input_fingerprint": fp,
            "config_hash": chash,
            "model": os.path.basename(model_path),
            "pruning": "filter",  # iceberg: bucket-partition pruning instead
            "rows": int(obs.get["rows"]),
            "output_files": n_files,
            "output_bytes": n_bytes,
            "wall_s": round(time.monotonic() - t0, 3),
        }
        _write_json_atomic(upath, man)
        units_done.append(unit)

    # ---- job summary -----------------------------------------------------
    unit_mans = []
    for u in range(n_units):
        man = _read_json(os.path.join(mdir, f"unit_{u}.json"))
        if man is None:
            # a manifest written above vanished/corrupted before aggregation
            raise RuntimeError(
                f"unit manifest missing or unreadable at summary time: "
                f"{os.path.join(mdir, f'unit_{u}.json')}")
        unit_mans.append(man)
    job = {
        "input_fingerprint": fp,
        "config_hash": chash,
        "n_units": n_units,
        "units_computed_this_run": units_done,
        "units_resumed": units_skipped,
        "rows": sum(m["rows"] for m in unit_mans),
        "output_bytes": sum(m["output_bytes"] for m in unit_mans),
        "wall_s_per_unit": {str(m["unit"]): m["wall_s"] for m in unit_mans},
        "fit": fit_man,
    }
    _write_json_atomic(os.path.join(mdir, "job.json"), job)
    return job


def read_feature_output(spark: SparkSession, out_dir: str,
                        validate: bool = True) -> DataFrame:
    """Read the union of all completed units' outputs.

    ``validate`` (default) checks the unit manifests BEFORE the glob
    union: every unit dir must carry a readable manifest, all manifests
    must agree on ONE (input_fingerprint, config_hash) version, and the
    unit set must be complete for the recorded n_units — otherwise a run
    that crashed mid-recompute over changed input leaves unit=0 holding
    v2 rows beside v1 units, and the bare glob would return the mixed
    union with no error.  Pass validate=False to inspect partial output.
    """
    if validate:
        mdir = os.path.join(out_dir, MANIFEST_DIR)
        units = []
        for entry in os.listdir(out_dir):
            if entry.startswith("unit="):
                try:
                    units.append(int(entry.split("=", 1)[1]))
                except ValueError:
                    raise ValueError(
                        f"unparseable unit dir {entry!r} under {out_dir}")
        if not units:
            raise FileNotFoundError(f"no unit=* output under {out_dir}")
        versions, n_units_seen = set(), set()
        for k in sorted(units):
            man = _read_json(os.path.join(mdir, f"unit_{k}.json"))
            if not man:
                raise ValueError(
                    f"unit={k} has data but no readable manifest — "
                    f"crashed or foreign output; validate=False to read "
                    f"anyway")
            versions.add((man.get("input_fingerprint"),
                          man.get("config_hash")))
            n_units_seen.add(man.get("n_units"))
        if len(versions) > 1:
            raise ValueError(
                f"mixed input/config versions across units: {versions} — "
                f"a crashed re-run over changed input; re-run "
                f"run_features_resumable to completion first")
        n_units = n_units_seen.pop() if len(n_units_seen) == 1 else None
        if n_units is None or set(range(n_units)) - set(units):
            raise ValueError(
                f"incomplete output: have units {sorted(units)} of "
                f"n_units={n_units}")
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "unit=*"))
