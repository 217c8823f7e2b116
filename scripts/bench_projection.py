"""A/B the Python/Arrow boundary share of the flagship (round-2 verdict #6).

Three variants of the projection stage, timed on the identical prepared
frame (full flagship chain up to and including raw_vec assembly):

  none  — materialize the prepared frame without any projection
          (JVM-only chain; the floor every variant shares)
  udf   — Arrow-batched pandas UDF projection (engine default)
  expr  — JVM-codegen p*k multiply-add expression projection (no Python)

(udf - none) vs (expr - none) isolates what the Arrow IPC + Python worker
boundary costs at each thread count; if (udf-none) grows with threads while
(expr-none) doesn't, the Python boundary is a scaling bottleneck — if both
stay proportional, it isn't.

Also sweeps spark.sql.execution.arrow.maxRecordsPerBatch for the udf
variant.  Fresh JVM per cell.  Prints one JSON line per cell + a summary.

Usage: python scripts/bench_projection.py [--levels 2,8] [--batches 10000,65536]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from featureextraction_jl_spark.session import get_spark
from featureextraction_jl_spark.plans import FeatureJobConfig
from featureextraction_jl_spark.plans.feature_job import build_turn_features
from featureextraction_jl_spark.functions.moments import compute_moments
from featureextraction_jl_spark.functions.pca import fit_pca, project_udf, project_expr
import pyspark.sql.functions as F

cpus = int(os.environ["AB_CPUS"])
spark = get_spark("proj-ab", master=f"local[{{cpus}}]", extra_confs={{
    "spark.sql.shuffle.partitions": str(max(cpus * 4, 16)),
    "spark.sql.execution.arrow.maxRecordsPerBatch": os.environ["AB_BATCH"],
}})
t = spark.read.parquet(os.environ["AB_TDIR"])
s = spark.read.parquet(os.environ["AB_SDIR"])
cfg = FeatureJobConfig(snap_dim=16, k=8)
prepared = build_turn_features(t, s, cfg)
moments = compute_moments(prepared, "raw_vec")
model = fit_pca(moments, k=cfg.k, mode=cfg.mode)
variant = os.environ["AB_VARIANT"]
if variant == "none":
    out = prepared.select("conv_id", "turn_idx", "ts", "role", "text", "tool",
                          "session_id", "raw_vec")
elif variant == "udf":
    out = prepared.select("conv_id", "turn_idx", "ts", "role", "text", "tool",
                          "session_id", project_udf(model, "raw_vec").alias("fv"))
elif variant == "expr":
    p = model.mu.shape[0]
    cols = [F.element_at("raw_vec", i + 1).alias(f"x{{i}}") for i in range(p)]
    flat = prepared.select("conv_id", "turn_idx", "ts", "role", "text", "tool",
                           "session_id", *cols)
    out = flat.select("conv_id", "turn_idx", "ts", "role", "text", "tool",
                      "session_id",
                      project_expr(model, [f"x{{i}}" for i in range(p)]).alias("fv"))
else:
    raise SystemExit(f"unknown variant {{variant}}")
t0 = time.monotonic()
out.write.format("noop").mode("overwrite").save()
print(json.dumps({{"wall": round(time.monotonic() - t0, 2)}}))
spark.stop()
"""


def run_cell(cpus: int, variant: str, batch: int, tdir: str, sdir: str) -> float:
    env = {**os.environ, "AB_CPUS": str(cpus), "AB_VARIANT": variant,
           "AB_BATCH": str(batch), "AB_TDIR": tdir, "AB_SDIR": sdir}
    out = subprocess.run([sys.executable, "-c", RUNNER.format(repo=REPO)],
                         capture_output=True, text=True, env=env, timeout=3600)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-3000:])
    return json.loads(out.stdout.strip().splitlines()[-1])["wall"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--batches", default="10000,65536")
    ap.add_argument("--convs", type=int, default=60000)
    ap.add_argument("--mega", type=int, default=120000)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    batches = [int(x) for x in args.batches.split(",")]

    cache = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/root/repo/.bench_cache")
    tdir = os.path.join(cache, f"transcripts_c{args.convs}_m{args.mega}")
    sdir = os.path.join(cache, f"snapshots_c{args.convs}")

    cells = []
    for c in levels:
        for variant, batch in ([("none", batches[0]), ("expr", batches[0])]
                               + [("udf", b) for b in batches]):
            cells.append((c, variant, batch))

    best: dict[tuple, float] = {}
    for r in range(args.rounds):               # interleaved, min kept
        for cell in cells:
            w = run_cell(*cell, tdir, sdir)
            best[cell] = min(best.get(cell, float("inf")), w)
            print(json.dumps({"round": r, "cpus": cell[0], "variant": cell[1],
                              "batch": cell[2], "wall": w}), flush=True)

    print(json.dumps({
        "metric": "projection A/B (python-boundary share)",
        "cells": {f"local[{c}]/{v}/b{b}": w for (c, v, b), w in best.items()},
    }))


if __name__ == "__main__":
    main()
