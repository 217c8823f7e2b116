"""A/B the flagship FIT pass (round-2 stage attribution: the moment-partials
collect stages are the only anti-scaling stages — wall[2] 12.7+20.9s ->
wall[8] 20.1+42.0s with ~4x CPU inflation, while the projection pass scales
2.4x).  Three variants of the same fit pass on the identical prepared frame:

  floor — materialize prepared.select("raw_vec") to noop (the pruned JVM
          chain every fit variant shares; no moments at all)
  arrow — compute_moments: mapInArrow per-batch partials -> collect ->
          driver Chan merge (engine default)
  expr  — compute_moments_expr: raw-sum JVM aggregate expressions
          (1 + p + p(p+1)/2 sum buffers, map-side partial agg, zero Python)

(arrow - floor) vs (expr - floor) isolates what the moments computation
itself costs at each thread count; if arrow's increment anti-scales while
expr's doesn't, the Arrow boundary of the FIT pass (not the projection,
already cleared by bench_projection.py) is the scaling residual.

Fresh JVM per cell, cells interleaved round-robin, per-cell min kept
(BENCH/BASELINE.md shared-host protocol).  Prints one JSON line per run +
a summary line.

Usage: python scripts/bench_moments.py [--levels 2,8] [--rounds 2]
"""

from __future__ import annotations

import argparse
import itertools
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
from featureextraction_jl_spark.functions.moments import (
    compute_moments, compute_moments_expr)

cpus = int(os.environ["AB_CPUS"])
spark = get_spark("fit-ab", master=f"local[{{cpus}}]", extra_confs={{
    "spark.sql.shuffle.partitions": str(max(cpus * 4, 16)),
}})
t = spark.read.parquet(os.environ["AB_TDIR"])
s = spark.read.parquet(os.environ["AB_SDIR"])
cfg = FeatureJobConfig(snap_dim=16, k=8)
prepared = build_turn_features(t, s, cfg)
variant = os.environ["AB_VARIANT"]
p = 9 + cfg.snap_dim
t0 = time.monotonic()
if variant == "floor":
    prepared.select("raw_vec").write.format("noop").mode("overwrite").save()
elif variant == "arrow":
    m = compute_moments(prepared, "raw_vec")
    assert m.n > 0
elif variant == "expr":
    m = compute_moments_expr(prepared, "raw_vec", p=p)
    assert m.n > 0
else:
    raise SystemExit(f"unknown variant {{variant}}")
print(json.dumps({{"wall": round(time.monotonic() - t0, 2)}}))
spark.stop()
"""


def run_cell(cpus: int, variant: str, tdir: str, sdir: str) -> float:
    env = {**os.environ, "AB_CPUS": str(cpus), "AB_VARIANT": variant,
           "AB_TDIR": tdir, "AB_SDIR": sdir}
    out = subprocess.run([sys.executable, "-c", RUNNER.format(repo=REPO)],
                         capture_output=True, text=True, env=env, timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])["wall"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--cache", default=os.environ.get(
        "SPARK_GRAFT_BENCH_CACHE", "/root/repo/.bench_cache"))
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    variants = ["floor", "arrow", "expr"]

    convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "60000"))
    mega = int(os.environ.get("SPARK_GRAFT_BENCH_MEGA", "120000"))
    tdir = os.path.join(args.cache, f"transcripts_c{convs}_m{mega}")
    sdir = os.path.join(args.cache, f"snapshots_c{convs}")
    if not os.path.exists(os.path.join(tdir, "_SUCCESS")):
        raise SystemExit(f"fixture missing at {tdir}; run bench.py once first")

    walls: dict[tuple[int, str], list[float]] = {
        (c, v): [] for c in levels for v in variants}
    for r in range(args.rounds):
        for c, v in itertools.product(levels, variants):
            w = run_cell(c, v, tdir, sdir)
            walls[(c, v)].append(w)
            print(json.dumps({"round": r, "cpus": c, "variant": v,
                              "wall": w}), flush=True)

    best = {f"{v}@{c}": min(ws) for (c, v), ws in walls.items()}
    incr = {f"{v}@{c}": round(min(walls[(c, v)]) - min(walls[(c, 'floor')]), 2)
            for c in levels for v in variants if v != "floor"}
    print(json.dumps({"metric": "fit-pass moments A/B (wall s, min of rounds)",
                      "best": best, "increment_over_floor": incr}))


if __name__ == "__main__":
    main()
