"""Pure-CPU scaling control for the two-scale protocol (round-2 verdict #6).

Runs a compute-only Spark job with near-zero memory traffic — sha2 hashing
over spark.range, no shuffle, no Python — at the same parallelism levels as
the flagship ladder, same fresh-JVM interleaved-min protocol.

Interpretation: if THIS control scales ~linearly N -> 4N while the flagship
doesn't, the flagship's loss is memory-system bandwidth on this shared
slice (the control barely touches DRAM; the flagship streams GBs through
sort/shuffle/Arrow).  On a real cluster each executor brings its own
memory system, so executor-count scaling tracks the plan's shuffle balance
— which the control cannot measure but the plan invariants pin.

Usage: python scripts/bench_cpu_control.py [--levels 1,2,4,8,32] [--rounds 3]
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
import pyspark.sql.functions as F

cpus = int(os.environ["CTRL_CPUS"])
n = int(os.environ["CTRL_N"])
spark = get_spark("cpu-ctrl", master=f"local[{{cpus}}]")
# warm-up (JIT, codegen)
spark.range(0, 10_000_00, 1, cpus).select(
    F.sum(F.crc32(F.sha2(F.col("id").cast("string"), 256)))).collect()
t0 = time.monotonic()
spark.range(0, n, 1, cpus * 4).select(
    F.sum(F.crc32(F.sha2(F.col("id").cast("string"), 256)))).collect()
print(json.dumps({{"wall": round(time.monotonic() - t0, 2)}}))
spark.stop()
"""


def run_once(cpus: int, n: int) -> float:
    env = {**os.environ, "CTRL_CPUS": str(cpus), "CTRL_N": str(n)}
    out = subprocess.run([sys.executable, "-c", RUNNER.format(repo=REPO)],
                         capture_output=True, text=True, env=env, timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])["wall"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="1,2,4,8,32")
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    best: dict[int, list[float]] = {c: [] for c in levels}
    for r in range(args.rounds):
        for c in levels:
            w = run_once(c, args.rows)
            best[c].append(w)
            print(json.dumps({"round": r, "cpus": c, "wall": w}), flush=True)
    thr = {c: args.rows / min(v) for c, v in best.items()}
    effs = {f"{n}->{4*n}": round((thr[4*n] / thr[n]) / 4, 3)
            for n in levels if 4 * n in thr}
    print(json.dumps({"metric": "pure-CPU control scaling",
                      "rows_per_sec": {str(c): round(t) for c, t in thr.items()},
                      "efficiencies": effs,
                      "samples_wall": {str(c): v for c, v in best.items()}}))


if __name__ == "__main__":
    main()
