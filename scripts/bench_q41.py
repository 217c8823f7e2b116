"""q41 (MinHash+LSH) banded-frame reuse A/B (follow-up to VERDICT r03 #4).

The banded frame feeds BOTH sides of the candidate self-join.  If the plan
did not reuse one exchange across the sides, the whole shingle -> 32-way
min-aggregate signature -> banding pipeline would execute once per side.
Measured (upstream_partition_evals): it DOES reuse — 4 evals on the
4-partition probe = one pass, cached or not — matching q43's regenerated
post-execution probe (scripts/bench_q43.py), so cache_banded stays off by
default.

Arms, run over the q41 registry parameters (portable md5 hashing, the
oracle-mandated path) AND the production xxhash64 path:

* base     — plan as-is.
* persist  — banded frame persisted across the two join sides.

An accumulator-instrumented source also counts upstream partition
evaluations per arm, turning "did it recompute?" into a measured integer
instead of a plan-string guess.

Protocol: interleaved round-robin x --rounds, per-arm MIN kept.
Writes BENCH/q41_ab.json.

Usage: python scripts/bench_q41.py [--rounds 3] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build(spark, sf_dir: str, portable: bool, cache_banded: bool):
    from featureextraction_jl_spark.operators.dedup import minhash_lsh_pairs

    import __spark_entry__ as entry

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return minhash_lsh_pairs(d, "text", "doc_id", portable=portable,
                             cache_banded=cache_banded, **entry.Q41)


def count_upstream_evals(spark) -> dict[str, int]:
    """Accumulator probe on a tiny synthetic corpus: how many times does the
    source execute under each arm?  (partitions=4, so 4 evals per pass)"""
    out = {}
    rows = [(i, "xx" + format(i, "05d") * 2) for i in range(500)]
    base = spark.createDataFrame(rows, "doc_id long, text string").coalesce(4)
    for arm, cache in (("base", False), ("persist", True)):
        acc = spark.sparkContext.accumulator(0)

        def mark(batches):
            acc.add(1)
            yield from batches

        d = base.mapInPandas(mark, base.schema)
        from featureextraction_jl_spark.operators.dedup import minhash_lsh_pairs
        minhash_lsh_pairs(d, "text", "doc_id", num_hashes=16, bands=4, k=4,
                          cache_banded=cache) \
            .write.format("noop").mode("overwrite").save()
        out[arm] = acc.value
        spark.catalog.clearCache()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from featureextraction_jl_spark.session import get_spark

    spark = get_spark("q41-ab", master=f"local[{args.cpus}]")

    evals = count_upstream_evals(spark)

    # Correctness: the persisted arm must reproduce the base pair set.
    for portable in (True, False):
        ref = sorted(map(tuple, build(spark, args.sf, portable, False).collect()))
        got = sorted(map(tuple, build(spark, args.sf, portable, True).collect()))
        spark.catalog.clearCache()
        assert got == ref, f"cache_banded changed the pair set (portable={portable})"

    arms = [("portable_base", True, False), ("portable_persist", True, True),
            ("xxhash_base", False, False), ("xxhash_persist", False, True)]
    samples: dict[str, list[float]] = {a: [] for a, _, _ in arms}
    for r in range(args.rounds):
        for name, portable, cache in arms:       # interleaved round-robin
            t0 = time.monotonic()
            build(spark, args.sf, portable, cache) \
                .write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.monotonic() - t0, 3))
            # Outside the timed window: charging cache teardown to the
            # persist arms alone would bias the A/B one-sidedly.
            spark.catalog.clearCache()
            print(json.dumps({"round": r, "arm": name,
                              "sec": samples[name][-1]}), flush=True)

    result = {
        "metric": "q41 MinHash+LSH banded-reuse A/B (min over interleaved reps)",
        "sf": args.sf,
        "cpus": int(args.cpus),
        "rounds": args.rounds,
        "upstream_partition_evals": evals,
        "min_sec": {a: min(s) for a, s in samples.items()},
        "samples": samples,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "q41_ab.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
