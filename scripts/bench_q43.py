"""q43 (n-gram Jaccard) variant A/B (VERDICT r03 #4).

The pruned gram frame feeds three consumers: the set-size aggregate and the
two self-join sides.  Whether the executed plan reuses one exchange across
the self-join sides is probed from the POST-EXECUTION adaptive plan (a
``collect()`` on the same DataFrame object, so ``executedPlan`` reflects the
finalized AQE plan, not the never-run initial one); an accumulator probe
counts upstream source evaluations per variant.  The question is the size
branch:

* reagg    — separate groupBy(id) branch: re-executes scan -> shingle ->
             explode, shuffles only map-side-combined partial counts.
* window   — count() over (partition by id) carried on the gram frame:
             shingles once, costs one full gram-frame shuffle by id, drops
             the two post-join size lookups.
* persist  — reagg with the pruned gram frame persisted across consumers.

Protocol: interleaved round-robin x --rounds, per-variant MIN kept (same
noise protocol as bench.py / bench_scaling.py).  Writes BENCH/q43_ab.json.

Usage: python scripts/bench_q43.py [--rounds 3] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build(spark, sf_dir: str, variant: str):
    from featureextraction_jl_spark.operators.dedup import ngram_jaccard_pairs
    from pyspark.sql import functions as F

    import __spark_entry__ as entry

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    kw = dict(size_strategy="reagg", persist_grams=False)
    if variant == "window":
        kw["size_strategy"] = "window"
    elif variant == "persist":
        kw["persist_grams"] = True
    # max_df=None mirrors q43 exactly (__spark_entry__.py opts out of the
    # production absolute cap so the frac is the only pruning): without it
    # the 2000 default would bind below the 10% frac on any corpus over
    # 20k docs and the A/B would time a different plan than q43 runs.
    out = ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.5,
                              max_df=None, max_df_frac=entry.Q43_MAX_DF_FRAC,
                              **kw)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def count_upstream_evals(spark) -> dict[str, int]:
    """Accumulator probe on a tiny synthetic corpus: how many times does the
    source execute under each variant?  (partitions=4, so 4 evals per pass —
    same probe as scripts/bench_q41.py, kept here so a rerun regenerates
    every field of BENCH/q43_ab.json.)  The probed plan includes the
    max_df_frac pruning branch, matching the timed A/B and the production
    q43 — its ndocs count and gram-DF aggregate each add a source pass to
    EVERY variant, so the variant DELTA isolates the size branch."""
    from featureextraction_jl_spark.operators.dedup import ngram_jaccard_pairs

    import __spark_entry__ as entry

    out = {}
    rows = [(i, "xx" + format(i, "05d") * 2) for i in range(500)]
    base = spark.createDataFrame(rows, "doc_id long, text string").coalesce(4)
    for variant in ("reagg", "window", "persist"):
        acc = spark.sparkContext.accumulator(0)

        def mark(batches):
            acc.add(1)
            yield from batches

        d = base.mapInPandas(mark, base.schema)
        ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.1,
                            max_df_frac=entry.Q43_MAX_DF_FRAC,
                            size_strategy="window" if variant == "window" else "reagg",
                            persist_grams=variant == "persist") \
            .write.format("noop").mode("overwrite").save()
        out[variant] = acc.value
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

    spark = get_spark("q43-ab", master=f"local[{args.cpus}]")
    variants = ["reagg", "window", "persist"]

    # Correctness first: all variants must agree exactly (sorted rows).
    ref = sorted(map(tuple, build(spark, args.sf, "reagg").collect()))
    counts = {}
    for v in variants[1:]:
        got = sorted(map(tuple, build(spark, args.sf, v).collect()))
        assert got == ref, f"variant {v} output differs from reagg"
    counts["rows"] = len(ref)
    spark.catalog.clearCache()

    samples: dict[str, list[float]] = {v: [] for v in variants}
    for r in range(args.rounds):
        for v in variants:                       # interleaved round-robin
            t0 = time.monotonic()
            build(spark, args.sf, v).write.format("noop").mode("overwrite").save()
            samples[v].append(round(time.monotonic() - t0, 3))
            # Outside the timed window: charging cache teardown to the
            # persist arm alone would bias the very A/B this script decides.
            spark.catalog.clearCache()
            print(json.dumps({"round": r, "variant": v,
                              "sec": samples[v][-1]}), flush=True)

    # Executed-plan probe: collect() runs THIS DataFrame's QueryExecution
    # (a noop write spawns its own), so executedPlan() below is the
    # finalized adaptive plan that actually ran, exchange reuse included.
    reused = {}
    for v in variants:
        plan = build(spark, args.sf, v)
        plan.collect()
        reused[v] = "ReusedExchange" in \
            plan._jdf.queryExecution().executedPlan().toString()
        spark.catalog.clearCache()

    result = {
        "metric": "q43 n-gram Jaccard variant wall time (min over interleaved reps)",
        "sf": args.sf,
        "cpus": int(args.cpus),
        "rows": counts["rows"],
        "rounds": args.rounds,
        "min_sec": {v: min(s) for v, s in samples.items()},
        "samples": samples,
        "executed_plan_reused_exchange": reused,
        "upstream_partition_evals": count_upstream_evals(spark),
        "interpretation": "upstream_partition_evals / 4 = full passes over "
                          "the 4-partition probe source per variant; "
                          "executed_plan_reused_exchange is read from the "
                          "post-execution finalized AQE plan",
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "q43_ab.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
