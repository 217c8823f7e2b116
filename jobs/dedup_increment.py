"""CLI: dedup ONE incoming batch against a persistent dedup index, write
the survivors, and (unless --dry-run) record the batch's digests + band
hashes in the index so the NEXT batch dedups against it too.

    spark-submit --py-files dist/featureextraction_jl_spark.zip \\
        jobs/dedup_increment.py \\
        --docs  /data/crawl/2026-08-20/documents.parquet \\
        --index /data/corpus/dedup_index \\
        --out   /data/corpus/batches/2026-08-20 \\
        --batch-id 2026-08-20

Prints ONE JSON line: rows in/out plus the commit manifest.  Survivors
are written BEFORE the index commit (crash between them = uncommitted,
retryable), and both stages share ONE prepared exact-stage + banding so
the shingle pipeline runs once; the index records the batch's exact-stage
rows — survivors AND near-dup-dropped docs — which is what keeps the
one-shot equivalence exact (operators/incremental.py docstring).
"""
from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import Observation
from pyspark.sql import functions as F

from featureextraction_jl_spark.operators.incremental import (
    IncrementalDedupConfig,
    check_committed,
    committed_batches,
    compact_index,
    dedup_and_commit,
    dedup_batch,
)
from featureextraction_jl_spark.session import get_spark


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", help="parquet of the incoming batch")
    ap.add_argument("--index", required=True, help="dedup index directory")
    ap.add_argument("--out",
                    help="output parquet dir for the batch's survivors")
    ap.add_argument("--batch-id")
    ap.add_argument("--compact", action="store_true",
                    help="compact all committed batches into one and exit "
                         "(maintenance; --docs/--out/--batch-id unused)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--num-hashes", type=int, default=32)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--shingle-k", type=int, default=5)
    ap.add_argument("--max-bucket", type=int, default=1000,
                    help="degenerate-bucket guard; 0 disables")
    ap.add_argument("--dry-run", action="store_true",
                    help="write survivors but do not commit to the index")
    args = ap.parse_args(argv)
    if args.compact:
        spark = get_spark("dedup-index-compact")
        json.dump(compact_index(spark, args.index), sys.stdout,
                  sort_keys=True)
        print()
        return
    for req in ("docs", "out", "batch_id"):
        if getattr(args, req) is None:
            ap.error(f"--{req.replace('_', '-')} is required "
                     f"(unless --compact)")

    cfg = IncrementalDedupConfig(
        id_col=args.id_col, text_col=args.text_col,
        num_hashes=args.num_hashes, bands=args.bands,
        shingle_k=args.shingle_k,
        max_bucket=args.max_bucket or None)
    existing = check_committed(args.index, args.batch_id, cfg)
    if existing is not None:
        # retried run of a batch whose commit already landed: recomputing
        # now would see this batch's own docs in the index, dedup them ALL
        # away, and overwrite --out with an empty frame (the same replay
        # trap streaming/incremental.py guards) — leave --out untouched.
        # check_committed (NOT a bare membership test) so a retry under
        # DIFFERENT banding params raises the library's config-mismatch
        # error instead of silently skipping a different commit.
        json.dump({**existing, "dry_run": bool(args.dry_run)}, sys.stdout,
                  sort_keys=True)
        print()
        return
    spark = get_spark(f"dedup-increment-{args.batch_id}")
    docs = spark.read.parquet(args.docs)
    before = committed_batches(args.index)

    # rows_out from an Observation riding the sink write itself — a
    # re-read + count of the survivors parquet would be a second full
    # scan of the output per invocation (round-5 review)
    out_obs = Observation()
    sink = lambda s: (s.observe(out_obs, F.count(F.lit(1)).alias("rows"))
                      .write.mode("overwrite").parquet(args.out))
    result = {"batch_id": args.batch_id,
              "committed_batches_before": before,
              "dry_run": bool(args.dry_run)}
    if args.dry_run:
        # no commit -> no manifest to reuse; pay the one input count here
        result["rows_in"] = docs.count()
        sink(dedup_batch(spark, docs, args.index, cfg))
    else:
        _surv, man = dedup_and_commit(spark, docs, args.index,
                                      args.batch_id, cfg,
                                      survivors_sink=sink)
        result["manifest"] = man
        # the commit path already counted the raw frame for its manifest
        # fingerprint — reuse it instead of a dedicated count() scan
        result["rows_in"] = man["raw_rows"]
    result["rows_out"] = int(out_obs.get["rows"])
    json.dump(result, sys.stdout, sort_keys=True)
    print()


if __name__ == "__main__":
    main()
