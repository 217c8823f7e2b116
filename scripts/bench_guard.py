"""Bench regression guard (VERDICT r04 next #6).

Compares a fresh bench.py JSON against the previous round's and FAILS
(exit 1) on any per-query interleaved-min regression beyond ``--factor``
(default 1.5x) — so a round's changes cannot silently regress the wins the
earlier rounds measured in (q43 window size-strategy, q41 exchange reuse,
SimHash one-pass, moments in-worker merge...).

Both inputs must come from the interleaved-min warm protocol (bench.py's
default): this host's same-binary swing is 2.5-6x, so single-shot numbers
would false-alarm constantly.  1.5x is above the residual min-of-3
interleaved jitter observed across rounds 3-4 but far below any real
algorithmic regression (the round-4 wins were 3-6x).

Usage:
    python scripts/bench_guard.py BENCH_r04.json fresh.json [--factor 1.5]

Queries present in only one file are reported but never fail the guard
(suites legitimately grow); a shrunk suite is called out loudly.
"""

from __future__ import annotations

import argparse
import json
import sys


def compare(prev: dict, cur: dict, factor: float) -> int:
    pq, cq = prev.get("queries", {}), cur.get("queries", {})
    missing = sorted(set(pq) - set(cq))
    added = sorted(set(cq) - set(pq))
    if missing:
        print(f"WARNING: queries dropped from the suite: {missing}")
    if added:
        print(f"note: new queries (no baseline): {added}")
    failures = []
    for name in sorted(set(pq) & set(cq)):
        ratio = cur["queries"][name] / max(prev["queries"][name], 1e-9)
        flag = ""
        if ratio > factor:
            failures.append((name, prev["queries"][name], cur["queries"][name], ratio))
            flag = f"  <-- REGRESSION (> {factor}x)"
        print(f"{name:32s} {prev['queries'][name]:8.3f}s -> "
              f"{cur['queries'][name]:8.3f}s  ({ratio:5.2f}x){flag}")
    if failures:
        print(f"\nFAIL: {len(failures)} quer{'y' if len(failures) == 1 else 'ies'} "
              f"regressed beyond {factor}x interleaved-min:")
        for name, a, b, r in failures:
            print(f"  {name}: {a:.3f}s -> {b:.3f}s ({r:.2f}x)")
        return 1
    print(f"\nOK: no query regressed beyond {factor}x "
          f"({len(set(pq) & set(cq))} compared)")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("prev", help="previous round bench JSON (e.g. BENCH_r04.json)")
    ap.add_argument("cur", help="fresh bench JSON to check")
    ap.add_argument("--factor", type=float, default=1.5,
                    help="max allowed per-query slowdown (default 1.5)")
    args = ap.parse_args()
    def load(path: str) -> dict:
        with open(path) as f:
            d = json.load(f)
        # the driver's BENCH_r{N}.json wraps bench.py's line under "parsed"
        if "queries" not in d and isinstance(d.get("parsed"), dict):
            d = d["parsed"]
        return d

    prev, cur = load(args.prev), load(args.cur)
    for d, name in ((prev, args.prev), (cur, args.cur)):
        if "queries" not in d:
            print(f"ERROR: {name} has no 'queries' map — not a bench.py JSON")
            return 2
    return compare(prev, cur, args.factor)


if __name__ == "__main__":
    sys.exit(main())
