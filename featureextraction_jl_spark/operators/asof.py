"""Point-in-time (as-of) join — the engine's core primitive (SURVEY.md §2 C1–C2).

For each left row (key, ts) attach the latest right row with
``right.ts <= left.ts`` (backward; zero temporal leakage by construction),
or the earliest with ``right.ts >= left.ts`` (forward), or the closer of the
two (nearest), optionally bounded by a tolerance.

Spark has no built-in batch as-of primitive, so two implementations:

* **union trick** (default, :func:`asof_join`): tag the sides, ``unionByName``,
  one Window ``last(right_col, ignorenulls=True)`` sweep ordered by
  ``(ts, side)``, filter back to left rows.  Exactly ONE shuffle on the key,
  sort-merge friendly, JVM-only (no Python worker), AQE-skew-splittable.
  This is the scale path: at 10^12 turns the whole join is one Exchange +
  one Sort per side.
* **bucketed pandas merge** (:func:`asof_join_pandas`): co-group both sides
  by key and run ``pandas.merge_asof`` per group via ``applyInPandas``.
  Used as a cross-check and when per-key state must sit in one frame.
  Memory is O(key group), so mega-keys should not take this path.

Tie-break semantics (pinned by tests): if several right rows share one
``ts``, the last one under ``(ts, *right_order)`` wins — pass
``right_order`` for determinism when right ts duplicates are possible.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from featureextraction_jl_spark.functions.timeutil import epoch_seconds

_SIDE = "__asof_side"
_MATCH_TS = "__asof_matched_ts"
_PAY = "__asof_payload"


def _union_sweep(left: DataFrame, right: DataFrame, on: Sequence[str],
                 left_ts: str, right_ts: str, right_cols: list[str],
                 descending: bool, right_order: Sequence[str],
                 left_order: Sequence[str] = ()) -> DataFrame:
    """Shared union+window sweep. descending=False -> backward as-of."""
    on = list(on)
    lhs = left.withColumn(_SIDE, F.lit(1))
    # A NULL right timestamp is unmatchable by definition — and unfiltered
    # it would sort nulls-FIRST in the ascending sweep, attaching its
    # payload to every left row that precedes the first real right row
    # (with matched_ts still NULL: a temporally untraceable, leakage-shaped
    # match).  Drop such rows before the union.
    # The whole right payload rides ONE struct so the sweep carries it
    # atomically: per-column last(ignorenulls) would otherwise pick an
    # OLDER row's value for a column that is NULL on the true match while
    # matched_ts advances to the newer row — a frankenrow mixing two right
    # rows.  The struct is non-null for every right row (its ts is
    # non-null), so last(ignorenulls) over it selects exactly the latest
    # delivered right ROW, null payload fields included.
    pay = F.struct(F.col(right_ts).alias(_MATCH_TS),
                   *[F.col(c) for c in right_cols]).alias(_PAY)
    rhs = right.filter(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias(left_ts),
        pay,
        # flat copies only for the right_order sort keys
        *[F.col(c) for c in right_order],
    ).withColumn(_SIDE, F.lit(0))

    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    # NULLS FIRST in BOTH directions: a NULL-ts left row must see no right
    # rows before it in the sweep, so it stays unmatched.  Ascending
    # already defaults to nulls-first, but descending defaults to nulls
    # LAST — which parked NULL-ts left rows after every right row and
    # attached the EARLIEST right payload to them in the forward/nearest
    # sweeps (round-5 review, confirmed live): a temporally untraceable,
    # leakage-shaped match the backward path and the pandas twin both
    # refuse.
    ts_key = (F.col(left_ts).desc_nulls_first() if descending
              else F.col(left_ts).asc_nulls_first())
    # ``left_order`` columns slot BETWEEN ts and the side tag so that the
    # sweep's sort order (key, ts, left_order...) is a prefix superset of a
    # downstream Window's (key, ts, left_order...) — Catalyst then elides
    # the downstream Sort entirely (one sort per pass instead of two; the
    # sorts are the bandwidth-bound stages at wide parallelism).  Right
    # rows are missing every left_order column, so unionByName fills them
    # with NULL and nulls-first keeps them sorting BEFORE left rows at
    # equal ts — the inclusive-match invariant the side tag guarantees is
    # preserved independently of left_order.
    order = [ts_key]
    for c in left_order:
        order.append(F.col(c).desc_nulls_first() if descending
                     else F.col(c).asc_nulls_first())
    # side=0 (right) sorts before side=1 (left) at equal ts => inclusive match.
    order.append(F.col(_SIDE).asc())
    for c in right_order:
        order.append(F.col(c).desc() if descending else F.col(c).asc())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*", F.last(_PAY, ignorenulls=True).over(w).alias(f"__f_{_PAY}"))
    out = filled.filter(F.col(_SIDE) == 1)
    for c in right_cols + [_MATCH_TS]:
        out = out.drop(c).withColumn(c, F.col(f"__f_{_PAY}").getField(c))
    return out.drop(_SIDE, _PAY, f"__f_{_PAY}")


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str] | str,
              left_ts: str = "ts", right_ts: str = "ts",
              direction: str = "backward",
              tolerance_seconds: float | None = None,
              right_order: Sequence[str] = (),
              left_order: Sequence[str] = (),
              keep_match_ts: bool = False) -> DataFrame:
    """Union-trick as-of join. One shuffle; no Python workers.

    ``direction``: backward | forward | nearest.
    ``tolerance_seconds``: unmatch rows whose |left.ts - matched ts| exceeds it.
    ``left_order``: extra LEFT-side tie-break columns folded into the sweep's
    sort between ts and the side tag.  Semantically free (see _union_sweep);
    pass the ordering your downstream per-key Windows use — e.g.
    ``("turn_idx",)`` when they order by ``(ts, turn_idx)`` — and their Sort
    is elided because the sweep already delivered that order.
    """
    on = [on] if isinstance(on, str) else list(on)
    right_cols = [c for c in right.columns if c not in on and c != right_ts]
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"right payload columns collide with left: {sorted(overlap)}")
    missing = [c for c in left_order if c in right.columns]
    if missing:
        raise ValueError(
            f"left_order columns must not exist on the right side (they must "
            f"union as NULL for right rows to keep sorting first): {missing}")
    # right_order must be payload columns (ADVICE r04): the sweep selects a
    # flat copy of each right_order column for its sort, and the post-sweep
    # cleanup drops exactly right_cols — a right_order entry outside the
    # payload (the right ts column, an `on` key) would leave a stray
    # NULL-on-left column or an ambiguous duplicate name in the output.
    bad = [c for c in right_order if c not in right_cols]
    if bad:
        raise ValueError(
            f"right_order columns must be right-side payload columns "
            f"(not the key, not {right_ts!r}): {bad}")

    if direction in ("backward", "forward"):
        out = _union_sweep(left, right, on, left_ts, right_ts, right_cols,
                           descending=(direction == "forward"),
                           right_order=right_order, left_order=left_order)
    elif direction == "nearest":
        back = _union_sweep(left, right, on, left_ts, right_ts, right_cols,
                            descending=False, right_order=right_order,
                            left_order=left_order)
        bcols = {c: f"__b_{c}" for c in right_cols + [_MATCH_TS]}
        for c, a in bcols.items():
            back = back.withColumnRenamed(c, a)
        out = _union_sweep(back, right, on, left_ts, right_ts, right_cols,
                           descending=True, right_order=right_order,
                           left_order=left_order)
        lt = epoch_seconds(left_ts)
        bgap = F.abs(lt - epoch_seconds(F.col(bcols[_MATCH_TS])))
        fgap = F.abs(lt - epoch_seconds(F.col(_MATCH_TS)))
        use_b = F.col(bcols[_MATCH_TS]).isNotNull() & (
            F.col(_MATCH_TS).isNull() | (bgap <= fgap)
        )
        for c in right_cols + [_MATCH_TS]:
            out = out.withColumn(c, F.when(use_b, F.col(bcols[c])).otherwise(F.col(c)))
        out = out.drop(*bcols.values())
    else:
        raise ValueError(f"unknown direction {direction!r}")

    if tolerance_seconds is not None:
        gap = F.abs(epoch_seconds(left_ts) - epoch_seconds(F.col(_MATCH_TS)))
        within = F.col(_MATCH_TS).isNotNull() & (gap <= F.lit(float(tolerance_seconds)))
        for c in right_cols:
            out = out.withColumn(c, F.when(within, F.col(c)))
        out = out.withColumn(_MATCH_TS, F.when(within, F.col(_MATCH_TS)))
    if keep_match_ts:
        out = out.withColumnRenamed(_MATCH_TS, "matched_ts")
    else:
        out = out.drop(_MATCH_TS)
    return out


def asof_join_pandas(left: DataFrame, right: DataFrame, on: str,
                     left_ts: str = "ts", right_ts: str = "ts",
                     direction: str = "backward",
                     tolerance_seconds: float | None = None) -> DataFrame:
    """Cogrouped ``pandas.merge_asof`` cross-check implementation (C1b).

    Both sides shuffle once on the key; each key's rows land in one pandas
    frame (cogroup), merged with the library asof.  O(key group) memory.
    """
    right_cols = [c for c in right.columns if c != on and c != right_ts]
    # Mirror asof_join's plan-time collision check (round-5 review): without
    # it a duplicate payload name builds a schema with two same-named fields
    # and dies mid-job inside the Python worker with an opaque
    # RESULT_COLUMN_NAMES_MISMATCH — a cross-check that crashes differently
    # from the path it checks.
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right payload columns collide with left: {sorted(overlap)}")
    fields = []
    for c in left.schema.fields:
        fields.append(f"{c.name} {c.dataType.simpleString()}")
    rtypes = dict((f.name, f.dataType.simpleString()) for f in right.schema.fields)
    for c in right_cols:
        fields.append(f"{c} {rtypes[c]}")
    schema = ", ".join(fields)
    # `is not None`, not falsy: tolerance_seconds=0.0 means exact-ts-only
    # matches (the production path's semantics at asof_join), not unbounded
    tol = (pd.Timedelta(seconds=tolerance_seconds)
           if tolerance_seconds is not None else None)

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if len(lpdf) == 0:
            return pd.DataFrame(columns=list(lpdf.columns) + right_cols)
        # Null-ts handling mirrors the production sweep (_union_sweep):
        # right rows with NULL ts can never be an as-of match -> dropped;
        # left rows with NULL ts pass through unmatched.  Without this,
        # pd.merge_asof raises ValueError("Merge keys contain null values")
        # on a single NaT on EITHER side, killing the task — a cross-check
        # that dies on inputs the primary path tolerates checks nothing.
        null_left = lpdf[lpdf[left_ts].isna()]
        lpdf = lpdf[lpdf[left_ts].notna()]
        rpdf = rpdf[rpdf[right_ts].notna()]
        parts = []
        if len(null_left):
            nl = null_left.copy()
            for c in right_cols:
                nl[c] = None
            parts.append(nl)
        if len(lpdf):
            lo = lpdf.sort_values(left_ts, kind="stable")
            if len(rpdf) == 0:
                out = lo.copy()
                for c in right_cols:
                    out[c] = None
                parts.append(out)
            else:
                ro = (rpdf.sort_values(right_ts, kind="stable")
                      [[right_ts] + right_cols])
                merged = pd.merge_asof(lo, ro, left_on=left_ts,
                                       right_on=right_ts,
                                       direction=direction, tolerance=tol,
                                       suffixes=("", "__r"))
                drop = [c for c in (f"{right_ts}__r", right_ts)
                        if c in merged.columns and c not in lpdf.columns]
                parts.append(merged.drop(columns=drop))
        # parts is never empty here: the len(lpdf)==0 early return above
        # guarantees at least one of null_left / filtered lpdf is non-empty
        return parts[0] if len(parts) == 1 else pd.concat(parts,
                                                          ignore_index=True)

    return left.groupBy(on).cogroup(right.groupBy(on)).applyInPandas(merge, schema)
