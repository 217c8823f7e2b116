"""Engine-vs-oracle parity on adversarial data the generated corpus lacks.

The driver's sf tables are ASCII-only, null-free, integer-JSON, midnight-
dated and as-of-tie-free — so the standard gate (test_queries.py) cannot
exercise the desync classes a cross-engine review found latent in the
oracle contract.  Each test here plants exactly one such class and runs
the REAL queries()/oracle_sql() pair over it:

* duplicate (user_id, ts) purchases  -> as-of tie-break (q25/q26: DuckDB
  ASOF picks an arbitrary row; the oracles now dedupe to the engine's
  pinned winner — MAX(value) backward, MIN(value) forward);
* non-integer / non-numeric JSON $.k -> cast semantics (q19: both sides
  now parse-as-double then truncate; non-numeric -> NULL, never an error);
* NULL text                          -> null propagation (q47: NULL payload
  yields NULL metadata fields on both sides instead of a task crash);
* non-midnight ship timestamp on the day-60 boundary -> timestamp-vs-date
  granularity (q07: both sides compare the raw timestamp).
"""

from __future__ import annotations

import os
from datetime import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod

from tests.test_queries import assert_equal_frames

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def _ts(vals):
    return pa.array([None if v is None else datetime.fromisoformat(v)
                     for v in vals], pa.timestamp("us"))


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adversarial_sf")

    # events: as-of ties + hostile JSON -------------------------------------
    # user 1: two purchases at the SAME ts (values 100 / 200) before an
    # event, and two at the same later ts (50 / 75) after it — exercising
    # both sweep directions' tie-breaks; plus an equidistant nearest case.
    rows = [
        # event_id, ts,                      user, type,       value, props
        (1, "2024-01-01 10:00:00", 1, "purchase", 100.0, '{"k": 1}'),
        (2, "2024-01-01 10:00:00", 1, "purchase", 200.0, '{"k": 1.99}'),
        (3, "2024-01-01 11:00:00", 1, "click",     1.0,  '{"k": "abc"}'),
        (4, "2024-01-01 12:00:00", 1, "purchase",  50.0, '{"k": -2.5}'),
        (5, "2024-01-01 12:00:00", 1, "purchase",  75.0, '{"k": 37}'),
        # user 2: backward and forward purchases equidistant from the event
        (6, "2024-01-02 09:00:00", 2, "purchase",  10.0, "{}"),
        (7, "2024-01-02 10:00:00", 2, "view",       0.0, None),
        (8, "2024-01-02 11:00:00", 2, "purchase",  20.0, '{"k": null}'),
        # k parses to a double far outside BIGINT range: the engine's
        # try_cast chain yields NULL; the oracle needs TRY_CAST on the OUTER
        # conversion too or DuckDB's plain CAST(trunc(1e20) AS BIGINT)
        # raises (ADVICE r04).  A JSON STRING, not a bare number — engines
        # re-serialize extracted JSON numbers differently ("1.0E20" vs
        # "100000000000000000000.0"), which would desync k_str instead of
        # testing the cast.  A "view" row so as-of purchase matches are
        # untouched.
        (9, "2024-01-02 12:00:00", 2, "view",       0.0, '{"k": "1e20"}'),
        # user 3: a NULL-ts row among real ones — Spark windows order ASC
        # NULLS FIRST while DuckDB defaults to NULLS LAST, so every
        # ascending-ts window oracle (q21/q22/q23/q27/q30) needs explicit
        # NULLS FIRST and q50's oracle must drop NULL ts like Spark's
        # session_window does (round-5 review)
        (10, None,                  3, "view",      5.0,  None),
        (11, "2024-01-03 09:00:00", 3, "purchase",  30.0, "{}"),
        (12, "2024-01-03 09:10:00", 3, "view",      2.0,  "{}"),
    ]
    events = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": _ts([r[1] for r in rows]),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    })
    pq.write_table(events, os.path.join(d, "events.parquet"))

    # documents: a NULL text row among normal ones --------------------------
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["hello media world", None, "x"], pa.string()),
        "lang": pa.array(["en", "en", "en"], pa.string()),
        "source": pa.array(["s", "s", "s"], pa.string()),
        "n_chars": pa.array([17, 0, 1], pa.int64()),
    })
    pq.write_table(docs, os.path.join(d, "documents.parquet"))

    # orders/lineitem: shipments AT the day-60 boundary with time-of-day ----
    orders = pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_custkey": pa.array([1], pa.int64()),
        "o_orderstatus": pa.array(["O"], pa.string()),
        "o_totalprice": pa.array([1.0], pa.float64()),
        "o_orderdate": _ts(["2024-01-01 00:00:00"]),
        "o_orderpriority": pa.array(["1-URGENT"], pa.string()),
    })
    lineitem = pa.table({
        "l_orderkey": pa.array([1, 1, 1], pa.int64()),
        # day 60 at midnight (in), day 60 at 14:00 (OUT on both sides now),
        # day 59 at 23:59 (in)
        "l_shipdate": _ts(["2024-03-01 00:00:00",
                           "2024-03-01 14:00:00",
                           "2024-02-29 23:59:00"]),
    })
    pq.write_table(orders, os.path.join(d, "orders.parquet"))
    pq.write_table(lineitem, os.path.join(d, "lineitem.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def adv_duck(adv_dir):
    con = duckdb.connect()
    for t in ("events", "documents", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{adv_dir}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", ["q25_asof_backward", "q26_asof_forward",
                                  "q19_json_fns", "q07_range_join",
                                  "q47_media_meta",
                                  # NULL-ts ordering + NULL-text rows
                                  # (round-5 review hardening)
                                  "q15_string_fns", "q21_sessionize",
                                  "q22_lag_lead", "q23_rolling_rows",
                                  "q27_backfill", "q30_session_stats",
                                  "q50_session_window",
                                  "q38_token_count", "q39_quality_score",
                                  "q40_langid", "q42_simhash"])
def test_adversarial_parity(spark, adv_dir, adv_duck, name):
    got = QUERIES[name](spark, adv_dir).toPandas()
    want = adv_duck.execute(ORACLES[name]).fetchdf()
    assert_equal_frames(got, want, name)


def test_planted_semantics(spark, adv_dir):
    """The planted cases resolve to the documented values (not merely to
    whatever both engines happen to agree on)."""
    q25 = {r["event_id"]: r["purchase_value"]
           for r in QUERIES["q25_asof_backward"](spark, adv_dir).collect()}
    assert q25[3] == 200.0          # backward tie at 10:00 -> MAX(value)
    q26 = {r["event_id"]: (r["next_purchase"], r["nearest_purchase"])
           for r in QUERIES["q26_asof_forward"](spark, adv_dir).collect()}
    assert q26[3][0] == 50.0        # forward tie at 12:00 -> MIN(value)
    assert q26[7][1] == 10.0        # equal distance -> backward match
    q19 = {r["event_id"]: r["k_num"]
           for r in QUERIES["q19_json_fns"](spark, adv_dir).collect()}
    assert q19[2] == 1              # 1.99 truncates toward zero
    assert q19[4] == -2             # -2.5 truncates toward zero
    assert q19[3] is None and q19[6] is None  # non-numeric / missing -> NULL
    assert q19[9] is None           # 1e20 overflows BIGINT -> NULL, no error
    q07 = QUERIES["q07_range_join"](spark, adv_dir).collect()
    assert q07[0]["n_shipped_60d"] == 2       # 14:00-on-day-60 excluded
    q47 = {r["doc_id"]: r for r in
           QUERIES["q47_media_meta"](spark, adv_dir).collect()}
    assert q47[1]["n_bytes"] is None and q47[1]["content_md5"] is None
