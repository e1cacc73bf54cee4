"""Temporal join operators (`operators/temporal.py`): as-of join
semantics (backward, non-strict, tolerance) against a hand-computed
fixture and pandas.merge_asof, and the bucketed interval join against a
brute-force BETWEEN recompute."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ai_intel_web_scraper_spark.operators import temporal as TM


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    # key 1: quotes before/between/after trades, incl. an exact-tie ts;
    # key 2: trade with NO preceding quote; key 3: quotes only.
    quotes = spark.createDataFrame(
        [(1, _ts(0), 100), (1, _ts(5), 105), (1, _ts(10), 110),
         (2, _ts(30), 200), (3, _ts(1), 300)],
        "k long, ts timestamp, px long")
    trades = spark.createDataFrame(
        [(1, _ts(4), 11), (1, _ts(5), 12), (1, _ts(59), 13),
         (2, _ts(29), 21), (2, _ts(31), 22)],
        "k long, ts timestamp, qty long")
    return trades, quotes


def test_asof_backward_nonstrict(spark, trades_quotes):
    trades, quotes = trades_quotes
    got = {(r["k"], r["qty"]): (r["asof"]["px"] if r["asof"] else None)
           for r in TM.asof_join(trades, quotes, "k", "ts", "ts",
                                 ["px"]).collect()}
    assert got == {
        (1, 11): 100,   # ts 4 -> quote at 0
        (1, 12): 105,   # exact tie matches (non-strict <=)
        (1, 13): 110,   # far later -> latest quote
        (2, 21): None,  # no quote yet
        (2, 22): 200,
    }


def test_asof_tolerance_voids_stale_matches(spark, trades_quotes):
    trades, quotes = trades_quotes
    tol = 10 * 60 * 1_000_000  # 10 minutes
    got = {(r["k"], r["qty"]): (r["asof"]["px"] if r["asof"] else None)
           for r in TM.asof_join(trades, quotes, "k", "ts", "ts", ["px"],
                                 tolerance_us=tol).collect()}
    # trade at minute 59 is 49 min after the last quote -> voided
    assert got[(1, 13)] is None
    assert got[(1, 11)] == 100 and got[(2, 22)] == 200


def test_asof_matches_pandas_merge_asof(spark):
    # randomized-ish (deterministic seed-free arithmetic) cross-check
    # against pandas' reference implementation
    quotes = [(k, _ts(m, s), k * 1000 + m * 60 + s)
              for k in (1, 2, 3)
              for m, s in [(0, 30), (7, 11), (13, 2), (21, 45), (40, 0)]]
    trades = [(k, _ts(m, s), 0)
              for k in (1, 2, 4)
              for m, s in [(0, 29), (0, 30), (7, 11), (19, 59), (59, 0)]]
    qdf = spark.createDataFrame(quotes, "k long, ts timestamp, px long")
    tdf = spark.createDataFrame(trades, "k long, ts timestamp, qty long")
    got = {(r["k"], r["ts"]): (r["asof"]["px"] if r["asof"] else None)
           for r in TM.asof_join(tdf, qdf, "k", "ts", "ts",
                                 ["px"]).collect()}
    pq = pd.DataFrame(quotes, columns=["k", "ts", "px"]).sort_values("ts")
    pt = pd.DataFrame(trades, columns=["k", "ts", "qty"]).sort_values("ts")
    ref = pd.merge_asof(pt, pq, on="ts", by="k", direction="backward")
    for row in ref.itertuples():
        want = None if pd.isna(row.px) else int(row.px)
        assert got[(row.k, row.ts.to_pydatetime())] == want
    assert len(got) == len(ref)


def test_range_interval_join_matches_bruteforce(spark):
    base = TM.WIN_BASE_US
    h = TM.HOUR_US
    # facts every 17 minutes across 5 days; intervals of varied lengths,
    # incl. an empty one (end == start) and sub-bucket short ones
    facts = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=17 * i))
         for i in range(5 * 24 * 60 // 17)],
        "fid long, ts timestamp")
    iv = [(0, base + 2 * h, base + 3 * h),          # 1h inside bucket 0
          (1, base + 5 * h, base + 30 * h),         # spans many buckets
          (2, base + 10 * h, base + 10 * h),        # empty
          (3, base, base + 5 * 24 * h),             # everything
          (4, base + 47 * h, base + 49 * h)]        # straddles boundary
    ivdf = spark.createDataFrame(iv, "window_id long, s long, e long")
    got = {(r["window_id"], r["fid"]) for r in TM.range_interval_join(
        facts, ivdf, "ts", "s", "e").collect()}
    fr = [(i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=17 * i))
          for i in range(5 * 24 * 60 // 17)]
    epoch = dt.datetime(1970, 1, 1)
    want = {(w, fid) for w, s, e in iv for fid, ts in fr
            if s <= int((ts - epoch).total_seconds() * 1_000_000) < e}
    assert got == want and len(got) > 0
    # no duplicate (window, fact) pairs even across bucket boundaries
    rows = TM.range_interval_join(facts, ivdf, "ts", "s", "e").collect()
    assert len(rows) == len(got)


def test_maintenance_windows_fixture_shape(spark):
    w = TM.maintenance_windows(spark).collect()
    assert len(w) == TM.WIN_N
    for r in w:
        assert r["start_us"] == TM.WIN_BASE_US + r["window_id"] * TM.WIN_STEP_US
        length = (6 + (r["window_id"] % 5) * 9) * TM.HOUR_US
        assert r["end_us"] - r["start_us"] == length


def test_recrawl_schedule_matches_python_replay(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # key 0: alternates every 7h (est = 7h, unclamped) / key 1: static
    # (ceiling) / key 2: one change then static / key 3: single
    # observation / key 4: changes hourly (est = 1h -> floor clamp)
    specs = {0: "ababab", 1: "xxxxx", 2: "ppqqqq", 3: "z", 4: "cdcdcd"}
    for k, fps in specs.items():
        step = 1 if k == 4 else 7
        for i, fp in enumerate(fps):
            rows.append((eid, k, base + dt.timedelta(hours=step * i + k),
                         fp))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, k long, ts timestamp, fp string")
    got = {r["k"]: (r["n_obs"], r["n_changes"], r["change_rate_ppm"],
                    r["interval_us"], r["next_due_us"])
           for r in TM.recrawl_schedule(df, "k", "ts", "fp",
                                        "event_id").collect()}
    epoch = dt.datetime(1970, 1, 1)
    for k, fps in specs.items():
        step = 1 if k == 4 else 7
        ts = [int((base + dt.timedelta(hours=step * i + k) - epoch)
                  .total_seconds() * 1_000_000) for i in range(len(fps))]
        ch = sum(1 for a, b in zip(fps, fps[1:]) if a != b)
        n = len(fps)
        est = (ts[-1] - ts[0]) // ch if ch else TM.RECRAWL_MAX_US
        iv = max(TM.RECRAWL_MIN_US, min(TM.RECRAWL_MAX_US, est))
        rate = ch * 1_000_000 // (n - 1) if n > 1 else 0
        assert got[k] == (n, ch, rate, iv, ts[-1] + iv), k
    # hourly changer clamps at the floor; static key at the ceiling;
    # the 7h alternator sits between, unclamped
    assert got[4][3] == TM.RECRAWL_MIN_US
    assert got[1][3] == TM.RECRAWL_MAX_US
    assert got[0][3] == 7 * TM.HOUR_US


def test_recrawl_schedule_single_shuffle_plan(spark, tmp_path):
    import datetime as dt
    df = spark.createDataFrame(
        [(i, i % 5, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), "a")
         for i in range(50)],
        "event_id long, k long, ts timestamp, fp string")
    plan = TM.recrawl_schedule(df, "k", "ts", "fp", "event_id") \
        ._jdf.queryExecution().executedPlan().toString()
    # the lag window and the aggregate must share one hash partitioning
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_asof_right_tie_is_deterministic_max_struct(spark):
    """ADVICE r3: among right rows tied on (key, ts) the match is the
    greatest (rts, *right_cols) struct — stable across runs and
    partition layouts (exercised at 1 and 8 shuffle partitions)."""
    quotes = spark.createDataFrame(
        [(1, _ts(5), 101), (1, _ts(5), 107), (1, _ts(5), 103)],
        "k long, ts timestamp, px long")
    trades = spark.createDataFrame(
        [(1, _ts(6), 1)], "k long, ts timestamp, qty long")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for n in ("1", "8"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            for rep in (quotes, quotes.repartition(5)):
                r = TM.asof_join(trades, rep, "k", "ts", "ts",
                                 ["px"]).collect()
                assert [x["asof"]["px"] for x in r] == [107]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_asof_map_typed_right_column(spark):
    """ADVICE r5: a map-typed right column must not fail analysis (maps
    are not sort-orderable in Spark; the tie key now projects only the
    orderable right columns). Ties on (key, ts) stay deterministic via
    the orderable prefix; the map payload rides along in the match."""
    quotes = spark.createDataFrame(
        [(1, _ts(5), 101, {"venue": "A"}),
         (1, _ts(5), 107, {"venue": "B"}),
         (1, _ts(3), 99, {"venue": "C"})],
        "k long, ts timestamp, px long, attrs map<string,string>")
    trades = spark.createDataFrame(
        [(1, _ts(6), 1), (1, _ts(4), 2)],
        "k long, ts timestamp, qty long")
    for rep in (quotes, quotes.repartition(5)):
        got = {r["qty"]: (r["asof"]["px"], dict(r["asof"]["attrs"]))
               for r in TM.asof_join(trades, rep, "k", "ts", "ts",
                                     ["px", "attrs"]).collect()}
        # qty=1 matches the (ts=5, px=107) row — the greatest ORDERABLE
        # prefix among the tied pair; qty=2 matches the lone ts=3 row.
        assert got == {1: (107, {"venue": "B"}),
                       2: (99, {"venue": "C"})}
