"""Structured Streaming operators driven to completion over a file source;
results cross-checked against the equivalent batch aggregation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ai_intel_web_scraper_spark.streaming.events import (
    run_stream_once, session_rollup, windowed_counts)


def test_windowed_counts_match_batch(spark, sf_dir):
    path = os.path.join(sf_dir, "events.parquet")
    rows = run_stream_once(spark, path, windowed_counts)
    assert rows
    batch = (spark.read.parquet(path)
             .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
             .agg(F.count("*").alias("n"),
                  F.round(F.sum("value"), 4).alias("total_value")))
    want = {(r["win"]["start"], r["event_type"]): (r["n"], r["total_value"])
            for r in batch.collect()}
    got = {(r["win_start"], r["event_type"]): (r["n"], r["total_value"])
           for r in rows}
    assert got == want


def test_session_rollup_runs(spark, sf_dir):
    path = os.path.join(sf_dir, "events.parquet")
    rows = run_stream_once(spark, path, session_rollup)
    assert rows
    for r in rows:
        assert r["sess_end"] >= r["sess_start"]
        assert r["n_events"] >= 1
