"""Streaming aggregations over an event stream (fetch-log shaped).

In production the fetch log (url, host, status, ts, value) is a Kafka/queue
stream; here the same queries run over a file source so tests can drive them
to completion synchronously. The operators:

- `windowed_counts` — tumbling/sliding window counts + sums per event_type
  with a watermark for late data.
- `session_rollup` — native `session_window` per user (gap-based), the
  streaming analog of the reference's per-session token accounting
  (reference webapp/sessions.py, SURVEY R7).
- `run_stream_once` — helper: start on a file source, drain, return rows
  from the memory sink.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    slide: str | None = None,
                    watermark: str = "2 hours") -> DataFrame:
    w = (F.window("ts", window, slide) if slide else F.window("ts", window))
    return (events.withWatermark("ts", watermark)
            .groupBy(w.alias("win"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 4).alias("total_value"))
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"),
                    "event_type", "n", "total_value"))


def session_rollup(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    return (events.withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("session_value"))
            .select(F.col("sess.start").alias("sess_start"),
                    F.col("sess.end").alias("sess_end"),
                    "user_id", "n_events", "session_value"))


def stream_distinct_keys(events: DataFrame,
                         keys: tuple[str, ...] = ("user_id", "event_type"),
                         watermark: str = "45 days") -> DataFrame:
    """Streaming dedup with genuinely watermark-bounded state
    (`dropDuplicatesWithinWatermark`) — the streaming analog of the
    engine's url_seen set: the first occurrence of each key passes,
    duplicates within the watermark are dropped, and Spark EXPIRES per-key
    state once the watermark passes it (the requirement at an unbounded
    10^10-key stream; plain `dropDuplicates` on a ts-less projection would
    hold state forever). Pick `watermark` >= the longest duplicate lag
    that must be suppressed exactly-once — re-occurrences beyond it
    re-emit by design (that IS the bounded-state trade). The default
    exceeds the 30-day fixture span, so over test data the result equals
    batch DISTINCT. Emits ONLY the key columns: within a micro-batch the
    kept member row is arbitrary, so the key projection is what makes the
    emission deterministic and oracle-checkable."""
    cols = list(keys)
    return (events.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(cols)
            .select(*cols))


def windowed_hll_registers(events: DataFrame, key_col: str = "user_id",
                           window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Streaming HLL: per-window distinct-key REGISTERS as watermark-
    bounded streaming state — max leading-zero rank per (window, bucket).
    State is <= 256 small integers per open window regardless of stream
    rate, and the incremental micro-batch update is correct because HLL
    registers merge by element-wise max (the law the batch sketch
    property-tests). This is how a 10^10-URL fetch stream reports
    distinct-URL/host cardinality per hour without distinct-count state;
    the consumer folds registers to an estimate (sketches.hll_estimate)."""
    from ..operators.sketches import hll_cols
    bucket, rho = hll_cols(F.col(key_col))
    return (events.withWatermark("ts", watermark)
            .withColumn("bucket", bucket).withColumn("rho", rho)
            .groupBy(F.window("ts", window).alias("win"), "bucket")
            .agg(F.max("rho").alias("max_rho"))
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"), "bucket", "max_rho"))


def run_stream_once(spark: SparkSession, src_path: str, op,
                    output_mode: str = "complete") -> list:
    """Drive a streaming op over a parquet file source to completion and
    return the memory-sink rows (test/bench harness). Cleans up its temp
    symlink dir and memory-sink view — repeated calls don't accumulate."""
    import os
    import shutil

    name = f"out_{uuid.uuid4().hex[:8]}"
    tmp_dir = None
    if os.path.isfile(src_path):
        # the file streaming source requires a directory
        tmp_dir = f"/tmp/stream_src_{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp_dir, exist_ok=True)
        os.symlink(os.path.abspath(src_path),
                   os.path.join(tmp_dir, os.path.basename(src_path)))
        src_path = tmp_dir
    try:
        stream = (spark.readStream.schema(EVENTS_SCHEMA)
                  .parquet(src_path))
        q = (op(stream).writeStream.outputMode(output_mode)
             .format("memory").queryName(name).start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        rows = spark.sql(f"SELECT * FROM {name}").collect()
        return rows
    finally:
        spark.catalog.dropTempView(name)
        if tmp_dir is not None:
            shutil.rmtree(tmp_dir, ignore_errors=True)


def running_budget_state(events: DataFrame, budget: float = 500.0,
                         timeout: str = "NoTimeout") -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    running value total maintained across micro-batches, emitting one row
    per (user, batch) with the cumulative total and whether the budget
    tripped. This is the streaming analog of the crawl engine's per-host
    budget state (host_state.fetched_count): state the reference keeps in
    a Python dict for its single process, held here in the state store of
    an arbitrarily wide cluster."""
    from pyspark.sql.streaming.state import GroupState

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("over_budget", T.BooleanType()),
    ])
    state_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ])

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        import pandas as pd
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [round(total, 4)],
                            "over_budget": [total > budget]})

    return (events.groupBy("user_id")
            .applyInPandasWithState(update, outputStructType=out_schema,
                                    stateStructType=state_schema,
                                    outputMode="update",
                                    timeoutConf=timeout))


def streaming_recrawl_state(events: DataFrame,
                            min_iv_us: int | None = None,
                            max_iv_us: int | None = None) -> DataFrame:
    """Streaming recrawl due-queue (applyInPandasWithState): the
    continuous-crawler form of `operators/temporal.py:recrawl_schedule`.
    Per-key state carries (n_obs, n_changes, first_us, last_us, last_fp)
    across micro-batches; each batch folds its observations in (ts,
    event_id) order and re-emits the key's refreshed schedule — the
    frontier reads the latest next_due_us per key and injects due URLs
    into the next round.

    Batch-parity contract (tested): when observations arrive in time
    order across batches — true for a fetch log, which is append-only —
    the state recurrence is associative, so ANY batch split lands on
    exactly the batch operator's output. All arithmetic is Python
    big-int / integer microseconds, the same integer math as the batch
    side."""
    from ai_intel_web_scraper_spark.operators.temporal import (
        RECRAWL_MAX_US, RECRAWL_MIN_US)
    from pyspark.sql.streaming.state import GroupState

    lo = RECRAWL_MIN_US if min_iv_us is None else min_iv_us
    hi = RECRAWL_MAX_US if max_iv_us is None else max_iv_us

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("n_obs", T.LongType()),
        T.StructField("n_changes", T.LongType()),
        T.StructField("change_rate_ppm", T.LongType()),
        T.StructField("interval_us", T.LongType()),
        T.StructField("next_due_us", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("changes", T.LongType()),
        T.StructField("first_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("last_fp", T.StringType()),
    ])

    def update(key, pdfs, state: GroupState):
        import pandas as pd
        n, changes, first_us, last_us, last_fp = (
            state.get if state.exists else (0, 0, None, None, None))
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
            for t, fp in zip(ts_us, pdf["event_type"].tolist()):
                if last_fp is not None and fp != last_fp:
                    changes += 1
                last_fp = fp
                n += 1
                first_us = t if first_us is None else first_us
                last_us = t
        state.update((n, changes, first_us, last_us, last_fp))
        est = (last_us - first_us) // changes if changes > 0 else hi
        iv = max(lo, min(hi, est))
        rate = changes * 1_000_000 // (n - 1) if n > 1 else 0
        yield pd.DataFrame({
            "user_id": [key[0]], "n_obs": [n], "n_changes": [changes],
            "change_rate_ppm": [rate], "interval_us": [iv],
            "next_due_us": [last_us + iv]})

    return (events.groupBy("user_id")
            .applyInPandasWithState(update, outputStructType=out_schema,
                                    stateStructType=state_schema,
                                    outputMode="update",
                                    timeoutConf="NoTimeout"))


# Stream-static enrichment: the dimension a streaming pipeline joins
# against every micro-batch (category rollup of raw event types). Kept
# as module data so the DuckDB oracle regenerates the identical mapping.
EVENT_CATEGORY = {
    "click": "engagement",
    "view": "engagement",
    "signup": "conversion",
    "purchase": "conversion",
    "error": "ops",
}


def enriched_windowed_counts(events: DataFrame, spark=None,
                             window: str = "1 hour",
                             watermark: str = "2 hours") -> DataFrame:
    """Stream-static broadcast enrichment + windowed aggregation — the
    canonical Structured Streaming join shape (stream side stays
    append-mode; the static dim is broadcast into every micro-batch, no
    stream-stream state). Counts and exact-cent sums per (window,
    category). The dim is constant-size module data, so at any stream
    rate the join is a broadcast hash join against megabytes."""
    sp = spark or events.sparkSession
    dim = sp.createDataFrame(list(EVENT_CATEGORY.items()),
                             "event_type string, category string")
    return (events.withWatermark("ts", watermark)
            .join(F.broadcast(dim), "event_type")
            .groupBy(F.window("ts", window).alias("w"), "category")
            .agg(F.count("*").alias("n"),
                 F.sum("value").alias("total_value"))
            .select(F.col("w.start").alias("win_start"),
                    F.col("w.end").alias("win_end"),
                    "category", "n", "total_value"))
