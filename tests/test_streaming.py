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


def test_running_budget_state_accumulates_across_batches(spark, sf_dir):
    """applyInPandasWithState: totals must accumulate ACROSS micro-batches
    (one file per trigger), matching the batch ground truth at the end."""
    import shutil
    import uuid

    from ai_intel_web_scraper_spark.streaming.events import (
        EVENTS_SCHEMA, running_budget_state)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    src = "/tmp/stream_state_src"
    shutil.rmtree(src, ignore_errors=True)
    ev.where(F.col("event_id") % 2 == 0).write.parquet(src + "/b0")
    ev.where(F.col("event_id") % 2 == 1).write.parquet(src + "/b1")
    # flatten into one dir with distinct file names
    os.makedirs(src + "/all")
    for sub in ("b0", "b1"):
        for f in os.listdir(os.path.join(src, sub)):
            if f.endswith(".parquet"):
                os.rename(os.path.join(src, sub, f),
                          os.path.join(src, "all", f"{sub}_{f}"))
    name = f"state_{uuid.uuid4().hex[:8]}"
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src + "/all"))
    q = (running_budget_state(stream, budget=500.0)
         .writeStream.outputMode("update").format("memory")
         .queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    # one emission per (user, batch containing that user): users in both
    # batches emit twice — proof the state store carried totals across
    per_user = {}
    emissions = {}
    for r in rows:
        emissions[r["user_id"]] = emissions.get(r["user_id"], 0) + 1
        cur = per_user.get(r["user_id"])
        if cur is None or r["n_events"] > cur["n_events"]:
            per_user[r["user_id"]] = r
    assert max(emissions.values()) >= 2
    want = {r["user_id"]: (r["n"], round(r["t"], 4)) for r in
            ev.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
            .collect()}
    got = {u: (r["n_events"], r["total_value"]) for u, r in per_user.items()}
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        assert abs(got[u][1] - want[u][1]) < 0.01
        assert per_user[u]["over_budget"] == (want[u][1] > 500.0)


def test_stream_dedup_drops_cross_batch_duplicates(spark, sf_dir):
    """dropDuplicates state must carry ACROSS micro-batches: a key seen in
    batch 0 is suppressed when it reappears in batch 1, and the final
    distinct set equals the batch ground truth exactly once each."""
    import shutil
    import uuid

    from ai_intel_web_scraper_spark.streaming.events import (
        EVENTS_SCHEMA, stream_distinct_keys)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    src = f"/tmp/stream_dedup_src_{uuid.uuid4().hex[:8]}"
    # batch 1 = full copy of the data -> every key of batch 1 is a dup of
    # batch 0 except keys absent from the even half
    ev.where(F.col("event_id") % 2 == 0).write.parquet(src + "/b0")
    ev.write.parquet(src + "/b1")
    os.makedirs(src + "/all")
    for sub in ("b0", "b1"):
        for f in os.listdir(os.path.join(src, sub)):
            if f.endswith(".parquet"):
                os.rename(os.path.join(src, sub, f),
                          os.path.join(src, "all", f"{sub}_{f}"))
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src + "/all"))
    q = (stream_distinct_keys(stream)
         .writeStream.outputMode("append").format("memory")
         .queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    try:
        rows = [(r["user_id"], r["event_type"])
                for r in spark.sql(f"SELECT * FROM {name}").collect()]
        want = {(r["user_id"], r["event_type"]) for r in
                ev.select("user_id", "event_type").distinct().collect()}
        assert len(rows) == len(want), "each key emitted exactly once"
        assert set(rows) == want
    finally:
        spark.catalog.dropTempView(name)
        shutil.rmtree(src, ignore_errors=True)


def test_windowed_hll_merges_across_micro_batches(spark, sf_dir):
    """Streaming HLL registers (one file per trigger, so several
    micro-batches touch the same window) must land on exactly the batch
    sketch: max-merge across batches is the HLL register law."""
    import shutil
    import uuid

    from ai_intel_web_scraper_spark.operators.sketches import hll_cols
    from ai_intel_web_scraper_spark.streaming.events import (
        EVENTS_SCHEMA, windowed_hll_registers)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    src = "/tmp/stream_hll_src"
    shutil.rmtree(src, ignore_errors=True)
    os.makedirs(src + "/all")
    for i in range(3):
        ev.where(F.col("event_id") % 3 == i).write.parquet(f"{src}/b{i}")
        for f in os.listdir(f"{src}/b{i}"):
            if f.endswith(".parquet"):
                os.rename(f"{src}/b{i}/{f}", f"{src}/all/b{i}_{f}")
    name = f"hll_{uuid.uuid4().hex[:8]}"
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src + "/all"))
    q = (windowed_hll_registers(stream)
         .writeStream.outputMode("complete").format("memory")
         .queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["win_start"], r["bucket"]): r["max_rho"]
           for r in spark.sql(f"SELECT * FROM {name}").collect()}
    spark.catalog.dropTempView(name)
    bucket, rho = hll_cols(F.col("user_id"))
    batch = (ev.withColumn("bucket", bucket).withColumn("rho", rho)
             .groupBy(F.window("ts", "1 hour").alias("win"), "bucket")
             .agg(F.max("rho").alias("max_rho")))
    want = {(r["win"]["start"], r["bucket"]): r["max_rho"]
            for r in batch.collect()}
    assert got == want
    shutil.rmtree(src, ignore_errors=True)


def test_streaming_recrawl_accumulates_to_batch_result(spark, sf_dir):
    """Stateful streaming recrawl over TIME-ORDERED micro-batches (the
    append-only fetch-log contract) must accumulate to exactly the batch
    freshness recurrence for every key."""
    import shutil
    import uuid

    from ai_intel_web_scraper_spark.operators.temporal import (
        recrawl_schedule)
    from ai_intel_web_scraper_spark.streaming.events import (
        EVENTS_SCHEMA, streaming_recrawl_state)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    cuts = ev.approxQuantile("event_id", [0.33, 0.66], 0.0)
    # event_id is assigned in ts order in the fixture, so id-range splits
    # are time-range splits
    splits = [ev.where(F.col("event_id") <= cuts[0]),
              ev.where((F.col("event_id") > cuts[0])
                       & (F.col("event_id") <= cuts[1])),
              ev.where(F.col("event_id") > cuts[1])]
    src = f"/tmp/stream_recrawl_src_{uuid.uuid4().hex[:8]}"
    os.makedirs(src + "/all")
    import time as _time
    for i, part in enumerate(splits):
        part.coalesce(1).write.parquet(f"{src}/b{i}")
        for f in os.listdir(f"{src}/b{i}"):
            if f.endswith(".parquet"):
                dst = f"{src}/all/b{i}_{f}"
                os.rename(f"{src}/b{i}/{f}", dst)
                os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    name = f"recrawl_{uuid.uuid4().hex[:8]}"
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src + "/all"))
    q = (streaming_recrawl_state(stream)
         .writeStream.outputMode("update").format("memory")
         .queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    spark.catalog.dropTempView(name)
    shutil.rmtree(src, ignore_errors=True)
    # update mode emits one row per (key, batch); the final state per key
    # is the emission with the largest n_obs (monotone)
    got = {}
    n_emissions = {}
    for r in rows:
        n_emissions[r["user_id"]] = n_emissions.get(r["user_id"], 0) + 1
        prev = got.get(r["user_id"])
        if prev is None or r["n_obs"] > prev[0]:
            got[r["user_id"]] = (r["n_obs"], r["n_changes"],
                                 r["change_rate_ppm"], r["interval_us"],
                                 r["next_due_us"])
    assert max(n_emissions.values()) > 1  # state genuinely spans batches
    want = {r["user_id"]: (r["n_obs"], r["n_changes"],
                           r["change_rate_ppm"], r["interval_us"],
                           r["next_due_us"])
            for r in recrawl_schedule(ev, "user_id", "ts", "event_type",
                                      "event_id").collect()}
    assert got == want


def test_stream_enrich_multi_batch_equals_batch(spark, tmp_path):
    """The stream-static enrichment must accumulate across MULTIPLE
    micro-batches (one file per trigger) to exactly the batch join+agg
    result — the broadcast dim join is stateless per batch, the windowed
    agg carries the state."""
    import os
    import uuid
    from ai_intel_web_scraper_spark.streaming.events import (
        EVENT_CATEGORY, enriched_windowed_counts)
    src = spark.read.parquet(
        os.path.join(os.environ.get("SPARK_GRAFT_SF_DIR",
                                    "/root/testdata/sf0.001"),
                     "events.parquet"))
    d = str(tmp_path / "batches")
    # time-ordered 3-file split so watermarks only ever move forward
    from pyspark.sql import Window as W
    src.orderBy("ts").coalesce(1).withColumn(
        "_b", (F.row_number().over(W.orderBy("ts")) % 3)
    ).write.partitionBy("_b").parquet(d)
    from ai_intel_web_scraper_spark.streaming.events import EVENTS_SCHEMA
    name = f"enr_{uuid.uuid4().hex[:6]}"
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(d))
    q = (enriched_windowed_counts(stream, spark).writeStream
         .outputMode("complete").format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["win_start"], r["category"]): (r["n"], round(r["total_value"], 4))
           for r in spark.sql(f"SELECT * FROM {name}").collect()}
    spark.catalog.dropTempView(name)
    dim = spark.createDataFrame(list(EVENT_CATEGORY.items()),
                                "event_type string, category string")
    want = {(r["win_start"], r["category"]): (r["n"], round(r["total_value"], 4))
            for r in (src.join(dim, "event_type")
                      .groupBy(F.window("ts", "1 hour").alias("w"), "category")
                      .agg(F.count("*").alias("n"),
                           F.sum("value").alias("total_value"))
                      .select(F.col("w.start").alias("win_start"), "category",
                              "n", "total_value")).collect()}
    assert got == want and len(got) > 0


def test_checkpointed_file_sink_resumes_exactly_once(spark, tmp_path):
    """Exactly-once resume with a real (non-memory) sink: stream half
    the source files into a parquet sink under a checkpointLocation,
    stop, then restart the SAME query id over the full source — the
    restarted query must pick up from the checkpoint and the sink must
    hold every input row exactly once (no loss, no duplicates). This is
    the durability contract a production frontier sink runs under."""
    import os
    from ai_intel_web_scraper_spark.streaming.events import EVENTS_SCHEMA
    src_dir = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src_dir)
    ev = spark.read.parquet(
        os.path.join(os.environ.get("SPARK_GRAFT_SF_DIR",
                                    "/root/testdata/sf0.001"),
                     "events.parquet")).select(
        "event_id", "user_id", "event_type", "ts", "value")
    batches = [ev.where(F.col("event_id") % 2 == i) for i in (0, 1)]
    batches[0].write.parquet(os.path.join(src_dir, "b0"))

    def start():
        stream = (spark.readStream.schema(
            spark.read.parquet(os.path.join(src_dir, "b0")).schema)
            .option("maxFilesPerTrigger", 4)
            .parquet(src_dir + "/*"))
        return (stream.writeStream.format("parquet")
                .option("path", sink).option("checkpointLocation", ckpt)
                .outputMode("append").trigger(availableNow=True).start())

    q = start()
    q.awaitTermination()
    n_half = spark.read.parquet(sink).count()
    assert n_half == batches[0].count()
    batches[1].write.parquet(os.path.join(src_dir, "b1"))
    q2 = start()
    q2.awaitTermination()
    got = spark.read.parquet(sink)
    assert got.count() == ev.count()                      # no loss
    assert got.select("event_id").distinct().count() == ev.count()  # no dupes


def test_streaming_image_dedup_batch_invariance(spark, tmp_path):
    """The streaming dedup loop (r5) must be invariant to micro-batch
    boundaries: the same new rows driven as ONE file and as THREE files
    produce the identical pair set, and both equal the one-shot
    incremental probe. Also: the initial archive never self-pairs."""
    import pyarrow as pa
    import pyarrow.parquet as papq
    from ai_intel_web_scraper_spark.operators.multimodal import (
        incremental_phash_neardup)
    from ai_intel_web_scraper_spark.streaming.images import (
        streaming_incremental_phash_dedup)
    # archive holds a planted pair (must NOT appear); new rows pair with
    # the archive and with each other ACROSS batch boundaries
    idx_rows = [("i1", 0x0F0F), ("i2", 0x0F0E), ("i3", 7 << 60)]
    new_rows = [("n1", (7 << 60) + 3),    # vs archive i3, ham 2
                ("n2", 0x1234_5678_9ABC_DEF0),
                ("n3", 0x1234_5678_9ABC_DEF1),   # vs n2, cross-batch
                ("n4", 0x1234_5678_9ABC_DEF3)]   # vs n2+n3, cross-batch
    archive = spark.createDataFrame(idx_rows, "image_id string, phash long")

    def write_chunks(dirname, chunks):
        src = str(tmp_path / dirname)
        os.makedirs(src)
        for k, chunk in enumerate(chunks):
            papq.write_table(
                pa.table({"image_id": [i for i, _ in chunk],
                          "phash": pa.array([p for _, p in chunk],
                                            type=pa.int64())}),
                os.path.join(src, f"b{k}.parquet"))
        return src

    def run(dirname, chunks):
        src = write_chunks(dirname, chunks)
        got = streaming_incremental_phash_dedup(
            spark, src, archive, max_hamming=6,
            work_dir=str(tmp_path / (dirname + "_state")))
        return {(r["id_a"], r["id_b"]): r["hamming"] for r in got.collect()}

    one = run("one", [new_rows])
    three = run("three", [new_rows[:1], new_rows[1:2], new_rows[2:]])
    want = {(r["id_a"], r["id_b"]): r["hamming"]
            for r in incremental_phash_neardup(
                spark.createDataFrame(new_rows, "image_id string, phash long"),
                archive, 6).collect()}
    assert one == three == want
    assert ("i3", "n1") in want and ("n2", "n3") in want
    assert ("n2", "n4") in want and ("n3", "n4") in want
    assert not any(a.startswith("i") and b.startswith("i")
                   for a, b in want)  # archive never self-pairs
