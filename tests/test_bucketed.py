"""Bucketed co-located joins (`sources/bucketed.py`): the physical-plan
contract — equal-bucket tables join with ZERO Exchange — plus result
parity with the plain shuffled join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_intel_web_scraper_spark.sources.bucketed import (
    cobucketed_join, read_bucketed, write_bucketed)


@pytest.fixture()
def bucketed_pair(spark):
    # force SortMergeJoin: with broadcast on, tiny test tables would take
    # BroadcastHashJoin and hide the layout's Exchange elision
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    left = spark.range(0, 5000).select(
        F.col("id").alias("url_hash"),
        (F.col("id") % 97).alias("host_id"))
    right = spark.range(0, 5000, 3).select(
        F.col("id").alias("url_hash"),
        F.concat(F.lit("u"), F.col("id")).alias("url"))
    spark.sql("DROP TABLE IF EXISTS bt_left")
    spark.sql("DROP TABLE IF EXISTS bt_right")
    write_bucketed(left, "bt_left", "url_hash", 8)
    write_bucketed(right, "bt_right", "url_hash", 8)
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS bt_left")
    spark.sql("DROP TABLE IF EXISTS bt_right")


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    l, r = read_bucketed(spark, "bt_left"), read_bucketed(spark, "bt_right")
    j = cobucketed_join(l, r, "url_hash")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # and the result equals the plain shuffled join of the raw data
    raw = (spark.range(0, 5000)
           .select(F.col("id").alias("url_hash"),
                   (F.col("id") % 97).alias("host_id"))
           .join(spark.range(0, 5000, 3)
                 .select(F.col("id").alias("url_hash"),
                         F.concat(F.lit("u"), F.col("id")).alias("url")),
                 "url_hash"))
    assert (sorted(map(tuple, j.collect()))
            == sorted(map(tuple, raw.collect())))


def test_bucketed_scan_still_pushes_filters(spark, bucketed_pair):
    """Bucketing must not cost pushdown: a predicate on the bucketed scan
    reaches the parquet reader."""
    l = read_bucketed(spark, "bt_left").where(F.col("host_id") == 5)
    plan = l._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "host_id" in plan


def test_mismatched_bucket_counts_fall_back_to_shuffle(spark):
    """Sanity check of the contract's boundary: unequal bucket counts
    cannot co-locate, so the optimizer reintroduces an Exchange (on at
    least one side) rather than producing wrong results."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")
    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    write_bucketed(df, "bt_a", "k", 8)
    write_bucketed(df.withColumn("v", F.col("k") * 2), "bt_b", "k", 4)
    try:
        j = cobucketed_join(read_bucketed(spark, "bt_a"),
                            read_bucketed(spark, "bt_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
        assert j.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_aqe_splits_planted_skew_join(spark):
    """The brief's skew lever, evidenced: a join where one key holds ~90%
    of the rows gets its oversized partition split by AQE's skew-join
    rule (skew=true in the final adaptive plan) instead of serializing
    on one task. Thresholds are lowered so the toy fixture trips the
    same machinery a hot-host frontier would at scale."""
    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16KB",
    }
    prev = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        big = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("v"))
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
        j = big.join(right, "k")
        # collect() executes THIS DataFrame's QueryExecution, so the
        # adaptive plan we inspect afterwards is the final one (count()
        # would execute a different plan instance)
        rows = j.collect()
        assert len(rows) == 180_000 + 100   # k=0 matches + identity keys
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
