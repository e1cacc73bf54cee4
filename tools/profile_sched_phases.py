"""Phase breakdown of the bench sched round (guide §1.4: noop-sink
isolation). Replicates bench.run_sched's exact pipeline, timing each
prefix so phase costs are the deltas."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    import bench as B
    from ai_intel_web_scraper_spark.crawl.bloom import partitioned_probe_fn
    from ai_intel_web_scraper_spark.crawl.scheduler import (politeness_rank,
                                                            resolve_udf)
    from ai_intel_web_scraper_spark.session import get_spark
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_hosts, seen_frac, round_seconds, n_salt = 2000, 0.3, 600.0, 16
    spark = get_spark(app="sched_phases", cores=32, shuffle_partitions=32)
    B.warmup(spark, os.environ.get("SPARK_GRAFT_SF_DIR",
                                   "/root/testdata/sf0.1"))
    fx = B.sched_fixtures(spark, n_urls, n_hosts, seen_frac)
    rng = np.random.default_rng(42)
    delays = rng.choice([0.3, 0.5, 1.0], size=n_hosts)
    quota_cfg = spark.createDataFrame(pd.DataFrame({
        "host": [f"host{k}.example" for k in range(n_hosts)],
        "crawl_delay": delays,
        "quota": (round_seconds / delays).astype(np.int32)}))

    def noop(df, label):
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        print(f"{label}: {dt:.2f}s", flush=True)
        return dt

    frontier = spark.read.parquet(fx["frontier"])
    noop(frontier, "scan_only")
    resolved = (frontier
                .select("raw_url", "depth", "discovery_seq")
                .withColumn("r", resolve_udf("raw_url",
                                             F.lit(None).cast("string")))
                .select(F.col("r.url").alias("url"),
                        F.col("r.host").alias("host"),
                        F.col("r.url_hash").alias("url_hash"),
                        "depth", "discovery_seq")
                .withColumn("bucket",
                            F.pmod(F.abs("url_hash"),
                                   F.lit(B.SCHED_BUCKETS)).cast("int")))
    noop(resolved, "scan+resolve")
    shards_df = spark.read.parquet(fx["bloom_shards"])
    probe = partitioned_probe_fn(resolved.columns)
    out_schema = T.StructType(
        list(resolved.schema.fields)
        + [T.StructField("maybe", T.BooleanType())])
    probed = (resolved.groupBy("bucket")
              .cogroup(shards_df.groupBy("bucket"))
              .applyInPandas(probe, schema=out_schema))
    noop(probed, "scan+resolve+probe")
    definite_new = probed.where(~F.col("maybe")).drop("maybe")
    to_confirm = probed.where(F.col("maybe")).drop("maybe")
    seen = spark.read.parquet(fx["url_seen"]).select(
        "bucket", "url_hash", "url")
    confirmed = to_confirm.join(seen, ["bucket", "url_hash", "url"],
                                "left_anti")
    fresh = definite_new.unionByName(confirmed)
    noop(fresh, "..+anti")
    ranked = politeness_rank(
        fresh.select("url_hash", "host", "depth", "discovery_seq"),
        quota_cfg,
        [F.col("depth").asc(), F.col("discovery_seq").asc()],
        n_salt, 1, round_seconds,
        max_quota=int(round_seconds / delays.min()))
    noop(ranked, "..+rank")
    scheduled = frontier.drop("raw_url").join(
        F.broadcast(ranked.select("url_hash", "discovery_seq", "fetch_slot",
                                  "fetch_ts")),
        ["url_hash", "discovery_seq"])
    noop(scheduled, "..+late_join(noop)")
    import shutil
    sink = "/tmp/spark_graft_sched_sink_prof"
    shutil.rmtree(sink, ignore_errors=True)
    t0 = time.time()
    scheduled.write.mode("overwrite").parquet(sink)
    print(f"full+parquet_sink: {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
