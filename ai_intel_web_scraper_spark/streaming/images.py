"""Streaming image-archive dedup — the continuous-crawl image path.

In production the crawler's image pairs land on a queue; each micro-batch
of NEW images must be checked against the ever-growing archive without
ever re-pairing the archive with itself. This module runs exactly that
loop in Structured Streaming: a `foreachBatch` sink probes the batch
against the PERSISTED phash block table (`dedup.hamming_block_rows`
layout, the same table `incremental_phash_neardup` consumes) and then
appends the batch's own block rows, so the next batch sees it.

Batch-boundary invariance is the correctness contract: the union of all
per-batch pair sets equals the ONE-SHOT incremental probe of all new
images against the initial archive — a pair between two new images lands
either in its batch's within-join (same batch) or in a later batch's
probe against the by-then-appended blocks (different batches); the
initial archive never self-pairs either way. The pytest drives the same
rows through 1-batch and 3-batch splits and asserts identical output;
the driver query's oracle is the batching-free brute force.

foreachBatch runs micro-batches SEQUENTIALLY, which is what makes the
read-then-append on the block table safe without a lock.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

IMAGE_SCHEMA = "image_id string, phash long"


def streaming_incremental_phash_dedup(spark: SparkSession, new_dir: str,
                                      archive_df: DataFrame,
                                      max_hamming: int = 6,
                                      work_dir: str | None = None
                                      ) -> DataFrame:
    """Drive the streaming dedup loop over a parquet file source
    (maxFilesPerTrigger=1 — each file becomes one micro-batch, the test
    harness's stand-in for queue triggers) to completion and return the
    accumulated pair frame (id_a, id_b, hamming), id_a < id_b.

    `archive_df` seeds the persisted block table; per batch the work is
    blocking the DELTA plus one broadcast probe join — the archive is
    scanned, never re-derived or shuffled (`broadcast_delta` contract).
    vs_index is intentionally dropped: which side of a batch boundary a
    new-new pair lands on is a scheduling artifact, not a property of
    the data."""
    from ..operators.dedup import (hamming_block_rows,
                                   incremental_hamming_neardup)

    work = work_dir or f"/tmp/stream_img_dedup_{uuid.uuid4().hex[:8]}"
    blocks_path = os.path.join(work, "blocks")
    pairs_path = os.path.join(work, "pairs")
    (hamming_block_rows(archive_df, "image_id", "phash", max_hamming)
     .write.mode("overwrite").parquet(blocks_path))

    def process(batch_df, _batch_id):
        blocks = spark.read.parquet(blocks_path)
        pairs = incremental_hamming_neardup(
            batch_df, None, "image_id", "phash", max_hamming,
            index_blocks=blocks, broadcast_delta=True)
        (pairs.drop("vs_index")
         .write.mode("append").parquet(pairs_path))
        # append AFTER probing: the batch must not pair with itself
        # through the store (its within-batch pairs come from the
        # operator's own new-new join)
        (hamming_block_rows(batch_df, "image_id", "phash", max_hamming)
         .write.mode("append").parquet(blocks_path))

    q = (spark.readStream.schema(IMAGE_SCHEMA)
         .option("maxFilesPerTrigger", 1).parquet(new_dir)
         .writeStream.foreachBatch(process)
         .option("checkpointLocation", os.path.join(work, "ckpt"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    if not os.path.isdir(pairs_path):
        # an empty source never fires foreachBatch — no-pairs is a
        # result, not a read error
        return spark.createDataFrame(
            [], "id_a string, id_b string, hamming int")
    return spark.read.parquet(pairs_path)
