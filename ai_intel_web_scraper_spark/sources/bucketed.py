"""Bucketed table writer/reader: the co-located-join lever.

At 10^10-URL scale the recurring joins of the crawl round — frontier ⋈
url_seen (anti), fetched ⋈ host_state, codes ⋈ inverted-list metadata —
all key on the same column family (url_hash / host / cluster id). Writing
both sides bucketed by that key with the SAME bucket count lets Spark's
SortMergeJoin consume the tables' existing layout: `.explain` shows NO
Exchange on either side, so the join costs a local sort-merge per bucket
instead of a full shuffle of both inputs every round (pytest asserts the
Exchange-free plan).

This is metadata-driven (the bucket spec lives in the table catalog), so
it composes with everything else: filters still push down, AQE still
coalesces, and the SnapshotStore swap-in point (`crawl/statestore.py`)
maps directly onto Iceberg's `bucket(N, col)` partition transform.

The reference has no storage layout at all (JSON files per scrape,
`scrapers/utils.py:296-308`); this is pure scale machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int, sort_col: str | None = None,
                   mode: str = "overwrite") -> None:
    """Persist `df` as a bucketed catalog table: hash-bucketed by
    `bucket_col` into `n_buckets` files per partition, each bucket
    sorted by `sort_col` (default: the bucket column) so the merge side
    of a later join needs no sort either."""
    (df.write.mode(mode)
     .bucketBy(n_buckets, bucket_col)
     .sortBy(sort_col or bucket_col)
     .format("parquet")
     .saveAsTable(table))


def read_bucketed(spark, table: str) -> DataFrame:
    """Read back a bucketed table THROUGH the catalog (a plain
    spark.read.parquet on the files would drop the bucket metadata and
    reintroduce the shuffle)."""
    return spark.table(table)


def cobucketed_join(left: DataFrame, right: DataFrame, on,
                    how: str = "inner") -> DataFrame:
    """Join two co-bucketed tables. Nothing special happens here — the
    point is what does NOT happen: with both sides bucketed on the join
    key at equal bucket counts, the optimizer plans a SortMergeJoin with
    zero Exchange operators (asserted by tests/test_bucketed.py). Kept
    as a named helper so call sites document the layout contract."""
    return left.join(right, on, how)
