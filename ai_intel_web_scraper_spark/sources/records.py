"""Record sources/sinks re-expressing the reference's file I/O (SURVEY
S7/S8/S11) plus the paginated-source pattern (S3/S4).

The reference loads JSON arrays per file with per-record Pydantic validation
and skips invalid rows with a counter (reference vectorstore/ingest.py:37-73);
here: explicit schema on read (never inferred), recursive lookup, and a
`_corrupt_record` column so the invalid-row metric is a cheap aggregation,
not a Python loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SOURCE_RECORD_SCHEMA = T.StructType([
    # reference schemas/source_record.py:37-57
    T.StructField("id", T.StringType()),
    T.StructField("origin", T.StringType()),
    T.StructField("source_type", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("scraped_date", T.DateType()),
    T.StructField("content_date", T.DateType()),
    T.StructField("topics", T.ArrayType(T.StringType())),
    T.StructField("subtopics", T.ArrayType(T.StringType())),
    T.StructField("credibility", T.StringType()),
    T.StructField("sentiment", T.StringType()),
    T.StructField("word_count", T.IntegerType()),
    T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    T.StructField("_corrupt_record", T.StringType()),
])


def load_source_records(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Recursive JSON source with validation accounting (SURVEY S8).
    Returns (valid_records, invalid_metric_df)."""
    df = (spark.read.schema(SOURCE_RECORD_SCHEMA)
          .option("recursiveFileLookup", "true")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(path))
    valid = df.where(F.col("_corrupt_record").isNull()
                     & F.col("id").isNotNull()).drop("_corrupt_record")
    invalid = (df.where(F.col("_corrupt_record").isNotNull()
                        | F.col("id").isNull())
               .agg(F.count("*").alias("invalid_records")))
    return valid, invalid


def record_id_col(origin, source_type, url):
    """SURVEY C11: deterministic record id
    `{origin}-{source_type}-{sha256(url)[:12]}`
    (reference scrapers/utils.py:249-252)."""
    return F.concat_ws("-", origin, source_type,
                       F.substring(F.sha2(url, 256), 1, 12))


def paginated_urls(spark: SparkSession, pattern: str,
                   first: int = 2, last: int = 99) -> DataFrame:
    """SURVEY S11: pagination pre-seeding — generate listing URLs
    `pattern % page` for pages [first, last] (reference
    scrapers/blog_scraper.py:102-115) as a distributed range, no driver loop."""
    return (spark.range(first, last + 1)
            .select(F.col("id").cast("int").alias("page"),
                    F.format_string(pattern, F.col("id")).alias("url")))


def cursor_paginated_source(spark: SparkSession, fetch_page,
                            schema, max_pages: int = 10_000,
                            pages_per_batch: int = 64,
                            checkpoint_every_batches: int = 16) -> DataFrame:
    """SURVEY S3/S4: cursor/offset-paginated external source. The reference
    loops GitHub REST pages (`page`,`per_page` until empty,
    github_scraper.py:113-216) and GraphQL cursors (`after`/`hasNextPage`,
    github_scraper.py:233-334). Generic shape: `fetch_page(cursor) ->
    (rows, next_cursor|None)`. Pages are flushed into one DataFrame per
    `pages_per_batch` — the cursor protocol forces rows through the driver
    anyway, so batching keeps the driver holding at most one batch of rows
    — and every `checkpoint_every_batches` flushes the accumulated union is
    localCheckpoint-ed, so plan depth stays bounded at a constant
    (~checkpoint_every_batches union nodes) no matter how many pages a
    drain walks; a 10k-page drain otherwise builds a 160-union plan whose
    analysis cost grows quadratically."""
    out = None
    cursor = None
    buf: list = []
    pages_in_buf = 0
    flushes_since_ckpt = 0

    def flush(acc, rows):
        nonlocal flushes_since_ckpt
        if not rows:
            return acc
        df = spark.createDataFrame(rows, schema)
        acc = df if acc is None else acc.unionByName(df)
        flushes_since_ckpt += 1
        if flushes_since_ckpt >= checkpoint_every_batches:
            acc = acc.localCheckpoint(eager=True)
            flushes_since_ckpt = 0
        return acc

    for _ in range(max_pages):
        rows, cursor = fetch_page(cursor)
        if rows:
            buf.extend(rows)
            pages_in_buf += 1
        if pages_in_buf >= pages_per_batch:
            out = flush(out, buf)
            buf, pages_in_buf = [], 0
        if cursor is None:
            break
    out = flush(out, buf)
    return out if out is not None else spark.createDataFrame([], schema)
