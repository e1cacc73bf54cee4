"""Sources/sinks: validated JSON loading (S8), cursor pagination (S3/S4),
keyed upsert into the snapshot store (S9)."""

from __future__ import annotations

import json
import os

from ai_intel_web_scraper_spark.crawl.statestore import (SnapshotStore,
                                                         merge_upsert)
from ai_intel_web_scraper_spark.sources.records import (
    cursor_paginated_source, load_source_records)


def test_load_source_records_validates_and_counts(spark, tmp_path):
    d = tmp_path / "raw" / "nested"
    os.makedirs(d)
    good = {"id": "kx-docs-abc", "origin": "kx", "source_type": "docs",
            "url": "https://a/b", "title": "t", "text": "hello world",
            "topics": ["x"], "word_count": 2}
    with open(d / "a.json", "w") as f:
        f.write(json.dumps(good) + "\n")
        f.write('{"this is not valid json\n')          # corrupt line
        f.write(json.dumps({"origin": "kx"}) + "\n")    # missing id
    valid, invalid = load_source_records(spark, str(tmp_path / "raw"))
    rows = valid.collect()
    assert len(rows) == 1 and rows[0]["id"] == "kx-docs-abc"
    assert rows[0]["topics"] == ["x"]
    assert invalid.first()["invalid_records"] == 2


def test_cursor_paginated_source_drains_pages(spark):
    """Deterministic fake cursor API: 3 pages then exhaustion."""
    pages = {None: ([(1, "a"), (2, "b")], "c1"),
             "c1": ([(3, "c")], "c2"),
             "c2": ([(4, "d")], None)}

    calls = []

    def fetch(cursor):
        calls.append(cursor)
        return pages[cursor]

    df = cursor_paginated_source(spark, fetch, "id long, v string")
    assert sorted((r["id"], r["v"]) for r in df.collect()) == \
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    assert calls == [None, "c1", "c2"]


def test_merge_upsert_updates_and_inserts(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "wh"),
                          schemas={"chunks": "cid string, txt string"})
    base = spark.createDataFrame([("a", "one"), ("b", "two")],
                                 "cid string, txt string")
    store.stage_write("chunks", base, "replace")
    store.commit(0)
    updates = spark.createDataFrame([("b", "TWO"), ("c", "three")],
                                    "cid string, txt string")
    merge_upsert(store, "chunks", updates, ["cid"])
    store.commit(1)
    got = {r["cid"]: r["txt"] for r in store.read("chunks").collect()}
    assert got == {"a": "one", "b": "TWO", "c": "three"}
    # time travel still sees the pre-merge state
    old = {r["cid"]: r["txt"] for r in
           store.read("chunks", snap_id=1).collect()}
    assert old == {"a": "one", "b": "two"}


def test_vectorize_pipeline_upserts_changed_docs(spark, sf_dir, tmp_path):
    """SURVEY §3.3 end-to-end: chunk -> embed -> upsert; re-vectorizing a
    CHANGED document replaces its chunks while others survive, and the
    pre-change snapshot remains readable."""
    from pyspark.sql import functions as F

    from ai_intel_web_scraper_spark.pipelines import vectorize
    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .limit(30).persist())
    wh = str(tmp_path / "vec_wh")
    store = vectorize(spark, docs, wh)
    first = store.read("chunks").persist()
    n1 = first.count()
    assert n1 > 30  # multiple chunks per doc
    assert first.where(F.size("embedding") > 0).count() == n1
    assert first.select("chunk_id").distinct().count() == n1

    # change one document's text and re-vectorize everything
    changed = docs.withColumn(
        "text", F.when(F.col("doc_id") == docs.first()["doc_id"],
                       F.lit("totally new words " * 30))
        .otherwise(F.col("text")))
    store2 = vectorize(spark, changed, wh)
    second = store2.read("chunks")
    changed_id = docs.first()["doc_id"]
    old_rows = {r["chunk_id"] for r in
                first.where(F.col("doc_id") != changed_id)
                .select("chunk_id").collect()}
    new_rows = {r["chunk_id"] for r in
                second.where(F.col("doc_id") != changed_id)
                .select("chunk_id").collect()}
    assert old_rows == new_rows  # untouched docs' chunks survive
    assert (second.where(F.col("doc_id") == changed_id).count()
            != first.where(F.col("doc_id") == changed_id).count()) or (
        {r["chunk_id"] for r in
         second.where(F.col("doc_id") == changed_id).collect()}
        != {r["chunk_id"] for r in
            first.where(F.col("doc_id") == changed_id).collect()})
    # time travel: snapshot 1 still shows the original chunk set
    assert store2.read("chunks", snap_id=1).count() == n1
