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


def test_cursor_paginated_source_deep_drain_bounded_plan(spark):
    """A ~1k-page drain must keep plan depth constant (localCheckpoint
    every checkpoint_every_batches flushes), not build a deep union chain
    whose analysis cost grows with page count."""
    n_pages = 1000

    def fetch(cursor):
        start = int(cursor or 0)
        nxt = start + 1
        return ([(start, f"v{start}")],
                str(nxt) if nxt < n_pages else None)

    df = cursor_paginated_source(spark, fetch, "id long, v string",
                                 pages_per_batch=8,
                                 checkpoint_every_batches=4)
    # plan depth: count Union nodes in the analyzed plan — bounded by the
    # checkpoint cadence (<= checkpoint_every_batches), not pages/batch
    plan = df._jdf.queryExecution().analyzed().toString()
    assert plan.count("Union") <= 4, plan
    assert df.count() == n_pages
    assert df.agg({"id": "min"}).first()[0] == 0
    assert df.agg({"id": "max"}).first()[0] == n_pages - 1


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


def test_backoff_requeue_defers_rate_limited(spark):
    """S5 429 handling (community_scraper.py:130-133) as data-driven
    requeue: rate-limited queries get deadline+60 and attempt+1; others
    drop out as done."""
    from ai_intel_web_scraper_spark.sources.community import backoff_requeue
    q = spark.createDataFrame(
        [(1, 200, 0.0, 1), (2, 429, 10.0, 1), (3, 429, 20.0, 2)],
        "query_id long, status int, deadline double, attempt int")
    nxt = {r["query_id"]: (r["deadline"], r["attempt"])
           for r in backoff_requeue(q).collect()}
    assert nxt == {2: (70.0, 2), 3: (80.0, 3)}


def test_hn_conditional_comment_fetch(spark):
    """S6: comments join only for points > 5 (community_scraper.py:239-243)
    even when the items table HAS comments for the story."""
    from ai_intel_web_scraper_spark.sources.community import hn_records
    hits = spark.createDataFrame(
        [("1", "low points story", "", 3, 5, "a", 0),
         ("2", "high points story", "https://x.example", 9, 5, "b", 1)],
        "objectID string, title string, url string, points int, "
        "num_comments int, author string, query_seq long")
    comments = spark.createDataFrame(
        [("1", 0, "u1", "<p>ignored words</p>"),
         ("2", 1, "u3", "<i>second</i> comment"),
         ("2", 0, "u2", "<p>first</p> comment")],
        "story_id string, comment_seq int, author string, text string")
    rows = {r["url"]: r for r in
            hn_records(hits, comments, "acme").collect()}
    low = rows["https://news.ycombinator.com/item?id=1"]
    high = rows["https://news.ycombinator.com/item?id=2"]
    assert low["n_top_comments"] == 0 and "Top Comments" not in low["text"]
    assert high["n_top_comments"] == 2
    # comment order by comment_seq, HTML stripped (tags become spaces,
    # no whitespace normalize — faithful to community_scraper.py:287),
    # author formatting
    assert high["text"].index("**u2**: first  comment") \
        < high["text"].index("**u3**: second  comment")
    assert "Original URL: https://x.example" in high["text"]
    assert "Original URL" not in low["text"]


def test_reddit_wave_dedup_keeps_first_wave(spark):
    from ai_intel_web_scraper_spark.sources.community import reddit_records
    mk = lambda seq, score: ("/r/s/comments/9", "a post title here with words",
                             "body words making this long enough to keep ok",
                             "s", score, 1, "u", 1.6e9, seq)
    posts = spark.createDataFrame(
        [mk(5, 100), mk(2, 200), mk(9, 300)],
        "permalink string, title string, selftext string, subreddit string, "
        "score int, num_comments int, author string, created_utc double, "
        "query_seq long")
    out = reddit_records(posts, "acme").collect()
    assert len(out) == 1 and out[0]["score"] == 200  # smallest query_seq


def test_parse_sitemaps_fields_and_degradation(spark):
    from ai_intel_web_scraper_spark.sources.sitemaps import (
        SITEMAP_DEFAULT_PRIORITY_PPM, parse_sitemaps)
    body = ('<?xml version="1.0"?><urlset>'
            '<url><loc> https://h.example/a </loc>'
            '<lastmod>2024-01-11</lastmod><priority>0.8</priority></url>'
            '<url><loc>https://h.example/b</loc></url>'
            '<url><lastmod>2024-02-03</lastmod></url>'          # no loc
            '<url><loc>https://h.example/c</loc>'
            '<lastmod>2024-13-45</lastmod>'                     # bad date
            '<priority>high</priority></url>'                   # bad prio
            '<url><loc>https://h.example/d</loc>'
            '<priority>1.0</priority></url>'
            '<url><loc>https://h.example/e</loc>'
            '<priority>0.85</priority></url>'                   # 2 decimals
            '<url><loc>https://h.example/f</loc>'
            '<priority>0.05</priority></url>'
            '<url><loc>https://h.example/g</loc>'
            '<priority>1.5</priority></url>'                    # clamps
            '<url><loc>https://h.example/h</loc>'
            '<priority>1</priority></url>'                      # no fraction
            '</urlset>')
    df = spark.createDataFrame([("h.example", body)],
                               "host string, body string")
    got = {r["url"]: (r["lastmod_day"], r["priority_ppm"])
           for r in parse_sitemaps(df).collect()}
    import datetime as dt
    day = (dt.date(2024, 1, 11) - dt.date(1970, 1, 1)).days
    assert got == {
        "https://h.example/a": (day, 800_000),
        "https://h.example/b": (None, SITEMAP_DEFAULT_PRIORITY_PPM),
        "https://h.example/c": (None, SITEMAP_DEFAULT_PRIORITY_PPM),
        "https://h.example/d": (None, 1_000_000),
        "https://h.example/e": (None, 850_000),
        "https://h.example/f": (None, 50_000),
        "https://h.example/g": (None, 1_000_000),
        "https://h.example/h": (None, 1_000_000),
    }


def test_sitemap_index_children(spark):
    from ai_intel_web_scraper_spark.sources.sitemaps import (
        sitemap_index_children)
    body = ('<sitemapindex>'
            '<sitemap><loc>https://h.example/sm1.xml</loc>'
            '<lastmod>2024-01-01</lastmod></sitemap>'
            '<sitemap><loc>https://h.example/sm2.xml</loc></sitemap>'
            '<sitemap></sitemap>'
            '</sitemapindex>')
    df = spark.createDataFrame([("h.example", body)],
                               "host string, body string")
    got = sorted(r["child_url"]
                 for r in sitemap_index_children(df).collect())
    assert got == ["https://h.example/sm1.xml", "https://h.example/sm2.xml"]


def test_sitemap_driver_fixture_python_replay(spark):
    """The driver fixture parsed by the engine must match a plain-Python
    re-parse of the same bodies (independent of both SQL engines)."""
    import re as _re
    import datetime as dt
    import __spark_entry__ as E
    from ai_intel_web_scraper_spark.sources.sitemaps import (
        SITEMAP_DEFAULT_PRIORITY_PPM, parse_sitemaps)
    rows = E._sitemap_fixture_rows()
    df = spark.createDataFrame(rows, "host string, body string")
    got = sorted((r["host"], r["url"], r["lastmod_day"], r["priority_ppm"])
                 for r in parse_sitemaps(df).collect())
    want = []
    for host, body in rows:
        for blk in _re.findall(r"(?s)<url>(.*?)</url>", body):
            m = _re.search(r"<loc>\s*([^<\s][^<]*?)\s*</loc>", blk)
            if not m:
                continue
            dm = _re.search(r"<lastmod>\s*(\d{4}-\d{2}-\d{2})", blk)
            day = None
            if dm:
                try:
                    day = (dt.date.fromisoformat(dm.group(1))
                           - dt.date(1970, 1, 1)).days
                except ValueError:
                    day = None
            pm = _re.search(
                r"<priority>\s*([01])(?:\.(\d{1,6})\d*)?\s*</priority>",
                blk)
            if pm:
                frac = (pm.group(2) or "").ljust(6, "0")
                ppm = min(int(pm.group(1)) * 1_000_000 + int(frac),
                          1_000_000)
            else:
                ppm = SITEMAP_DEFAULT_PRIORITY_PPM
            want.append((host, m.group(1), day, ppm))
    assert got == sorted(want) and len(got) > 200


def test_robots_sitemap_discovery_matches_ground_truth(spark, fixtures):
    """The native-regexp Sitemap: extraction over RAW robots bodies must
    equal the generator's oracle-only ground-truth column, in file
    order, including mixed-case directive keys; the Python helper
    agrees."""
    from ai_intel_web_scraper_spark.functions.robots import (
        ROBOTS_SITEMAP_RE, robots_sitemap_urls)
    from pyspark.sql import functions as F
    rob = spark.read.parquet(fixtures["robots"])
    got = {(r["host"], r["pos"]): r["u"] for r in rob.select(
        "host", F.posexplode(F.regexp_extract_all(
            "body", F.lit(ROBOTS_SITEMAP_RE), 1)).alias("pos", "u"))
        .collect()}
    want = {}
    py = {}
    for r in rob.select("host", "body", "sitemap_urls").collect():
        for i, u in enumerate(r["sitemap_urls"]):
            want[(r["host"], i)] = u
        for i, u in enumerate(robots_sitemap_urls(r["body"])):
            py[(r["host"], i)] = u
    assert got == want == py and len(got) > 0


def test_warc_roundtrip_and_degradation(spark):
    """WARC framing: build->parse round trip preserves every field;
    malformed blobs degrade per archive (records before the cut parse,
    one parse_ok=false row accounts for the tail, other archives
    untouched); bodies split on the FIRST blank line."""
    from ai_intel_web_scraper_spark.sources.warc import (
        build_warc, http_response_body, parse_warc, read_warc_records)
    recs = [(f"urn:r:{i}", "response", f"https://h/{i}",
             "2024-01-01T00:00:00Z",
             b"HTTP/1.1 200 OK\r\n\r\nbody " + str(i).encode()
             + (b"\r\n\r\ntrailing blank line" if i == 1 else b""))
            for i in range(3)]
    blob = build_warc(recs)
    parsed, clean = parse_warc(blob)
    assert clean and [(r[0], r[5]) for r in parsed] == \
        [(f"urn:r:{i}", recs[i][4]) for i in range(3)]
    cut, clean2 = parse_warc(blob[:-7])   # last record loses its tail
    assert not clean2 and len(cut) == 2
    garbage, clean3 = parse_warc(blob + b"NOT A WARC HEADER")
    assert not clean3 and len(garbage) == 3
    df = spark.createDataFrame(
        [("good", bytearray(blob)), ("cut", bytearray(blob[:-7])),
         ("junk", bytearray(b"hello"))],
        "archive_id string, warc_bytes binary")
    out = (read_warc_records(df)
           .withColumn("body", http_response_body("content")).collect())
    by_archive = {}
    for r in out:
        by_archive.setdefault(r["archive_id"], []).append(r)
    assert len(by_archive["good"]) == 3
    assert all(r["parse_ok"] for r in by_archive["good"])
    # FIRST-blank-line split: record 1's body keeps ITS OWN blank line
    bodies = {r["record_id"]: r["body"] for r in by_archive["good"]}
    assert bodies["urn:r:1"] == "body 1\r\n\r\ntrailing blank line"
    assert bodies["urn:r:0"] == "body 0"
    cut_rows = by_archive["cut"]
    assert sum(r["parse_ok"] for r in cut_rows) == 2
    assert sum(not r["parse_ok"] for r in cut_rows) == 1
    assert [r["parse_ok"] for r in by_archive["junk"]] == [False]
