"""Regression tests for engine edge cases found in review: budget
exhaustion, alias seeds, bucket-count independence, bloom staleness across
config toggles."""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ai_intel_web_scraper_spark.crawl.scheduler import CrawlConfig, CrawlEngine
from ai_intel_web_scraper_spark.functions.urls import canonicalize_url, url_hash64
from ai_intel_web_scraper_spark.oracle.crawler import oracle_crawl


def _mini_fixtures(out: str, seeds: list[tuple[int, str, float]],
                   pages: dict[str, list[str]], max_pages: int = 1,
                   max_depth: int = 3) -> dict:
    """Hand-built one-host web: pages maps url -> out_links."""
    os.makedirs(out, exist_ok=True)
    paths = {n: os.path.join(out, f"{n}.parquet")
             for n in ("web_graph", "seeds", "politeness", "robots")}
    host = "h0.example"
    pq.write_table(pa.Table.from_pylist(
        [{"seed_seq": s, "url": u, "priority": p} for s, u, p in seeds],
        schema=pa.schema([("seed_seq", pa.int64()), ("url", pa.string()),
                          ("priority", pa.float64())])), paths["seeds"])
    graph = []
    for u, links in pages.items():
        cu = canonicalize_url(u)
        h = url_hash64(cu)
        graph.append({"url": cu, "host": host, "path": cu.split(host)[1],
                      "url_hash": h, "bucket": int(abs(h)) % 16,
                      "status": 200, "fail_attempts": 0,
                      "out_links": links, "image_id": f"img-{len(graph)}"})
    pq.write_table(pa.Table.from_pylist(graph, schema=pa.schema([
        ("url", pa.string()), ("host", pa.string()), ("path", pa.string()),
        ("url_hash", pa.int64()), ("bucket", pa.int32()),
        ("status", pa.int32()), ("fail_attempts", pa.int32()),
        ("out_links", pa.list_(pa.string())), ("image_id", pa.string())])),
        paths["web_graph"])
    pq.write_table(pa.Table.from_pylist(
        [{"host": host, "crawl_delay": 1.0, "max_pages": max_pages,
          "max_depth": max_depth, "exclude_patterns": ["/tag/"]}],
        schema=pa.schema([("host", pa.string()),
                          ("crawl_delay", pa.float64()),
                          ("max_pages", pa.int32()),
                          ("max_depth", pa.int32()),
                          ("exclude_patterns", pa.list_(pa.string()))])),
        paths["politeness"])
    pq.write_table(pa.Table.from_pylist(
        [{"host": host, "disallow": [], "crawl_delay_override": None,
          "body": "User-agent: *\nDisallow:\n"}],
        schema=pa.schema([("host", pa.string()),
                          ("disallow", pa.list_(pa.string())),
                          ("crawl_delay_override", pa.float64()),
                          ("body", pa.string())])), paths["robots"])
    return paths


BASE = "https://h0.example"


@pytest.fixture()
def mini(tmp_path):
    """Two pages linking to each other, but max_pages=1: the budget
    exhausts with a non-empty frontier."""
    return _mini_fixtures(
        str(tmp_path / "fx"),
        seeds=[(0, f"{BASE}/p/0", 0.5)],
        pages={f"{BASE}/p/0": [f"{BASE}/p/1"],
               f"{BASE}/p/1": [f"{BASE}/p/0"]},
        max_pages=1)


def test_budget_exhaustion_terminates_cleanly(spark, mini, tmp_path):
    """When every remaining host's budget is exhausted, the round must
    commit an empty frontier and stop — not crash on an empty quota table."""
    eng = CrawlEngine(spark, mini, str(tmp_path / "wh"),
                      CrawlConfig(write_payload=False, expected_urls=1024))
    rounds = eng.run()
    assert rounds[-1]["frontier_size"] == 0
    assert eng.store.read("fetched").count() == 1  # budget respected
    want = oracle_crawl(mini)
    assert len(want.fetched) == 1


def test_alias_seeds_fetch_once(spark, tmp_path):
    """Seed aliases (trailing slash/fragment variants of one URL) collapse
    to a single frontier row, like the oracle's add-before-enqueue skip."""
    fx = _mini_fixtures(
        str(tmp_path / "fx"),
        seeds=[(0, f"{BASE}/p/0", 0.9), (1, f"{BASE}/p/0/", 0.5),
               (2, f"{BASE}/p/0#frag", 0.1)],
        pages={f"{BASE}/p/0": []},
        max_pages=10)
    eng = CrawlEngine(spark, fx, str(tmp_path / "wh"),
                      CrawlConfig(write_payload=False, expected_urls=1024))
    eng.run()
    fetched = eng.store.read("fetched").collect()
    assert len(fetched) == 1
    assert fetched[0]["discovery_seq"] == 0  # keep-first by seed_seq
    want = oracle_crawl(fx)
    assert len(want.fetched) == 1


def test_engine_correct_with_non_default_bucket_count(spark, fixtures,
                                                      tmp_path, oracle_small):
    """cfg.n_buckets different from the fixture's on-disk 16-way bucketing
    must not change the crawl (URL equality is the fetch-join key)."""
    eng = CrawlEngine(spark, fixtures, str(tmp_path / "wh"),
                      CrawlConfig(write_payload=False, n_buckets=8,
                                  expected_urls=1 << 14))
    eng.run()
    got = [(r["url"], r["round"], r["discovery_seq"]) for r in
           eng.store.read("fetched")
           .select("url", "round", "depth", "discovery_seq")
           .orderBy("round", "depth", "discovery_seq").collect()]
    want = [(r["url"], r["round"], r["discovery_seq"])
            for r in oracle_small.fetched]
    assert got == want


@pytest.fixture(scope="module")
def oracle_small(fixtures):
    return oracle_crawl(fixtures)


def test_bloom_toggle_across_resume_never_refetches(spark, tmp_path):
    """bloom on -> resume with bloom off -> resume with bloom on: the
    sidecar must stay a superset of url_seen (maintained while disabled,
    rebuilt if missing) so no URL is ever fetched twice."""
    chain = {f"{BASE}/p/{i}": [f"{BASE}/p/{i+1}"] for i in range(6)}
    chain[f"{BASE}/p/6"] = [f"{BASE}/p/0"]  # cycle back: refetch bait
    fx = _mini_fixtures(str(tmp_path / "fx"),
                        seeds=[(0, f"{BASE}/p/0", 0.5)],
                        pages=chain, max_pages=50, max_depth=10)
    wh = str(tmp_path / "wh")
    CrawlEngine(spark, fx, wh, CrawlConfig(
        write_payload=False, use_bloom=True, expected_urls=1024)).run(
        max_rounds=2)
    CrawlEngine(spark, fx, wh, CrawlConfig(
        write_payload=False, use_bloom=False, expected_urls=1024)).run(
        max_rounds=2)
    eng = CrawlEngine(spark, fx, wh, CrawlConfig(
        write_payload=False, use_bloom=True, expected_urls=1024))
    eng.run()
    fetched = eng.store.read("fetched")
    assert fetched.count() == fetched.select("url").distinct().count()
    assert fetched.count() == 7  # the whole chain, each exactly once


@pytest.mark.parametrize("mode_seq", [
    ("partitioned", None, "partitioned"),   # probing-off rounds between
    ("broadcast", "partitioned", "broadcast"),  # mode switch and back
    ("partitioned", "cuckoo", "partitioned"),
])
def test_sidecar_mode_switches_never_refetch(spark, tmp_path, mode_seq):
    """Resuming under a different bloom_mode (or after probing-disabled
    rounds) must NOT trust the now-stale inactive sidecar: URLs first seen
    by the intervening rounds would probe 'definitely new' and be fetched
    twice. The validity marker forces a rebuild from url_seen instead."""
    chain = {f"{BASE}/p/{i}": [f"{BASE}/p/{i+1}"] for i in range(6)}
    chain[f"{BASE}/p/6"] = [f"{BASE}/p/0"]  # cycle back: refetch bait
    fx = _mini_fixtures(str(tmp_path / "fx"),
                        seeds=[(0, f"{BASE}/p/0", 0.5)],
                        pages=chain, max_pages=50, max_depth=10)
    wh = str(tmp_path / "wh")
    for i, mode in enumerate(mode_seq):
        cfg = CrawlConfig(write_payload=False, expected_urls=1024,
                          use_bloom=mode is not None,
                          bloom_mode=mode or "partitioned")
        eng = CrawlEngine(spark, fx, wh, cfg)
        eng.run(max_rounds=2 if i < len(mode_seq) - 1 else None)
    fetched = eng.store.read("fetched")
    assert fetched.count() == fetched.select("url").distinct().count()
    assert fetched.count() == 7  # the whole chain, each exactly once


def test_n_buckets_resize_resume_never_refetches(spark, tmp_path):
    """Resuming the same warehouse with a DIFFERENT n_buckets must not
    refetch seen URLs: stored url_seen.bucket values and sidecar shard
    bucketing from the old sizing are invalid under the new modulus, so
    both the anti-join key (recomputed bucket) and the sidecar (marker
    mismatch -> rebuild) must adapt."""
    chain = {f"{BASE}/p/{i}": [f"{BASE}/p/{i+1}"] for i in range(6)}
    chain[f"{BASE}/p/6"] = [f"{BASE}/p/0"]
    fx = _mini_fixtures(str(tmp_path / "fx"),
                        seeds=[(0, f"{BASE}/p/0", 0.5)],
                        pages=chain, max_pages=50, max_depth=10)
    for mode in ("partitioned", "broadcast"):
        wh = str(tmp_path / f"wh_{mode}")
        CrawlEngine(spark, fx, wh, CrawlConfig(
            write_payload=False, expected_urls=1024, n_buckets=16,
            bloom_mode=mode)).run(max_rounds=2)
        eng = CrawlEngine(spark, fx, wh, CrawlConfig(
            write_payload=False, expected_urls=1024, n_buckets=64,
            bloom_mode=mode))
        eng.run()
        fetched = eng.store.read("fetched")
        assert fetched.count() == fetched.select("url").distinct().count(), mode
        assert fetched.count() == 7, mode


@pytest.mark.parametrize("seed,n_hosts,pages,dup", [
    (101, 7, 200, 0.0),
    (202, 3, 90, 0.3),
    (303, 12, 350, 0.1),
])
def test_randomized_webs_match_oracle(spark, tmp_path, seed, n_hosts,
                                      pages, dup):
    """Crawl parity must hold on arbitrary web shapes, not just the one
    fixture: random seeds, host counts, sizes, and image-dup rates."""
    from ai_intel_web_scraper_spark.synth.generator import (WebSpec,
                                                            generate_fixtures)
    spec = WebSpec(seed=seed, n_hosts=n_hosts, total_pages=pages,
                   dup_frac=dup)
    fx = generate_fixtures(spec, str(tmp_path / "fx"), with_bytes=False)
    eng = CrawlEngine(spark, fx, str(tmp_path / "wh"),
                      CrawlConfig(write_payload=False, expected_urls=1 << 12))
    eng.run()
    want = oracle_crawl(fx)
    got = [(r["url"], r["round"], r["depth"], r["discovery_seq"]) for r in
           eng.store.read("fetched")
           .select("url", "round", "depth", "discovery_seq")
           .orderBy("round", "depth", "discovery_seq").collect()]
    assert got == [(r["url"], r["round"], r["depth"], r["discovery_seq"])
                   for r in want.fetched]
    got_seen = {r["url"] for r in
                eng.store.read("url_seen").select("url").collect()}
    assert got_seen == want.url_seen


def test_partitioned_bloom_mode_is_bit_identical(spark, fixtures, tmp_path):
    """bloom_mode='partitioned' (executor-resident per-bucket shard table,
    cogrouped probe, executor OR-merge — the driver never materializes the
    sidecar) must produce exactly the same crawl as the broadcast-blob
    mode, including discovery order."""
    results = {}
    for mode in ("broadcast", "partitioned", "cuckoo"):
        wh = str(tmp_path / f"wh_{mode}")
        shutil.rmtree(wh, ignore_errors=True)
        eng = CrawlEngine(spark, fixtures, wh,
                          CrawlConfig(expected_urls=1 << 14,
                                      write_payload=False, bloom_mode=mode))
        eng.run(max_rounds=4)
        fetched = sorted(
            (r["url"], r["round"], r["depth"], r["discovery_seq"],
             r["fetch_slot"])
            for r in eng.store.read("fetched").collect())
        seen = sorted(r["url"] for r in eng.store.read("url_seen").collect())
        results[mode] = (fetched, seen)
    assert results["broadcast"] == results["partitioned"]
    # the cuckoo sidecar (north-rule alternative; cogrouped single-owner
    # insert instead of OR-merge) must also be bit-identical
    assert results["broadcast"] == results["cuckoo"]
    # and the executor-resident runs never staged a SIDECAR blob (the
    # few-byte sidecar_meta validity marker is metadata, not the filter)
    for mode in ("partitioned", "cuckoo"):
        blob_dir = os.path.join(str(tmp_path / f"wh_{mode}"), "blobs")
        non_meta = [f for f in os.listdir(blob_dir)
                    if not f.startswith("sidecar_meta")]
        assert not non_meta


def test_counting_bloom_executor_merge_path(spark):
    """CountingBloomShards.merge_bitmap: executor-built partials merged by
    saturating counter addition must answer probes exactly like single-shot
    add_many, and deletes must still work after the merge."""
    import numpy as np
    from ai_intel_web_scraper_spark.crawl.bloom import (
        CountingBloomShards, partial_counting_bitmaps)
    rng = np.random.default_rng(7)
    hashes = rng.integers(-(1 << 62), 1 << 62, 4000, dtype=np.int64)
    buckets = (np.abs(hashes) % 8).astype(np.int64)
    m_bits = 1 << 15

    # single-shot reference
    ref = CountingBloomShards(8, m_bits)
    ref.add_many(buckets, hashes)

    # executor path: partials per half, merged via merge_bitmap
    merged = CountingBloomShards(8, m_bits)
    for lo, hi in ((0, 2000), (2000, 4000)):
        import pandas as pd
        part_iter = partial_counting_bitmaps(m_bits)(
            iter([pd.DataFrame({"bucket": buckets[lo:hi],
                                "url_hash": hashes[lo:hi]})]))
        for pdf in part_iter:
            for b, raw in zip(pdf["bucket"], pdf["bitmap"]):
                merged.merge_bitmap(int(b),
                                    np.frombuffer(raw, dtype=np.uint8))
    probe_h = np.concatenate([hashes[:100],
                              rng.integers(-(1 << 62), 1 << 62, 100,
                                           dtype=np.int64)])
    probe_b = (np.abs(probe_h) % 8).astype(np.int64)
    assert (merged.maybe_contains(probe_b, probe_h)
            == ref.maybe_contains(probe_b, probe_h)).all()
    # all inserted keys still positive; removal works post-merge
    assert merged.maybe_contains(buckets, hashes).all()
    merged.remove_many(buckets[:500], hashes[:500])
    # removed keys MAY still read positive (shared slots), but the merge
    # must not have corrupted counters: re-adding restores full positives
    merged.add_many(buckets[:500], hashes[:500])
    assert merged.maybe_contains(buckets, hashes).all()


def test_dataframe_host_state_mode_is_bit_identical(spark, fixtures,
                                                    tmp_path):
    """host_state_mode='dataframe' (quota derivation, alive/max/sum
    scalars, and the fetched_count update all run as Spark jobs — the
    driver never holds the host table) must produce exactly the same crawl
    as the pandas-cache mode, including budget-exhaustion behavior."""
    results = {}
    for mode in ("pandas", "dataframe"):
        wh = str(tmp_path / f"wh_hs_{mode}")
        shutil.rmtree(wh, ignore_errors=True)
        eng = CrawlEngine(spark, fixtures, wh,
                          CrawlConfig(expected_urls=1 << 14,
                                      write_payload=False,
                                      host_state_mode=mode))
        eng.run(max_rounds=4)
        fetched = sorted(
            (r["url"], r["round"], r["depth"], r["discovery_seq"],
             r["fetch_slot"])
            for r in eng.store.read("fetched").collect())
        hs = sorted((r["host"], r["fetched_count"])
                    for r in eng.store.read("host_state").collect())
        results[mode] = (fetched, hs)
    assert results["pandas"] == results["dataframe"]


def test_partitioned_probe_self_describes_width_and_merges_mixed(spark):
    """A warehouse reopened with a different expected_urls sizing leaves
    shard rows of two widths in the same bucket: the probe must read each
    at its own width (len(bitmap)*8) and OR the verdicts — probing a
    stored shard at the wrong width would yield false 'definitely new'
    verdicts that bypass the exact anti-join."""
    import numpy as np
    import pandas as pd

    from ai_intel_web_scraper_spark.crawl.bloom import (BloomShards,
                                                        partitioned_probe_fn)
    rng = np.random.default_rng(11)
    old_keys = rng.integers(-(1 << 62), 1 << 62, 500, dtype=np.int64)
    new_keys = rng.integers(-(1 << 62), 1 << 62, 500, dtype=np.int64)
    absent = rng.integers(-(1 << 62), 1 << 62, 500, dtype=np.int64)

    def shard_row(keys, m_bits):
        b = BloomShards(1, m_bits)
        b.add_many(np.zeros(len(keys), dtype=np.int64), keys)
        return b.shards[0].tobytes()

    shards = pd.DataFrame({
        "bucket": [0, 0],
        "bitmap": [shard_row(old_keys, 1 << 14),   # old sizing
                   shard_row(new_keys, 1 << 17)],  # reopened, resized
    })
    cand = pd.DataFrame({
        "url_hash": np.concatenate([old_keys, new_keys, absent]),
        "bucket": 0,
    })
    out = partitioned_probe_fn(["url_hash", "bucket"])(cand, shards)
    maybe = out["maybe"].to_numpy()
    # zero false negatives for keys in EITHER width's shard
    assert maybe[:1000].all()
    # and the filter still prunes: most absent keys read definitely-new
    assert (~maybe[1000:]).sum() > 400


def test_parse_byte_size_spark_suffixes():
    from ai_intel_web_scraper_spark.crawl.scheduler import _parse_byte_size
    assert _parse_byte_size("10485760") == 10485760
    assert _parse_byte_size("10485760b") == 10485760
    assert _parse_byte_size("10m") == 10 * 1024 * 1024
    assert _parse_byte_size("10MB") == 10 * 1024 * 1024
    assert _parse_byte_size("1g") == 1 << 30
    assert _parse_byte_size("512k") == 512 * 1024
    assert _parse_byte_size("-1") == -1  # broadcast disabled
    assert _parse_byte_size("nonsense") == 10 * 1024 * 1024  # default


def test_connected_components_on_64bit_hash_ids(spark):
    """The convergence test must not overflow Spark 4's ANSI long sum when
    ids are 64-bit hashes (the repo's standard doc id); labels near
    +/-2^62 summed over a component would throw under the old
    sum-of-labels fixpoint check."""
    from ai_intel_web_scraper_spark.operators.dedup import (
        connected_components)
    big = 1 << 62
    # two components whose label sums each overflow int64 if summed twice
    pairs = [(big, big + 1), (big + 1, big + 2),
             (-big, -big - 1), (big + 10, big + 11)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    comp = {r["id"]: r["comp"] for r in connected_components(df).collect()}
    assert comp[big] == comp[big + 1] == comp[big + 2] == big
    assert comp[-big] == comp[-big - 1] == -big - 1
    assert comp[big + 10] == comp[big + 11] == big + 10


@pytest.mark.parametrize("mode,tbl", [("partitioned", "bloom_shards"),
                                      ("cuckoo", "cuckoo_shards")])
def test_partitioned_bloom_resume_with_resized_filter_never_refetches(
        spark, tmp_path, mode, tbl):
    """The ADVICE scenario end-to-end, for BOTH executor-resident
    sidecars: crawl with one expected_urls sizing, then RESUME the same
    warehouse with a 16x larger sizing (different shard width). Stored
    shards must be probed at their own self-described width — a
    wrong-width probe yields false 'definitely new' verdicts that bypass
    the exact anti-join and refetch seen URLs."""
    chain = {f"{BASE}/p/{i}": [f"{BASE}/p/{i+1}"] for i in range(8)}
    chain[f"{BASE}/p/8"] = [f"{BASE}/p/0"]  # cycle back: refetch bait
    fx = _mini_fixtures(str(tmp_path / "fx"),
                        seeds=[(0, f"{BASE}/p/0", 0.5)],
                        pages=chain, max_pages=50, max_depth=12)
    wh = str(tmp_path / "wh")
    CrawlEngine(spark, fx, wh, CrawlConfig(
        write_payload=False, bloom_mode=mode,
        expected_urls=1 << 10)).run(max_rounds=3)
    eng = CrawlEngine(spark, fx, wh, CrawlConfig(
        write_payload=False, bloom_mode=mode,
        expected_urls=1 << 14))
    eng.run()
    fetched = eng.store.read("fetched")
    assert fetched.count() == fetched.select("url").distinct().count()
    assert fetched.count() == 9  # the whole chain, each exactly once
    # and the resized run's new shards coexist with the old-width rows
    widths = {len(bytes(r["bitmap"])) * 8 for r in
              eng.store.read(tbl).collect()}
    assert len(widths) >= 1


def test_cuckoo_shard_upsert_and_probe_mixed_widths():
    """cuckoo_upsert_fn inserts at the engine's CURRENT sizing while rows
    of other widths pass through; cuckoo_probe_fn ORs verdicts across
    widths — so a resume after an expected_urls resize keeps every
    previously-seen URL 'maybe' (no false negatives), like the bloom
    shards' mixed-width contract."""
    import numpy as np
    import pandas as pd

    from ai_intel_web_scraper_spark.crawl.bloom import (cuckoo_probe_fn,
                                                        cuckoo_upsert_fn)
    rng = np.random.default_rng(5)
    h = rng.integers(-2**62, 2**62, 300, dtype=np.int64)
    empty = pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                          "bitmap": pd.Series([], dtype=object)})
    row1 = cuckoo_upsert_fn(16, 10)(
        pd.DataFrame({"bucket": 3, "url_hash": h[:150]}), empty)
    assert len(row1) == 1
    # second batch lands after a resize to a bigger sizing
    row2 = cuckoo_upsert_fn(16, 11)(
        pd.DataFrame({"bucket": 3, "url_hash": h[150:]}), row1)
    widths = sorted(len(x) for x in row2["bitmap"])
    assert widths == [(1 << 10) * 4 * 2, (1 << 11) * 4 * 2]
    novel = rng.integers(-2**62, 2**62, 2000, dtype=np.int64)
    cand = pd.DataFrame({"url_hash": np.concatenate([h, novel]),
                         "bucket": 3})
    out = cuckoo_probe_fn(["url_hash", "bucket"], 16)(cand, row2)
    assert out["maybe"].to_numpy()[:300].all()      # no false negatives
    assert out["maybe"].to_numpy()[300:].mean() < 0.05  # sane FPR


def test_cuckoo_shard_fold_overflow_raises_not_drops():
    """Folding duplicate same-width shard rows into a full filter must
    raise (like add_many on a full filter), never silently drop a
    fingerprint — a dropped fingerprint is a false NEGATIVE that lets a
    seen URL bypass the exact anti-join."""
    import numpy as np
    import pytest as _pt

    from ai_intel_web_scraper_spark.crawl.bloom import (
        CuckooShards, _cuckoo_rows_to_filters)
    n = 1 << 2  # 4 buckets x 4 slots = 16 entries per shard
    a = np.arange(1, 17, dtype=np.uint16).reshape(n, CuckooShards.SLOTS)
    b = np.arange(101, 117, dtype=np.uint16).reshape(n, CuckooShards.SLOTS)
    with _pt.raises(RuntimeError, match="overflow"):
        _cuckoo_rows_to_filters([a.tobytes(), b.tobytes()],
                                n_buckets=1, bucket=0)
    # a non-overflowing fold (first row half empty) still succeeds
    half = a.copy()
    half[:, 2:] = 0
    sparse = np.zeros_like(b)
    sparse[0, 0] = 999
    got = _cuckoo_rows_to_filters([half.tobytes(), sparse.tobytes()],
                                  n_buckets=1, bucket=0)
    assert list(got) == [2]  # slots_log2 = log2(4)
    assert 999 in got[2].shards[0]  # the sparse row's fp was folded in


def test_sitemap_preseed_crawl_parity(spark, fixtures):
    """Sitemap-derived seeds appended to the seeds table must flow through
    BOTH the engine and the pure-Python oracle crawler identically —
    fetched at depth 0, alias-collapsed, budget/politeness applied — and
    the full fetch order must still match exactly."""
    from pyspark.sql import functions as F

    from ai_intel_web_scraper_spark.sources.sitemaps import (
        parse_sitemaps, sitemaps_to_seeds)
    # sitemap bodies listing REAL deep pages of the parity web
    bodies = []
    for k, lo in ((0, 8), (7, 5)):
        entries = "".join(
            f"<url><loc>https://host{k}.example/p/{i}</loc>"
            f"<priority>0.{(i % 9) + 1}</priority></url>"
            for i in range(lo, lo + 5))
        bodies.append((f"host{k}.example",
                       f"<urlset>{entries}</urlset>"))
    parsed = parse_sitemaps(spark.createDataFrame(
        bodies, "host string, body string"))
    old = spark.read.parquet(fixtures["seeds"])
    base = old.agg(F.max("seed_seq")).collect()[0][0] + 1
    extra = sitemaps_to_seeds(parsed, base_seq=base)
    out = "/tmp/spark_graft_sitemap_fx"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    aug = dict(fixtures)
    aug["seeds"] = os.path.join(out, "seeds.parquet")
    (old.select("seed_seq", "url", "priority").unionByName(extra)
     .toPandas().to_parquet(aug["seeds"]))
    wh = "/tmp/spark_graft_wh_sitemap"
    shutil.rmtree(wh, ignore_errors=True)
    eng = CrawlEngine(spark, aug, wh,
                      CrawlConfig(expected_urls=1 << 14,
                                  write_payload=False))
    eng.run()
    got = [(r["url"], r["round"], r["depth"], r["discovery_seq"])
           for r in eng.store.read("fetched")
           .select("url", "round", "depth", "discovery_seq")
           .orderBy("round", "depth", "discovery_seq").collect()]
    want = [(r["url"], r["round"], r["depth"], r["discovery_seq"])
            for r in oracle_crawl(aug).fetched]
    assert got == want
    # the preseeded deep pages are fetched, and at depth 0
    fetched_depth = {u: d for u, _r, d, _s in got}
    preseeded = [r["url"] for r in extra.collect()]
    hit = [u for u in preseeded if u in fetched_depth]
    assert len(hit) >= 5
    assert all(fetched_depth[u] == 0 for u in hit)
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(wh, ignore_errors=True)


def test_blocked_hosts_policy_engine_oracle_parity(spark, fixtures):
    """Quality-driven host blocklist wired into the crawl: engine and
    pure-Python oracle agree exactly on the fetched set with a host
    blocked, no fetched row touches the blocked host, and the blocked
    host WAS fetched in the unblocked baseline (the policy actually
    bites)."""
    import shutil
    from ai_intel_web_scraper_spark.crawl.scheduler import (CrawlConfig,
                                                            CrawlEngine)
    from ai_intel_web_scraper_spark.oracle.crawler import oracle_crawl
    def engine_run(bl):
        wh = f"/tmp/spark_graft_block_wh_{int(bool(bl))}"
        shutil.rmtree(wh, ignore_errors=True)
        eng = CrawlEngine(spark, fixtures, wh,
                          CrawlConfig(write_payload=False,
                                      expected_urls=1 << 14,
                                      blocked_hosts=tuple(sorted(bl))))
        eng.run(max_rounds=4)
        return [(r["url"], r["round"], r["discovery_seq"], r["host"])
                for r in eng.store.read("fetched")
                .orderBy("round", "depth", "discovery_seq").collect()]

    base = engine_run(set())
    # block a host the baseline actually fetched (not the most-fetched
    # one, so the crawl frontier stays alive)
    from collections import Counter
    counts = Counter(h for _, _, _, h in base)
    blocked = {counts.most_common()[1][0]}
    assert any(h in blocked for _, _, _, h in base)      # baseline fetches it
    got = engine_run(blocked)
    assert all(h not in blocked for _, _, _, h in got)   # policy bites
    orc = oracle_crawl(fixtures, max_rounds=4, blocked_hosts=blocked)
    want = [(r["url"], r["round"], r["discovery_seq"], r["host"])
            for r in orc.fetched]
    assert [(u, rd, sq) for u, rd, sq, _ in got] \
        == [(u, rd, sq) for u, rd, sq, _ in want]


def test_engine_internal_sitemap_preseed_parity(spark, fixtures):
    """CrawlConfig.preseed_sitemaps=True: the engine parses the fixture
    sitemap BODIES at bootstrap (robots -> sitemap -> seeds, fully
    engine-internal) and must match the oracle crawler's independent
    Python replay of the same channel exactly; the preseed must also
    actually change the crawl vs the baseline (new URLs fetched), and
    list-seed duplicates collapse keep-first by seq on both sides."""
    import shutil
    from ai_intel_web_scraper_spark.crawl.scheduler import (CrawlConfig,
                                                            CrawlEngine)
    from ai_intel_web_scraper_spark.oracle.crawler import oracle_crawl

    def engine_run(preseed):
        wh = f"/tmp/spark_graft_smps_wh_{int(preseed)}"
        shutil.rmtree(wh, ignore_errors=True)
        eng = CrawlEngine(spark, fixtures, wh,
                          CrawlConfig(write_payload=False,
                                      expected_urls=1 << 14,
                                      preseed_sitemaps=preseed))
        eng.run(max_rounds=4)
        return [(r["url"], r["round"], r["discovery_seq"])
                for r in eng.store.read("fetched")
                .orderBy("round", "depth", "discovery_seq").collect()]

    got = engine_run(True)
    want = [(r["url"], r["round"], r["discovery_seq"])
            for r in oracle_crawl(fixtures, max_rounds=4,
                                  preseed_sitemaps=True).fetched]
    assert got == want and len(got) > 0
    base = set(engine_run(False))
    assert set(got) != base                 # the channel changed the crawl
    assert any(seq >= 1_000_000 for _, _, seq in got)  # preseeds fetched
