"""Seeded synthetic web corpus per FIXTURES.md §B.

Everything is a pure function of ``(seed, key)`` via numpy ``SeedSequence``
spawn keys, so any single image / caption / link list can be regenerated
independently — the correctness tests use this to check the engine's
delivered payload against freshly regenerated reference pixels without
trusting the materialized tables.

Tables produced (parquet):
- ``pages``      (image_id, bytes, w, h, fmt, caption, phash)  — input_hint shape
- ``web_graph``  (url, host, path, bucket, status, fail_attempts,
                  out_links, image_id)
- ``seeds``      (seed_seq, url, priority)
- ``politeness`` (host, crawl_delay, max_pages, max_depth, exclude_patterns)
- ``robots``     (host, disallow, crawl_delay_override)

Host page counts follow a Zipf(s=1.2) distribution so a few hosts are hot
(exercises the salted-repartition / politeness-quota path, SURVEY C9).
Out-links include un-normalized variants (trailing slash, fragments, query
strings, path-relative hrefs), ~5% cross-host links, ~3% links into excluded
patterns, and duplicates (exercises SURVEY C2/C3/C5/C6/C16).

Reference semantics being modeled: the BFS crawl of
reference scrapers/docs_scraper.py:107-169 over a site; statuses model
reference scrapers/utils.py:43-85 (404 -> no retry; timeout -> retried up to
3 attempts via tenacity, scrapers/utils.py:60-64).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.codec import average_phash, encode_image
from ..functions.urls import canonicalize_url, url_hash64

_ADJ = ["quiet", "bright", "rusty", "curved", "hollow", "amber", "misty",
        "woven", "sharp", "pale", "dense", "warm", "brisk", "faded", "solid", "clear"]
_NOUN = ["bridge", "kettle", "orchard", "canyon", "lantern", "harbor", "spindle",
         "meadow", "turbine", "archway", "mosaic", "glacier", "anvil", "prism",
         "terrace", "beacon"]
_SIZES = np.array([32, 64, 96], dtype=np.int32)

N_BUCKETS = 16  # web_graph/pages disk partitioning (maps to Iceberg bucket(N))
FX_VERSION = 5  # bump to invalidate cached /tmp fixture dirs on content change


@dataclass
class WebSpec:
    """Deterministic layout of the synthetic web. Cheap to construct; all
    per-entity generation happens lazily through the methods."""

    seed: int = 42
    n_hosts: int = 40
    total_pages: int = 2000
    zipf_s: float = 1.2
    seed_frac: float = 0.6
    max_links: int = 12
    dup_frac: float = 0.10  # fraction of pages with exact/near-dup images
    budget_scale: int = 1  # multiplies per-host max_pages (bench sizing)
    max_pages_per_host: int | None = None  # cap Zipf head (bench sizing)
    depth_add: int = 0  # deepens per-host max_depth (bench sizing)
    pages_per_host: np.ndarray = field(init=False)
    cum_pages: np.ndarray = field(init=False)

    def __post_init__(self) -> None:
        k = np.arange(1, self.n_hosts + 1, dtype=np.float64)
        weights = 1.0 / k**self.zipf_s
        weights /= weights.sum()
        counts = np.maximum(2, np.round(weights * self.total_pages).astype(np.int64))
        if self.max_pages_per_host is not None:
            counts = np.minimum(counts, self.max_pages_per_host)
        self.pages_per_host = counts
        self.cum_pages = np.concatenate([[0], np.cumsum(counts)])
        # discovery_seq grows SEQ_LEVEL_BITS (6) bits per depth level on top
        # of the seed_seq; enforce the int64 envelope the scheduler's long
        # column requires (semantics.py documents depth<=8, seeds<2^14)
        if self.n_hosts >= 1 << 14:
            raise ValueError("n_hosts >= 2^14 overflows discovery_seq: "
                             "seed_seq + 6 bits/level must fit int64")
        if self.depth_add > 4:  # politeness max_depth is 2-4 + depth_add
            raise ValueError("depth_add > 4 pushes max_depth past 8 and "
                             "overflows discovery_seq at depth")

    # ------------------------------------------------------------ identity
    @property
    def n_pages(self) -> int:
        return int(self.cum_pages[-1])

    def host(self, k: int) -> str:
        return f"host{k}.example"

    def url(self, k: int, i: int) -> str:
        return f"https://{self.host(k)}/p/{i}"

    def image_seq(self, k: int, i: int) -> int:
        return int(self.cum_pages[k]) + i

    def image_id(self, seq: int) -> str:
        return f"img-{seq:08d}"

    def _rng(self, *key: int) -> np.random.Generator:
        return np.random.default_rng([self.seed, *key])

    # ------------------------------------------------------------ payload
    def dup_base(self, seq: int) -> tuple[int, bool] | None:
        """Web-realistic image duplication: ~dup_frac of pages carry an image
        that is an exact (logos, re-hosted assets) or near (re-encode /
        watermark noise) duplicate of an EARLIER page's image. Returns
        (base_seq, exact) for duplicate pages, None otherwise; resolves
        chains so the base is always an original. Pure function of seq."""
        if seq == 0 or self.dup_frac <= 0.0:
            return None
        rng = self._rng(31, seq)
        if rng.random() >= self.dup_frac:
            return None
        base = int(rng.integers(0, seq))
        exact = bool(rng.random() < 0.5)
        while True:  # walk to the original (chains are short: P(dup)^k)
            parent = self.dup_base(base) if base > 0 else None
            if parent is None:
                return base, exact
            base = parent[0]

    def image_meta(self, seq: int) -> tuple[int, int, str]:
        dup = self.dup_base(seq)
        if dup is not None:
            return self.image_meta(dup[0])
        rng = self._rng(11, seq)
        w = int(_SIZES[rng.integers(0, len(_SIZES))])
        h = int(_SIZES[rng.integers(0, len(_SIZES))])
        fmt = "png" if rng.random() < 0.5 else "jpeg"
        return w, h, fmt

    def image_pixels(self, seq: int) -> np.ndarray:
        dup = self.dup_base(seq)
        if dup is not None:
            base_seq, exact = dup
            px = self.image_pixels(base_seq)
            if exact:
                return px
            # re-encode/watermark stand-in: block-structured noise strong
            # enough to flip a few phash bits (hamming 1-6), weak enough to
            # stay an obvious near-duplicate
            rng = self._rng(37, seq)
            h, w = px.shape[0], px.shape[1]
            block = (rng.random((max(h // 8, 1), max(w // 8, 1), 3)) - 0.5) * 48
            by = np.minimum(np.arange(h) // 8, block.shape[0] - 1)
            bx = np.minimum(np.arange(w) // 8, block.shape[1] - 1)
            jitter = block[by][:, bx] + rng.integers(-4, 5, size=px.shape)
            return np.clip(px.astype(np.float64) + jitter, 0, 255).astype(np.uint8)
        w, h, _ = self.image_meta(seq)
        rng = self._rng(11, seq)
        rng.integers(0, len(_SIZES), 2)  # consume the w/h draws
        rng.random()  # consume the fmt draw
        # per-image random low-frequency structure (distinct phash per image,
        # compressible, quantization-sensitive) + fine noise
        ry = rng.random(h)
        rx = rng.random(w)
        chan = rng.random(3) + 0.5
        base = np.outer(ry, rx)[..., None] * chan[None, None, :] * 200.0
        noise = rng.integers(0, 64, size=(h, w, 3))
        return np.clip(base + noise, 0, 255).astype(np.uint8)

    def caption(self, seq: int, host: str) -> str:
        rng = self._rng(13, seq)
        a = _ADJ[rng.integers(0, len(_ADJ))]
        n = _NOUN[rng.integers(0, len(_NOUN))]
        return f"a {a} {n} on {host}"

    # ------------------------------------------------------------ graph
    def page_status(self, k: int, i: int) -> tuple[int, int]:
        """(http_status, fail_attempts). fail_attempts = number of leading
        fetch attempts that time out before success."""
        rng = self._rng(17, k, i)
        r = rng.random()
        status = 404 if r < 0.02 else 200
        r2 = rng.random()
        fail = 0
        if r2 < 0.005:
            fail = 3  # never succeeds within retry budget
        elif r2 < 0.015:
            fail = 2
        elif r2 < 0.045:
            fail = 1
        return status, fail

    def out_links(self, k: int, i: int) -> list[str]:
        rng = self._rng(7, k, i)
        n = int(rng.integers(0, self.max_links + 1))
        pages_k = int(self.pages_per_host[k])
        links: list[str] = []
        for _ in range(n):
            r = rng.random()
            if r < 0.03:  # excluded pattern (matches politeness exclude)
                links.append(f"/tag/{_NOUN[rng.integers(0, len(_NOUN))]}")
                continue
            if r < 0.08 and self.n_hosts > 1:  # cross-host (dropped: same-domain rule)
                k2 = int(rng.integers(0, self.n_hosts))
                i2 = int(rng.integers(0, self.pages_per_host[k2]))
                links.append(self.url(k2, i2))
                continue
            i2 = int(rng.integers(0, pages_k))
            u = self.url(k, i2)
            style = rng.random()
            if style < 0.20:
                u = f"/p/{i2}"           # path-relative href
            elif style < 0.45:
                u = u + "/"              # trailing slash variant
            elif style < 0.60:
                u = u + "#frag"          # fragment variant
            elif style < 0.72:
                u = u + "?utm=x"         # query variant
            links.append(u)
        # ~25% of link-bearing pages repeat their first link (in-list
        # duplicate, exercises SURVEY C16 keep-first)
        if links and rng.random() < 0.25:
            links.append(links[0])
        return links

    # ------------------------------------------------------------ config
    def politeness(self, k: int) -> tuple[float, int, int, list[str]]:
        rng = self._rng(19, k)
        delay = float([0.3, 0.5, 1.0][rng.integers(0, 3)])
        max_pages = int(rng.integers(30, 201)) * self.budget_scale
        max_depth = int(rng.integers(2, 5)) + self.depth_add
        return delay, max_pages, max_depth, ["/tag/", "/login"]

    def robots(self, k: int) -> tuple[list[str], float | None]:
        rng = self._rng(29, k)
        if rng.random() >= 0.3:
            return [], None
        pages_k = int(self.pages_per_host[k])
        n_dis = int(rng.integers(1, 4))
        disallow = sorted({f"/p/{int(rng.integers(0, pages_k))}" for _ in range(n_dis)})
        override = float(rng.choice([0.3, 0.5, 1.0])) if rng.random() < 0.3 else None
        return disallow, override

    def robots_sitemaps(self, k: int) -> list[str]:
        """Sitemap: directive URLs for host k (deterministic; ~half the
        hosts declare 1-2 sitemaps). Mixed-case directive keys downstream
        exercise case-insensitive parsing; the engine must read these
        from the RAW body (ground-truth column is oracle-only)."""
        rng = self._rng(31, k)
        if rng.random() >= 0.5:
            return []
        n = 1 + int(rng.integers(0, 2))
        return [f"https://{self.host(k)}/sitemap{i or ''}.xml"
                for i in range(n)]

    def is_seed_host(self, k: int) -> bool:
        return self._rng(23, k).random() < self.seed_frac or k == 0

    def seed_rows(self) -> list[tuple[int, str, float]]:
        rows = []
        seq = 0
        for k in range(self.n_hosts):
            if self.is_seed_host(k):
                prio = float(self._rng(23, k, 1).random())
                rows.append((seq, self.url(k, 0), prio))
                seq += 1
        return rows


# ---------------------------------------------------------------- writers

_PAGES_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
    ("bucket", pa.int32()),
])

_GRAPH_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("host", pa.string()),
    ("path", pa.string()),
    ("url_hash", pa.int64()),
    ("bucket", pa.int32()),
    ("status", pa.int32()),
    ("fail_attempts", pa.int32()),
    ("out_links", pa.list_(pa.string())),
    ("image_id", pa.string()),
])


def _bucket_of(url_hash: int) -> int:
    return int(url_hash) % N_BUCKETS if url_hash >= 0 else int(-url_hash) % N_BUCKETS


def page_rows(spec: WebSpec, k_lo: int, k_hi: int, with_bytes: bool = True):
    """Generate (pages_row, graph_row) dict pairs for hosts [k_lo, k_hi)."""
    for k in range(k_lo, k_hi):
        host = spec.host(k)
        for i in range(int(spec.pages_per_host[k])):
            seq = spec.image_seq(k, i)
            w, h, fmt = spec.image_meta(seq)
            if with_bytes:
                px = spec.image_pixels(seq)
                data = encode_image(px, fmt)
                ph = average_phash(px)
            else:
                data, ph = None, 0
            url = spec.url(k, i)
            uh = url_hash64(canonicalize_url(url))
            status, fail = spec.page_status(k, i)
            yield (
                {"image_id": spec.image_id(seq), "bytes": data, "w": w, "h": h,
                 "fmt": fmt, "caption": spec.caption(seq, host), "phash": ph,
                 "bucket": _bucket_of(uh)},
                {"url": url, "host": host, "path": f"/p/{i}", "url_hash": uh,
                 "bucket": _bucket_of(uh), "status": status,
                 "fail_attempts": fail, "out_links": spec.out_links(k, i),
                 "image_id": spec.image_id(seq)},
            )


def write_config_tables(spec: WebSpec, paths: dict) -> None:
    """Write the small config tables (seeds, politeness, robots)."""
    seeds = spec.seed_rows()
    pq.write_table(pa.Table.from_pylist(
        [{"seed_seq": s, "url": u, "priority": p} for s, u, p in seeds],
        schema=pa.schema([("seed_seq", pa.int64()), ("url", pa.string()),
                          ("priority", pa.float64())])),
        paths["seeds"])

    pol, rob = [], []
    for k in range(spec.n_hosts):
        delay, mp, md, excl = spec.politeness(k)
        pol.append({"host": spec.host(k), "crawl_delay": delay, "max_pages": mp,
                    "max_depth": md, "exclude_patterns": excl})
        dis, ovr = spec.robots(k)
        # the engine receives only the RAW robots.txt body (as a crawler
        # would fetch it) and must parse it; the pre-parsed columns are the
        # oracle's ground truth — crawl parity proves the parser
        sm = spec.robots_sitemaps(k)
        body = "User-agent: *\n" + "".join(f"Disallow: {d}\n" for d in dis)
        if ovr is not None:
            body += f"Crawl-delay: {ovr}\n"
        # Sitemap: is a GLOBAL directive (outside UA groups); alternate
        # the key's case so parsers must be case-insensitive
        for i, u in enumerate(sm):
            body += f"{'Sitemap' if i % 2 == 0 else 'sitemap'}: {u}\n"
        rob.append({"host": spec.host(k), "disallow": dis,
                    "crawl_delay_override": ovr, "body": body,
                    "sitemap_urls": sm})
    pq.write_table(pa.Table.from_pylist(pol, schema=pa.schema([
        ("host", pa.string()), ("crawl_delay", pa.float64()),
        ("max_pages", pa.int32()), ("max_depth", pa.int32()),
        ("exclude_patterns", pa.list_(pa.string()))])),
        paths["politeness"])
    pq.write_table(pa.Table.from_pylist(rob, schema=pa.schema([
        ("host", pa.string()), ("disallow", pa.list_(pa.string())),
        ("crawl_delay_override", pa.float64()), ("body", pa.string()),
        ("sitemap_urls", pa.list_(pa.string()))])),
        paths["robots"])

    # sitemap BODIES for every robots-declared sitemap URL: sitemap s of
    # host k lists the host's pages with index % n_sitemaps == s (disjoint
    # subsets, so no URL carries two priorities), every 2nd entry with an
    # explicit priority and every 3rd with a lastmod — the engine parses
    # these raw bodies when CrawlConfig.preseed_sitemaps is on
    sm = []
    for k in range(spec.n_hosts):
        urls = spec.robots_sitemaps(k)
        n_sm = len(urls)
        pages_k = int(spec.pages_per_host[k])
        for s, smu in enumerate(urls):
            entries = []
            for i in range(s, pages_k, max(n_sm, 1)):
                e = f"<url><loc>{spec.url(k, i)}</loc>"
                if i % 2 == 0:
                    e += f"<priority>0.{(k + i) % 9 + 1}</priority>"
                if i % 3 == 0:
                    e += f"<lastmod>2024-0{(i % 9) + 1}-15</lastmod>"
                entries.append(e + "</url>")
            sm.append({"host": spec.host(k), "url": smu,
                       "body": ('<?xml version="1.0"?><urlset>'
                                + "".join(entries) + "</urlset>")})
    pq.write_table(pa.Table.from_pylist(sm, schema=pa.schema([
        ("host", pa.string()), ("url", pa.string()),
        ("body", pa.string())])),
        paths["sitemaps"])


def generate_fixtures(spec: WebSpec, out_dir: str, with_bytes: bool = True) -> dict:
    """Pure-Python writer (test scale). Returns table paths."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {n: os.path.join(out_dir, n + ".parquet") for n in
             ("pages", "web_graph", "seeds", "politeness", "robots",
              "sitemaps")}

    pages_buf: list[dict] = []
    graph_buf: list[dict] = []
    for prow, grow in page_rows(spec, 0, spec.n_hosts, with_bytes):
        pages_buf.append(prow)
        graph_buf.append(grow)
    pq.write_table(pa.Table.from_pylist(pages_buf, schema=_PAGES_SCHEMA),
                   paths["pages"])
    pq.write_table(pa.Table.from_pylist(graph_buf, schema=_GRAPH_SCHEMA),
                   paths["web_graph"])
    write_config_tables(spec, paths)
    return paths


def generate_fixtures_spark(spark, spec: WebSpec, out_dir: str,
                            with_bytes: bool = True, slices: int = 32) -> dict:
    """Spark-parallel writer (bench scale): hosts are range-partitioned
    across tasks; each task regenerates its slice from the seed — the same
    pure functions as the local writer, so outputs are identical."""
    import pandas as pd  # noqa: F401

    os.makedirs(out_dir, exist_ok=True)
    paths = {n: os.path.join(out_dir, n + ".parquet") for n in
             ("pages", "web_graph", "seeds", "politeness", "robots",
              "sitemaps")}
    sd, nh, tp, zs, sf, ml, bs, mph, dfr, da = (
        spec.seed, spec.n_hosts, spec.total_pages, spec.zipf_s,
        spec.seed_frac, spec.max_links, spec.budget_scale,
        spec.max_pages_per_host, spec.dup_frac, spec.depth_add)

    def gen_partition(table: str, wb: bool):
        def fn(iterator):
            local = WebSpec(seed=sd, n_hosts=nh, total_pages=tp, zipf_s=zs,
                            seed_frac=sf, max_links=ml, budget_scale=bs,
                            max_pages_per_host=mph, dup_frac=dfr,
                            depth_add=da)
            for pdf in iterator:
                for k in pdf["id"]:
                    rows = [(p if table == "pages" else g)
                            for p, g in page_rows(local, int(k), int(k) + 1, wb)]
                    if rows:
                        import pandas as _pd
                        yield _pd.DataFrame(rows)
        return fn

    pages_schema = ("image_id string, bytes binary, w int, h int, fmt string, "
                    "caption string, phash long, bucket int")
    graph_schema = ("url string, host string, path string, url_hash long, "
                    "bucket int, status int, fail_attempts int, "
                    "out_links array<string>, image_id string")
    # hash-distribute hosts across tasks: the Zipf head would otherwise put
    # nearly all pages in the first contiguous range slice
    hosts = spark.range(0, spec.n_hosts).repartition(slices, "id")
    (hosts.mapInPandas(gen_partition("pages", with_bytes), schema=pages_schema)
     .write.mode("overwrite").partitionBy("bucket").parquet(paths["pages"]))
    # graph rows are independent of the image payload: never re-encode the
    # images just to throw them away (halves bench-scale fixture cost)
    (hosts.mapInPandas(gen_partition("graph", False), schema=graph_schema)
     .write.mode("overwrite").partitionBy("bucket").parquet(paths["web_graph"]))

    write_config_tables(spec, paths)  # small tables: local writer is fine
    return paths
