"""Sitemap ingestion: the standard frontier-preseed channel real crawlers
(Nutch, StormCrawler) run alongside link discovery. The reference never
reads sitemaps (its scrapers start from hand-listed seed URLs only,
`config/competitors.yaml`); a 10^10-URL frontier gets a large fraction
of its seeds from exactly this channel, with per-URL freshness
(`lastmod`) and site-declared `priority` feeding the scheduling rank.

Everything is native JVM regexp/date expressions over the body column —
one Generate (explode of the per-body block list) and narrow maps, no
UDF, no shuffle; the parse is therefore cheap enough to run inside the
fetch round itself.

Malformed entries degrade, never fail: a block without a <loc> is
dropped, an unparseable <lastmod> yields NULL (try_to_date), and a
missing/ill-formed <priority> takes the spec default 0.5 (emitted as
integer parts-per-million — no float ever leaves the operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# sitemap.xml spec default priority, in ppm
SITEMAP_DEFAULT_PRIORITY_PPM = 500_000
# seed_seq base for sitemap-discovered preseed rows: far above any list
# seed's seq so BFS tie-breaks stay stable; shared with the oracle crawler
SITEMAP_SEED_BASE = 1_000_000

_URL_BLOCK_RE = r"(?s)<url>(.*?)</url>"
_INDEX_BLOCK_RE = r"(?s)<sitemap>(.*?)</sitemap>"
_LOC_RE = r"<loc>\s*([^<\s][^<]*?)\s*</loc>"
_LASTMOD_RE = r"<lastmod>\s*(\d{4}-\d{2}-\d{2})"
# Full decimal capture (spec allows any 0.0-1.0 decimal: 0.85, 0.05, 1.0):
# whole digit + up to 6 fraction digits (ppm precision; extra digits
# truncate). Fraction optional so a bare "<priority>1</priority>" parses.
# Valid in both Java regex (Spark) and RE2 (DuckDB) — PRIORITY_RE is
# interpolated verbatim into the generated oracle SQL.
PRIORITY_RE = r"<priority>\s*([01])(?:\.(\d{1,6})\d*)?\s*</priority>"
_PRIORITY_RE = PRIORITY_RE


def parse_sitemaps(bodies: DataFrame, host_col: str = "host",
                   body_col: str = "body") -> DataFrame:
    """(host, url, lastmod_day, priority_ppm) per <url> entry.

    lastmod_day = days since 1970-01-01 (integer; NULL when absent or
    unparseable); priority_ppm = integer parts-per-million parsed from
    the decimal literal WITHOUT any float arithmetic (whole and fraction
    digits captured separately, fraction right-padded to 6 digits),
    clamped to [0, 1e6] (an out-of-spec "1.5" reads as 1.0), spec
    default 500000 when missing."""
    block = F.explode(
        F.regexp_extract_all(F.col(body_col), F.lit(_URL_BLOCK_RE), 1)
    ).alias("_b")
    df = bodies.select(F.col(host_col), block)
    loc = F.regexp_extract("_b", _LOC_RE, 1)
    whole = F.regexp_extract("_b", _PRIORITY_RE, 1)
    frac = F.regexp_extract("_b", _PRIORITY_RE, 2)
    prio = F.when(
        whole == "", F.lit(SITEMAP_DEFAULT_PRIORITY_PPM)
    ).otherwise(F.least(
        whole.cast("long") * 1_000_000
        + F.rpad(frac, 6, "0").cast("long"),
        F.lit(1_000_000)))
    lastmod = F.datediff(
        F.try_to_date(F.nullif(
            F.regexp_extract("_b", _LASTMOD_RE, 1), F.lit(""))),
        F.lit("1970-01-01").cast("date"))
    return (df.select(F.col(host_col), loc.alias("url"),
                      lastmod.cast("int").alias("lastmod_day"),
                      prio.cast("long").alias("priority_ppm"))
            .where(F.col("url") != ""))


def sitemap_index_children(bodies: DataFrame, host_col: str = "host",
                           body_col: str = "body") -> DataFrame:
    """(host, child_url) edges from <sitemapindex> documents — the next
    fetch round's work list (indexes nest one level per the spec; the
    crawl loop re-enters this function per round, exactly like link
    expansion re-enters the frontier)."""
    block = F.explode(
        F.regexp_extract_all(F.col(body_col), F.lit(_INDEX_BLOCK_RE), 1)
    ).alias("_b")
    return (bodies.select(F.col(host_col), block)
            .select(F.col(host_col),
                    F.regexp_extract("_b", _LOC_RE, 1).alias("child_url"))
            .where(F.col("child_url") != ""))


def sitemaps_to_seeds(parsed: DataFrame, base_seq: int) -> DataFrame:
    """Adapt `parse_sitemaps` output to the engine's seeds schema
    (seed_seq, url, priority) so sitemap URLs preseed the frontier with
    ZERO engine changes: append these rows to the seeds table and both
    the engine and the pure-Python oracle crawler consume them as
    depth-0 seeds (alias collapse, budget, politeness all apply
    unchanged — proven by the crawl parity test).

    seed_seq = base_seq + rank by (priority desc, url) — deterministic;
    priority = priority_ppm / 1e6 (both sides read the identical parquet
    double). The global rank window is fine here because a preseed batch
    is bounded per round (like the cursor source's page batches), not
    corpus-sized."""
    from pyspark.sql import Window
    w = Window.orderBy(F.desc("priority_ppm"), F.asc("url"))
    return parsed.select(
        (F.row_number().over(w) + F.lit(base_seq - 1)).cast("long")
        .alias("seed_seq"),
        F.col("url"),
        (F.col("priority_ppm") / F.lit(1_000_000.0)).alias("priority"))
