"""robots.txt parsing (SURVEY C18 — graft addition per the north rule).

The reference has NO robots support (politeness is RateLimiter-only,
reference scrapers/utils.py:29-40); the north rule adds a robots cache table
``robots(host, disallow, crawl_delay, fetched_at)`` that the scheduler
broadcast-joins against the frontier (scheduler._apply_url_policies). This
module turns raw fetched robots.txt bodies into those rows, vectorized.

Parsing follows the practical subset of RFC 9309 the engine needs:
- user-agent groups; rules taken from the group matching ``agent`` (longest
  prefix match, case-insensitive), falling back to the ``*`` group
- Disallow path prefixes (empty Disallow = allow all, dropped)
- Crawl-delay (non-standard but ubiquitous) parsed as float seconds
- comments (#) and unknown directives ignored
"""

from __future__ import annotations

import pandas as pd


def parse_robots(text: str | None, agent: str = "spark-frontier") -> tuple[list[str], float | None]:
    """Parse one robots.txt body -> (disallow prefixes, crawl_delay)."""
    if not text:
        return [], None
    agent = agent.lower()
    groups: list[tuple[list[str], list[str], float | None]] = []
    cur_agents: list[str] = []
    cur_dis: list[str] = []
    cur_delay: float | None = None
    in_rules = False

    def flush():
        nonlocal cur_agents, cur_dis, cur_delay, in_rules
        if cur_agents:
            groups.append((cur_agents, cur_dis, cur_delay))
        cur_agents, cur_dis, cur_delay, in_rules = [], [], None, False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:
                flush()
            cur_agents.append(val.lower())
        elif key == "disallow":
            in_rules = True
            if val:
                cur_dis.append(val)
        elif key == "crawl-delay":
            in_rules = True
            try:
                v = float(val)
            except ValueError:
                v = None
            if v is not None and v > 0:  # 0/negative delays are meaningless
                cur_delay = v            # — treat as absent
        elif key == "allow":
            in_rules = True  # group continues; engine is prefix-deny only
    flush()

    best: tuple[int, list[str], float | None] | None = None
    star: tuple[list[str], float | None] | None = None
    for agents, dis, delay in groups:
        for ua in agents:
            if ua == "*":
                star = (dis, delay)
            elif ua and agent.startswith(ua):
                # RFC 9309 §2.2.1: a group matches when its user-agent line
                # is a case-insensitive PREFIX of the crawler's product
                # token; longest prefix wins. (Substring containment would
                # let a group named 'r' hijack 'spark-frontier'.)
                if best is None or len(ua) > best[0]:
                    best = (len(ua), dis, delay)
    if best is not None:
        return best[1], best[2]
    if star is not None:
        return star[0], star[1]
    return [], None


def parse_robots_frame(bodies: pd.Series, agent: str = "spark-frontier") -> pd.DataFrame:
    """Vectorized form for mapInPandas/applyInPandas: Series of robots.txt
    bodies -> DataFrame(disallow: list[str], crawl_delay: float|None)."""
    dis, delay = [], []
    for t in bodies:
        d, c = parse_robots(t, agent)
        dis.append(d)
        delay.append(c)
    return pd.DataFrame({"disallow": dis, "crawl_delay": delay})


def robots_udf(agent: str = "spark-frontier"):
    """pandas UDF: robots.txt body column -> struct(disallow, crawl_delay).
    Used to refresh the robots cache table from fetched robots bodies."""
    from pyspark.sql import functions as F

    @F.pandas_udf("disallow array<string>, crawl_delay double")
    def fn(body: pd.Series) -> pd.DataFrame:
        return parse_robots_frame(body, agent)
    return fn


# Sitemap: is a GLOBAL directive (RFC 9309 / sitemaps.org) — valid
# anywhere in the file, outside user-agent groups, case-insensitive.
# The pattern is shared verbatim with the DuckDB oracle (RE2-compatible):
# value = everything up to whitespace or a trailing comment.
ROBOTS_SITEMAP_RE = r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*([^#\s]+)"


def robots_sitemap_urls(text: str | None) -> list[str]:
    """Sitemap URLs declared in a robots.txt body, in file order (the
    frontier-preseed discovery channel: robots -> sitemap fetch ->
    `sources/sitemaps.py` parse -> seeds)."""
    import re
    if not text:
        return []
    return re.findall(ROBOTS_SITEMAP_RE, text)
