"""Pure-Python oracle crawler: the correctness reference for the Spark engine.

Implements the deterministic round-based crawl contract of
``crawl/semantics.py`` exactly — which in turn re-expresses the reference's
sequential BFS (reference scrapers/docs_scraper.py:107-169,
scrapers/utils.py:29-117) as a deterministic total order. The reference has
no test suite at all (SURVEY §5), so this oracle *is* the golden
implementation: pytest asserts that the distributed engine reproduces the
oracle's crawl ordering, final url_seen set, per-row payload identity, and
per-round metrics.

Sequential and in-memory by design (it mirrors the reference's nature);
only ever run at test scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow.parquet as pq

from ..crawl import semantics as S
from ..functions.urls import (canonicalize_url, url_hash64, url_host,
                              url_path)


@dataclass
class OracleResult:
    fetched: list[dict] = field(default_factory=list)   # in crawl order
    failures: list[dict] = field(default_factory=list)
    url_seen: set[str] = field(default_factory=set)
    rounds: list[dict] = field(default_factory=list)
    # DISTINCT policy-accepted candidate edges (engine `edges` table
    # with reject IS NULL) — the authority rank mode's input graph
    edge_set: set = field(default_factory=set)


def _load_tables(fixtures: dict) -> tuple[dict, list, dict, dict]:
    graph = {}
    for row in pq.read_table(fixtures["web_graph"]).to_pylist():
        graph[row["url"]] = row
    seeds = sorted(pq.read_table(fixtures["seeds"]).to_pylist(),
                   key=lambda r: r["seed_seq"])
    pol = {r["host"]: r for r in pq.read_table(fixtures["politeness"]).to_pylist()}
    rob = {r["host"]: r for r in pq.read_table(fixtures["robots"]).to_pylist()}
    return graph, seeds, pol, rob


def _sitemap_seed_rows(fixtures: dict) -> list[dict]:
    """Independent Python replay of the engine's sitemap preseed:
    parse every fixture sitemap body (block regex, loc, full-decimal
    clamped priority ppm), rank by (ppm desc, url asc), emit seed rows
    from SITEMAP_SEED_BASE — must equal `parse_sitemaps` +
    `sitemaps_to_seeds` exactly (crawl parity is the check)."""
    import re
    from ..sources.sitemaps import (SITEMAP_DEFAULT_PRIORITY_PPM,
                                    SITEMAP_SEED_BASE)
    entries = []
    for r in pq.read_table(fixtures["sitemaps"]).to_pylist():
        for blk in re.findall(r"(?s)<url>(.*?)</url>", r["body"]):
            m = re.search(r"<loc>\s*([^<\s][^<]*?)\s*</loc>", blk)
            if not m:
                continue
            pm = re.search(
                r"<priority>\s*([01])(?:\.(\d{1,6})\d*)?\s*</priority>",
                blk)
            if pm:
                ppm = min(int(pm.group(1)) * 1_000_000
                          + int((pm.group(2) or "").ljust(6, "0")),
                          1_000_000)
            else:
                ppm = SITEMAP_DEFAULT_PRIORITY_PPM
            entries.append((m.group(1), ppm))
    entries.sort(key=lambda t: (-t[1], t[0]))
    return [{"seed_seq": SITEMAP_SEED_BASE + i, "url": u,
             "priority": ppm / 1e6}
            for i, (u, ppm) in enumerate(entries)]


def oracle_crawl(fixtures: dict, max_rounds: int = 200,
                 round_seconds: float = S.ROUND_SECONDS,
                 rank_mode: str = "bfs",
                 blocked_hosts: frozenset | set = frozenset(),
                 preseed_sitemaps: bool = False,
                 authority_every: int = 1) -> OracleResult:
    graph, seeds, pol, rob = _load_tables(fixtures)
    if preseed_sitemaps:
        seeds = sorted(seeds + _sitemap_seed_rows(fixtures),
                       key=lambda r: r["seed_seq"])
    if rank_mode == "bfs":
        rank_key = lambda r: (r["depth"], r["seq"])  # noqa: E731
    else:  # priority/authority: rank desc, then BFS order (engine parity)
        rank_key = lambda r: (-r["priority"], r["depth"], r["seq"])  # noqa: E731

    def host_cfg(host: str) -> dict | None:
        p = pol.get(host)
        if p is None:
            return None
        r = rob.get(host, {})
        ovr = r.get("crawl_delay_override")
        # mirror the engine's robots parser: only positive overrides count
        # (falsy-or would keep a negative override and diverge)
        delay = ovr if (ovr is not None and ovr > 0) else p["crawl_delay"]
        return {"crawl_delay": float(delay), "max_pages": p["max_pages"],
                "max_depth": p["max_depth"],
                "exclude": list(p["exclude_patterns"]),
                "disallow": list(r.get("disallow") or [])}

    def rejected(url: str, cfg: dict) -> bool:
        if url_host(url) in blocked_hosts:
            return True
        if any(pat in url for pat in cfg["exclude"]):
            return True
        path = url_path(url)
        return any(path.startswith(d) for d in cfg["disallow"])

    res = OracleResult()
    frontier: list[dict] = []  # rows: url host depth seq attempt
    fetched_count: dict[str, int] = {}
    edge_set = res.edge_set  # accumulated per the semantics contract

    # bootstrap (round 0): canonicalize seeds, policy-filter, add-before-enqueue
    for srow in seeds:
        u = canonicalize_url(srow["url"])
        if u is None:
            continue
        host = url_host(u)
        cfg = host_cfg(host)
        if cfg is None or rejected(u, cfg):
            continue
        if u in res.url_seen:
            continue
        res.url_seen.add(u)
        frontier.append({"url": u, "host": host, "depth": 0,
                         "seq": srow["seed_seq"], "attempt": 1,
                         "priority": float(srow["priority"])})

    for round_no in range(1, max_rounds + 1):
        if not frontier:
            break
        if rank_mode == "authority":
            # integer-PR compose over the graph so far (nodes =
            # url_seen, edges = accumulated accepted candidates),
            # refreshed at the engine's cadence — (round-1) % every == 0
            # — and retained in between (urls discovered since rank by
            # seed/link boost alone); the stored row priority is
            # composed in, never overwritten
            if (round_no - 1) % max(1, authority_every) == 0:
                auth = S.authority_ranks(res.url_seen, edge_set)
            rank_key = lambda r, _a=auth: (  # noqa: E731
                -S.compose_rank(_a.get(r["url"], 0), r["priority"]),
                r["depth"], r["seq"])
        by_host: dict[str, list[dict]] = {}
        for row in frontier:
            by_host.setdefault(row["host"], []).append(row)

        next_frontier: list[dict] = []
        candidates: list[dict] = []  # expansion batch for this round
        n_sched = n_ok = 0
        for host in by_host:
            cfg = host_cfg(host)
            rows = sorted(by_host[host], key=rank_key)
            remaining = cfg["max_pages"] - fetched_count.get(host, 0)
            quota = min(S.host_round_quota(cfg["crawl_delay"], round_seconds),
                        remaining)
            if quota <= 0:
                continue  # budget exhausted: host's frontier rows are dropped
            scheduled, deferred = rows[:quota], rows[quota:]
            next_frontier.extend(deferred)
            for slot, row in enumerate(scheduled):
                n_sched += 1
                g = graph.get(row["url"])
                if g is None or g["status"] != 200:
                    res.failures.append({**row, "round": round_no,
                                         "reason": "http_error"})
                    continue
                if row["attempt"] <= g["fail_attempts"]:
                    if row["attempt"] < S.MAX_ATTEMPTS:
                        next_frontier.append({**row, "attempt": row["attempt"] + 1})
                    else:
                        res.failures.append({**row, "round": round_no,
                                             "reason": "timeout_dead"})
                    continue
                n_ok += 1
                fetched_count[host] = fetched_count.get(host, 0) + 1
                res.fetched.append({
                    "url": row["url"], "host": host, "depth": row["depth"],
                    "round": round_no, "discovery_seq": row["seq"],
                    "fetch_slot": slot,
                    "fetch_ts": S.virtual_fetch_ts(round_no, slot,
                                                   cfg["crawl_delay"],
                                                   round_seconds),
                    "image_id": g["image_id"],
                })
                if row["depth"] < cfg["max_depth"]:
                    for pos, link in enumerate(g["out_links"]):
                        cu = canonicalize_url(link, base_url=row["url"])
                        if cu is None or url_host(cu) != host:
                            continue
                        if rejected(cu, cfg):
                            continue
                        edge_set.add((row["url"], cu))
                        candidates.append({
                            "url": cu, "host": host,
                            "depth": row["depth"] + 1,
                            "seq": S.child_seq(row["seq"], pos),
                            # same hash-derived score as the engine
                            "priority": (abs(url_hash64(cu)) % 1000) / 1000.0})

        # round-batch dedupe: keep-first by min (depth, seq), then anti-join seen
        best: dict[str, dict] = {}
        for c in candidates:
            b = best.get(c["url"])
            if b is None or (c["depth"], c["seq"]) < (b["depth"], b["seq"]):
                best[c["url"]] = c
        n_new = 0
        for c in best.values():
            if c["url"] in res.url_seen:
                continue
            res.url_seen.add(c["url"])
            next_frontier.append({**c, "attempt": 1})
            n_new += 1

        frontier = next_frontier
        res.rounds.append({"round": round_no, "scheduled": n_sched,
                           "fetched_ok": n_ok, "discovered": len(candidates),
                           "new_urls": n_new, "frontier_size": len(frontier)})

    res.fetched.sort(key=lambda r: (r["round"], r["depth"], r["discovery_seq"]))
    return res
