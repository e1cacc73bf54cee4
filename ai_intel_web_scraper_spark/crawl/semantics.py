"""The deterministic crawl-semantics contract shared by the Spark engine and
the pure-Python oracle. BOTH implementations follow this spec exactly; the
parity tests assert equality of crawl ordering and final url_seen sets.

The reference crawler (reference scrapers/docs_scraper.py:107-169) is a
sequential BFS: ``deque.popleft()`` of ``(url, depth)`` with a visited-set
added BEFORE enqueue (add-before-enqueue, docs_scraper.py:124,159-163), a
per-instance rate limiter (scrapers/utils.py:29-40), a page budget
(docs_scraper.py:126), a depth limit (docs_scraper.py:154), substring
exclusion filters (docs_scraper.py:171-176) and same-domain filtering
(scrapers/utils.py:101-103). FIFO order is inherently sequential, so the
distributed engine defines the equivalent *deterministic total order* and the
oracle implements the same rule:

1.  **discovery_seq** — seeds get their ``seed_seq``; a link at position
    ``pos`` (0-based) on a page with sequence ``s`` gets
    ``s * 64 + pos + 1``. 64 = 2^SEQ_LEVEL_BITS > max out-links (12); with
    depth <= 8 and <= 2^14 seeds this stays inside int64. This reproduces
    BFS FIFO enqueue order (parent dequeue order, then link position)
    without any global renumbering shuffle.
2.  **scheduling order** within a round and host: ascending
    ``(depth, discovery_seq)`` — BFS-first, discovery-order tie-break.
3.  **politeness quota** — each round models ROUND_SECONDS of wall clock;
    host h may be *scheduled* at most ``floor(ROUND_SECONDS/crawl_delay_h)``
    URLs per round (>=1). Scheduled-but-failed fetches consume quota (the
    reference sleeps per attempt); only *successful* fetches count against
    the per-host ``max_pages`` budget (the reference counts records,
    docs_scraper.py:126).
4.  **retry** — HTTP 404 is terminal, no retry (reference utils.py:56-58);
    a timeout is retried up to MAX_ATTEMPTS total attempts by re-enqueueing
    the row with ``attempt+1`` into the next round (reference: tenacity
    decorator, utils.py:60-64). Retries keep their discovery_seq.
5.  **expansion** — links of a successful fetch at depth d expand only if
    ``d < max_depth`` (docs_scraper.py:154). Each link is resolved against
    the parent URL, canonicalized (drop fragment+query, rstrip '/'), then
    filtered: same host as parent, not matching an exclude substring, not
    disallowed by robots (path-prefix match; graft addition — absent in the
    reference), then de-duplicated keep-first (min ``(depth,
    discovery_seq)`` — NOT seq alone: discovery_seq is not monotone in
    depth, and both implementations take the shallowest row, tie-broken by
    seq) within the round and anti-joined against url_seen. Survivors enter url_seen AND the
    frontier (add-before-enqueue).
6.  **crawl ordering** (what parity tests compare): successful fetches
    sorted by ``(round, depth, discovery_seq)``.
7.  All timestamps derive from the round number (virtual time
    ``round * ROUND_SECONDS``) — no wall-clock nondeterminism, which is what
    makes resume bit-identical.
"""

from __future__ import annotations

ROUND_SECONDS = 10.0
MAX_ATTEMPTS = 3
SEQ_LEVEL_BITS = 6  # 2^6 = 64 slots per page > max 12 out-links + 1


def child_seq(parent_seq: int, pos: int) -> int:
    return parent_seq * (1 << SEQ_LEVEL_BITS) + pos + 1


# --------------------------------------------------- authority rank (r5)
# rank_mode="authority": the quality/authority feedback loop. At the
# START of round R (R >= 1) both implementations compute integer
# PageRank (operators/graph.py recurrence: PR_ITERS iterations,
# PR_SCALE quantization, 85/100 damping, dangling nodes get one
# self-loop) over
#   nodes = url_seen as of round R-1,
#   edges = DISTINCT policy-ACCEPTED same-host candidate links recorded
#           through round R-1 (the engine's `edges` table with
#           reject IS NULL; the oracle's accumulated candidate set),
# and rank each frontier row by
#   compose_rank = authority_r(url) + floor(priority * 1e6) * AUTH_SEED_W
# descending, then (depth, discovery_seq) ascending. `priority` is the
# row's STORED priority (seed ppm/1e6 or the hash-derived link score) —
# the stored frontier column is never overwritten, so the composition
# is recomputed fresh each round as the graph grows. All arithmetic is
# 64-bit integer (the floor of an IEEE product is deterministic), so
# engine and oracle rank bit-identically.


def authority_ranks(nodes, edges, iters: int | None = None) -> dict:
    """Pure-Python replay of `operators/graph.py::authority_over`:
    integer PageRank over arbitrary hashable node keys with self-loops
    added for dangling nodes. `edges` is an iterable of DISTINCT
    (src, dst) pairs. Returns {node: quantized_rank}. Oracle-side only
    (sequential, test scale); the engine runs the DataFrame twin."""
    from ..operators.graph import (PR_DAMP_DEN, PR_DAMP_NUM, PR_ITERS,
                                   PR_SCALE)
    iters = PR_ITERS if iters is None else iters
    nodes = list(nodes)
    n = len(nodes)
    if n == 0:
        return {}
    edges = set(edges)
    has_out = {s for s, _ in edges}
    full = list(edges) + [(u, u) for u in nodes if u not in has_out]
    outdeg: dict = {}
    for s, _ in full:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // (PR_DAMP_DEN * n)
    r = {u: PR_SCALE // n for u in nodes}
    for _ in range(iters):
        sums = dict.fromkeys(nodes, 0)
        for s, d in full:
            sums[d] += r[s] // outdeg[s]
        r = {u: base + (PR_DAMP_NUM * sums[u]) // PR_DAMP_DEN
             for u in nodes}
    return r


def compose_rank(authority_r: int, priority: float) -> int:
    """The shared frontier-rank composition (engine twin:
    `CrawlEngine._authority_rank_view`)."""
    import math

    from ..operators.graph import AUTH_SEED_W
    return int(authority_r) + int(math.floor(priority * 1e6)) * AUTH_SEED_W


def host_round_quota(crawl_delay: float,
                     round_seconds: float = ROUND_SECONDS) -> int:
    """URLs a host may be scheduled per round (>= 1). `round_seconds` is the
    virtual wall-clock a round models — a shared engine/oracle parameter
    (bigger rounds = fewer, larger DataFrame jobs; same politeness floor)."""
    return max(1, int(round_seconds / crawl_delay))


def virtual_fetch_ts(round_no: int, slot: int, crawl_delay: float,
                     round_seconds: float = ROUND_SECONDS) -> float:
    """Deterministic virtual fetch timestamp: round start + politeness slots."""
    return round_no * round_seconds + slot * crawl_delay
