"""Integer PageRank (`operators/graph.py`): exact parity with a pure-
Python recompute of the same integer recurrence, plus the frontier
top-k view."""

from __future__ import annotations

from collections import defaultdict

from ai_intel_web_scraper_spark.operators import graph as G


def _py_pagerank(edges, n, iters):
    base = ((G.PR_DAMP_DEN - G.PR_DAMP_NUM) * G.PR_SCALE
            // (G.PR_DAMP_DEN * n))
    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    r = {v: G.PR_SCALE // n for v in range(n)}
    for _ in range(iters):
        s = defaultdict(int)
        for u, v in edges:
            s[v] += r[u] // outdeg[u]
        r = {v: base + (G.PR_DAMP_NUM * s.get(v, 0)) // G.PR_DAMP_DEN
             for v in range(n)}
    return r


def _gen_edges(n):
    return [(i, (i * 13 + 7 * (k + 1) + k * k) % n)
            for i in range(n) for k in range(i % 3 + 1)]


def test_pagerank_matches_python_recurrence_exactly(spark):
    n = 60
    got = {r["node"]: r["r"] for r in G.pagerank(
        G.link_graph(spark, n), n, iters=5).collect()}
    assert got == _py_pagerank(_gen_edges(n), n, 5)


def test_pagerank_mass_and_spread(spark):
    n = G.PR_N
    rows = G.pagerank(G.link_graph(spark, n), n).collect()
    assert len(rows) == n
    total = sum(r["r"] for r in rows)
    # integer DIVs only leak mass downward, never create it
    assert 0.9 * G.PR_SCALE < total <= G.PR_SCALE
    assert len({r["r"] for r in rows}) > 10  # ranks actually spread
    base = ((G.PR_DAMP_DEN - G.PR_DAMP_NUM) * G.PR_SCALE
            // (G.PR_DAMP_DEN * n))
    assert all(r["r"] >= base for r in rows)


def test_toprank_matches_full_sort(spark):
    n = 80
    full = sorted(((r["r"], r["node"]) for r in G.pagerank(
        G.link_graph(spark, n), n, iters=4).collect()),
        key=lambda t: (-t[0], t[1]))
    top = G.toprank_hosts(G.link_graph(spark, n), n, k=7, iters=4).collect()
    assert [(r["pos"], r["node"], r["r"]) for r in top] == [
        (i + 1, node, rank) for i, (rank, node) in enumerate(full[:7])]


def test_connected_components_match_union_find_on_cc_graph(spark):
    """Min-label propagation to convergence equals a union-find ground
    truth on the blocked graph: exactly n/block components, comp = the
    block's minimum node id for every member."""
    from ai_intel_web_scraper_spark.operators import dedup as D
    from ai_intel_web_scraper_spark.operators import graph as G
    from pyspark.sql import functions as F
    edges = G.cc_graph(spark)
    pairs = edges.select(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
    got = {r["id"]: r["comp"]
           for r in D.connected_components(pairs).collect()}
    # union-find over the same deterministic edge rule
    n, block = G.CC_N, G.CC_BLOCK
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        for k in range(i % 2 + 1):
            b = (i - i % block) + ((i * 13 + 7 * (k + 1) + k * k) % block)
            ra, rb = find(i), find(b)
            if ra != rb:
                parent[ra] = rb
    comp_min: dict[int, int] = {}
    for i in range(n):
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    want = {i: comp_min[find(i)] for i in range(n)}
    assert got == want
    assert len(set(got.values())) == n // block


def test_authority_over_equals_dense_id_pagerank(spark):
    """String-keyed PageRank (authority_over) must produce the same rank
    multiset as the dense-id recurrence on the isomorphic graph, with
    dangling nodes self-looped (here: node 'u3' has no out-links)."""
    from ai_intel_web_scraper_spark.operators import graph as G
    from pyspark.sql import functions as F
    names = [f"u{i}" for i in range(6)]
    raw = [(0, 1), (1, 2), (2, 0), (4, 2), (5, 2), (0, 2)]  # u3 dangling
    nodes = spark.createDataFrame([(n,) for n in names], "node string")
    edges = spark.createDataFrame([(names[a], names[b]) for a, b in raw],
                                  "src string, dst string")
    got = {r["node"]: r["r"]
           for r in G.authority_over(nodes, edges).collect()}
    int_edges = spark.createDataFrame(raw + [(3, 3)], "src long, dst long")
    want = {names[r["node"]]: r["r"]
            for r in G.pagerank(int_edges, 6).collect()}
    assert got == want and len(got) == 6
