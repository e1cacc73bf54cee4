"""Deterministic synthetic web fixtures (pages, web_graph, seeds, politeness, robots)."""
