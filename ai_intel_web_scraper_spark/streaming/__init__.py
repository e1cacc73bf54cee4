"""Structured Streaming operators.

The reference is strictly sequential batch (SURVEY §2.6) — the engine's
round-based crawl is the Spark-idiomatic frame for it. This package adds the
streaming-native operators a continuously-running crawl/ingest pipeline
needs: watermarked windowed aggregation over an event stream and
session-window rollups, runnable against a file source in tests
(`format("parquet")` -> memory sink, `processAllAvailable`).
"""
