"""End-to-end lifecycle pipelines (SURVEY §3).

§3.1 scrape  -> the crawl engine (crawl/scheduler.py)
§3.2 process -> clean -> tag -> filter -> dedup (operators/*, composed in
                __spark_entry__.q_process_pipeline)
§3.3 vectorize (here): read -> chunk -> embed -> keyed upsert
     (reference pipeline.py:537-547 -> ingest.py:151-198: load ->
     Chunker.chunk_records -> Embedder.embed -> VectorStore.upsert).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .crawl.statestore import SnapshotStore, merge_upsert
from .operators.chunking import recursive_chunks
from .operators.vectors import hash_embed_udf

CHUNKS_SCHEMA = ("doc_id long, chunk_index int, chunk_text string, "
                 "token_count int, chunk_id string, "
                 "embedding array<float>")


def vectorize(spark: SparkSession, docs: DataFrame, warehouse: str,
              id_col: str = "doc_id", text_col: str = "text",
              prefix_cols: list[str] | None = None) -> SnapshotStore:
    """SURVEY §3.3: chunk every document (recursive splitter with context
    prefix), embed each chunk (deterministic stand-in embedder,
    Arrow-batched), and MERGE the (chunk_id -> row) set into the
    snapshot-versioned `chunks` table — re-vectorizing changed documents
    updates their rows in place, untouched chunks survive, and prior
    snapshots remain readable."""
    store = SnapshotStore(spark, warehouse, schemas={"chunks": CHUNKS_SCHEMA})
    chunks = recursive_chunks(docs, id_col, text_col,
                              prefix_cols=prefix_cols or [])
    embedded = chunks.withColumn("embedding",
                                 hash_embed_udf()(F.col("chunk_text")))
    merge_upsert(store, "chunks", embedded, ["chunk_id"])
    store.commit(round_no=int(store.current_snapshot_id() or 0) + 1,
                 metrics={"stage": "vectorize"})
    return store
