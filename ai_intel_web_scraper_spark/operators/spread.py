"""Split-starved scan guard.

Single-file/single-row-group parquet inputs yield ONE scan split, so a
narrow pipeline (Arrow UDF signatures, codecs, regex chains) runs in one
task no matter how many cores the session has — the whole per-row cost
serializes. `spread_scan` redistributes rows round-robin BEFORE heavy
per-row work, but only when the scan actually is split-starved: on real
multi-split inputs (any production table) it is a no-op and adds no
Exchange. Row distribution never changes per-row results; callers apply
it only where downstream logic is row-independent or explicitly keyed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame, min_frac: float = 0.5) -> DataFrame:
    """Repartition to the session's parallelism iff the frame's current
    partitioning is below `min_frac` of it (e.g. a one-row-group parquet
    scan). No-op (and no added shuffle) otherwise."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n >= max(2, int(target * min_frac)):
        return df
    return df.repartition(target)
