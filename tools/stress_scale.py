"""Linear-scaling stress pass for the heavy operator families.

Round-3 verdict item #5: run semdedup, dup_spans, pq_topk, pack_shards,
pagerank_hosts and cc_hosts at sf0.1 AND at a 10x replica scale-up, and
check wall time grows ~linearly (no plan flips to nested-loop at AQE
sizes, no quadratic blow-up hiding behind small fixtures). Results are
recorded in BASELINE.md.

The 10x corpus is built ONCE from the driver's own sf0.1 parquet:
- documents: 10 replicas, ids offset by r*1e9, a per-replica token
  appended to the text (so cross-replica grams still collide heavily —
  the honest dedup workload — without every doc being a byte-identical
  copy), n_chars recomputed.
- embeddings: 10 replicas, ids offset, each component shifted by
  r*0.001 (replicas stay near each other -> cluster populations scale
  10x without collapsing into exact duplicates).
- graphs: the synthetic generators take n directly (10x nodes).

Usage: python tools/stress_scale.py [replicas] [case ...]  (default 10, all)
Prints one JSON line {query: {"base_sec": .., "x10_sec": .., "ratio": ..}}.

r5 addition: `semdedup_sqrt_k` re-runs the scaled semdedup point with the
cluster count sized k ~ sqrt(n) (the Abbas et al. convention the operator
docstring prescribes — the toy's fixed k=8 makes the within-cluster
quadratic visible at 20x; production sizing keeps cluster populations
bounded). The case also asserts the plan SHAPE is unchanged at the larger
k: still a cluster-equi join, never a nested loop.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
STRESS_DIR = "/tmp/spark_graft_stress_x{r}"


def build_scaled(spark, replicas: int) -> str:
    out = STRESS_DIR.format(r=replicas)
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    reps = spark.range(replicas).select(F.col("id").alias("_r"))
    docs = spark.read.parquet(os.path.join(BASE_SF, "documents.parquet"))
    text = F.concat(F.col("text"), F.lit(" rep"),
                    F.col("_r").cast("string"))
    (docs.crossJoin(reps)
     .select((F.col("doc_id") + F.col("_r") * F.lit(1_000_000_000))
             .alias("doc_id"),
             text.alias("text"), "lang", "source",
             F.length(text).cast("long").alias("n_chars"))
     .repartition(32)
     .write.mode("overwrite")
     .parquet(os.path.join(out, "documents.parquet")))
    emb = spark.read.parquet(os.path.join(BASE_SF, "embeddings.parquet"))
    (emb.crossJoin(reps)
     .select((F.col("vec_id") + F.col("_r") * F.lit(1_000_000_000))
             .alias("vec_id"),
             F.transform("embedding",
                         lambda x: (x.cast("double")
                                    + F.col("_r").cast("double") * 0.001)
                         .cast("float")).alias("embedding"),
             "label")
     .repartition(32)
     .write.mode("overwrite")
     .parquet(os.path.join(out, "embeddings.parquet")))
    open(marker, "w").write("ok")
    return out


def _time(fn) -> float:
    """Wall time of query CONSTRUCTION + full execution (several of the
    heavy queries do eager work — iterative fixpoints, sample-local
    training — while building the DataFrame, exactly like bench.py's
    timing contract)."""
    t0 = time.time()
    df = fn()
    (df.select(F.xxhash64(*df.columns).alias("_h"))
     .agg(F.expr("bit_xor(_h)")).collect())
    return round(time.time() - t0, 2)


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = set(sys.argv[2:])
    from ai_intel_web_scraper_spark.operators import dedup as D
    from ai_intel_web_scraper_spark.operators import graph as G
    from ai_intel_web_scraper_spark.operators import vectors as V
    from ai_intel_web_scraper_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark(app="stress-scale", cores=32, shuffle_partitions=64)
    big = build_scaled(spark, replicas)
    qs = E.queries()

    def cc(spark_, n):
        edges = G.cc_graph(spark_, n=n)
        pairs = edges.select(F.col("a").alias("id_a"),
                             F.col("b").alias("id_b"))
        return (D.connected_components(pairs)
                .select(F.col("id").alias("node"), "comp"))

    sqrt_k = max(8, int(round(8 * replicas ** 0.5)))

    def _semdedup_sized():
        df = V.semdedup(
            spark.read.parquet(os.path.join(big, "embeddings.parquet")),
            n_centroids=sqrt_k)
        plan = df._jdf.queryExecution().executedPlan().toString()
        import re
        assert re.search(
            "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", plan)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        return df

    # --- r5 image/video cases ------------------------------------------
    # Synthetic image archive at web-ish scale: uniform 64-bit hashes
    # stand in for phashes, ~10% of each delta planted as 2-bit-flipped
    # near-dups of archive rows. max_hamming=2 (3 blocks x ~21 bits) is
    # the honest large-scale setting — the guaranteed-recall tiling's
    # candidate count scales with n^2/2^width, so wide blocks (tight
    # thresholds) are what a 10^10-image archive runs; the fixture-scale
    # d=6 stays correct because real corpora are far from uniform.
    from ai_intel_web_scraper_spark.operators import multimodal as M

    IMG_D, IMG_DELTA, IMG_ARCH = 2, 50_000, 1_000_000

    def img_archive(n):
        return spark.range(n).select(
            F.concat(F.lit("a"), F.col("id").cast("string"))
            .alias("image_id"),
            F.xxhash64(F.col("id").cast("string")).alias("phash"))

    def img_delta(arch_n):
        near = (F.xxhash64((F.col("id") % arch_n).cast("string"))
                .bitwiseXOR(F.lit(3)))
        fresh = F.xxhash64(F.concat(F.lit("d"), F.col("id").cast("string")))
        return spark.range(IMG_DELTA).select(
            F.concat(F.lit("d"), F.col("id").cast("string"))
            .alias("image_id"),
            F.when(F.pmod("id", F.lit(10)) == 0, near)
            .otherwise(fresh).alias("phash"))

    def img_blocks_path(n):
        """The persisted archive block table (production layout), built
        OUTSIDE the timer — per-round work must not pay the archive
        re-explode."""
        p = f"/tmp/spark_graft_img_blocks_{n}_d{IMG_D}"
        marker = os.path.join(p, "_SUCCESS")
        if not os.path.exists(marker):
            D.hamming_block_rows(img_archive(n), "image_id", "phash",
                                 IMG_D).write.mode("overwrite").parquet(p)
        return p

    def incr_image(arch_n, persisted):
        blocks = (spark.read.parquet(img_blocks_path(arch_n))
                  if persisted else None)
        return M.incremental_phash_neardup(
            img_delta(arch_n), img_archive(arch_n), IMG_D,
            index_blocks=blocks, broadcast_delta=persisted)

    cases = {
        "semdedup": (lambda: qs["semdedup"](spark, BASE_SF),
                     lambda: qs["semdedup"](spark, big)),
        # r5: delta-vs-archive image probe, archive re-exploded per round
        # (the oracle-checkable shape) vs probed from the PERSISTED block
        # table (the production shape) — delta fixed, archive x replicas
        "incr_image_rebuild": (
            lambda: incr_image(IMG_ARCH, False),
            lambda: incr_image(IMG_ARCH * replicas, False)),
        "incr_image_persisted": (
            lambda: incr_image(IMG_ARCH, True),
            lambda: incr_image(IMG_ARCH * replicas, True)),
        # r5: video near-dup — signature extraction + block join over the
        # replicated documents (groups stay 4-wide, so pair density is
        # constant and growth is honest)
        "video_neardup": (lambda: qs["video_neardup"](spark, BASE_SF),
                          lambda: qs["video_neardup"](spark, big)),
        # the paper's sizing: k ~ sqrt(n) at the scaled point (same
        # fixed-k base, so the ratio is directly comparable to
        # `semdedup`'s); plan shape asserted unchanged at the larger k
        "semdedup_sqrt_k": (lambda: qs["semdedup"](spark, BASE_SF),
                            _semdedup_sized),
        "dup_spans": (lambda: qs["dup_spans"](spark, BASE_SF),
                      lambda: qs["dup_spans"](spark, big)),
        "incremental_dedup": (
            lambda: qs["incremental_dedup"](spark, BASE_SF),
            lambda: qs["incremental_dedup"](spark, big)),
        "pq_topk": (lambda: qs["pq_topk"](spark, BASE_SF),
                    lambda: qs["pq_topk"](spark, big)),
        "pack_shards": (lambda: qs["pack_shards"](spark, BASE_SF),
                        lambda: qs["pack_shards"](spark, big)),
        "pagerank_hosts": (
            lambda: G.pagerank(G.link_graph(spark, G.PR_N * 20),
                               G.PR_N * 20),
            lambda: G.pagerank(G.link_graph(spark, G.PR_N * 200),
                               G.PR_N * 200)),
        "cc_hosts": (lambda: cc(spark, 10_000),
                     lambda: cc(spark, 100_000)),
    }
    # warm the JVM/parquet paths once so neither side eats the startup
    _time(lambda: spark.read.parquet(os.path.join(big, "documents.parquet"))
          .limit(1000))
    out = {}
    if only:
        cases = {k: v for k, v in cases.items() if k in only}
    if "incr_image_persisted" in cases:
        # the archive block table is a ONE-OFF layout cost (production
        # appends to it); build both sizes outside the probe timer
        img_blocks_path(IMG_ARCH)
        img_blocks_path(IMG_ARCH * replicas)
    for name, (base_fn, big_fn) in cases.items():
        b = _time(base_fn)
        x = _time(big_fn)
        out[name] = {"base_sec": b, "x10_sec": x,
                     "ratio": round(x / b, 2) if b else None}
        print(f"  {name}: {b}s -> {x}s (x{out[name]['ratio']})",
              file=sys.stderr)
    print(json.dumps({"replicas": replicas, "queries": out}))


if __name__ == "__main__":
    main()
