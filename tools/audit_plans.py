"""Physical-plan audit: for each headline query, verify the properties that
matter at 100 TB and write PLANS.md.

Checks per query (against `.queryExecution().executedPlan()` on sf0.01):
- scan pruning: the parquet scan's ReadSchema contains only needed columns
- filter pushdown: PushedFilters non-empty when the query filters the scan
- whole-stage codegen present (JVM-side expression evaluation)
- broadcast joins where a side is dim-sized (no accidental SMJ of a dim)
- WindowGroupLimit for quota/top-k windows (partial limit before shuffle)
- no row-at-a-time Python UDFs (BatchEvalPython); ArrowEvalPython/MapInPandas
  only where the operator is genuinely non-relational

Usage: python tools/audit_plans.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from ai_intel_web_scraper_spark.session import get_spark  # noqa: E402

AUDIT = {
    # prop prefixed with '!' must be ABSENT from the plan
    "pricing_summary": ["PushedFilters: \\[IsNotNull", "partial_sum",
                        r"ReadSchema: struct<l_quantity",  # pruned: no orderkey etc.
                        "!l_orderkey"],
    "docs_keep_first": ["WindowGroupLimit"],  # rn=1 keep-first partial limit
    "topic_tags": ["WindowGroupLimit"],       # top-3 partial limit
    "budget_prefix": ["RunningWindowFunction|Window"],
    "rrf_fusion": ["partial_sum", "TakeOrderedAndProject"],
    "topk_cosine": ["TakeOrderedAndProject"],  # heap top-k, no global sort
    "group_stats": ["BroadcastHashJoin", "partial_"],
    "cube_stats": ["Expand", "partial_"],
    "user_quota": ["WindowGroupLimit"],
    "url_classify": ["!Exchange"],             # pure narrow map: no shuffle
    "word_count": ["!Exchange"],
    "new_docs_anti": ["BroadcastHashJoin.*LeftAnti|LeftAnti.*BuildRight"],
    "nation_coverage": ["BroadcastHashJoin"],
    "top_revenue_orders": ["BroadcastHashJoin", "TakeOrderedAndProject",
                          "PushedFilters: \\[IsNotNull"],
    "jaccard_top_pairs": ["TakeOrderedAndProject"],
    "token_window_chunks": ["Generate"],       # posexplode, table-generating
    "minhash_pairs": ["ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"],
    "hash_embed": ["ArrowEvalPython"],
    # r3 additions
    "text_metrics": ["!Exchange", r"\*\(\d+\) Project"],  # narrow, codegen'd
    "metadata_sanitize": ["WindowGroupLimit",  # topic top-3 partial limit
                          "!ArrowEvalPython", "!MapInPandas"],  # native only
    "audio_features": ["MapInPandas", "!Exchange"],  # narrow map, no shuffle
    "video_frames": ["MapInPandas", "!Exchange"],    # bytes never shuffle
    # R5: pure scalar projection — no UDF, no shuffle, single codegen map
    "query_analysis": ["!Exchange", "!ArrowEvalPython", "!MapInPandas"],
    # V1 real-BPE: one Arrow batch stage over the scan, no shuffle
    "bpe_tokens": ["ArrowEvalPython", "!Exchange"],
    "bpe_chunks": ["MapInPandas", "!Exchange"],
    # corpus hygiene (late r3): Arrow narrow map / broadcast join / regexp map
    "repetition_signals": ["ArrowEvalPython",   # per-doc signals: one Arrow
                           "!Exchange"],        # batch, NO corpus shuffle
    "decontaminate": ["ArrowEvalPython",        # hashed grams from one Arrow
                      "BroadcastHashJoin",      # pass; gram-hash set is the
                      "Generate",               # broadcast side; corpus
                      "partial_count"],         # explode feeds the join
                                                # map-side, agg only on hits
    "pii_scrub": ["!Exchange",                  # regexp chain: narrow map only
                  "!ArrowEvalPython", "!MapInPandas"],
    "lm_quality": ["ArrowEvalPython",           # constant LM broadcast into
                   "!Exchange"],                # one Arrow batch, no shuffle
    # dataset assembly (late r3): the corpus-sized window must carry the
    # _bucket partition spec (the two-level prefix sum — only the
    # n_buckets-row totals frame crosses a single partition, then joins
    # back broadcast); everything is native exprs, no Python stage
    "pack_shards": [r"windowspecdefinition\(_bucket", "BroadcastHashJoin",
                    r"ReadSchema: struct<doc_id:bigint,text:string",
                    "!ArrowEvalPython", "!MapInPandas"],
    "shard_spans": [r"Generate explode\(sequence",    # native span fan-out
                    "!ArrowEvalPython", "!MapInPandas"],
    "mixture_sample": ["BroadcastHashJoin",           # rates broadcast in
                       "partial_count",               # map-side agg
                       r"PushedFilters: \[IsNotNull\(source\)",
                       "!ArrowEvalPython", "!MapInPandas"],
    # curriculum packing reuses the two-level machinery verbatim — same
    # asserts as pack_shards (the stratum only changes the key expr)
    "pack_curriculum": [r"windowspecdefinition\(_bucket",
                        "BroadcastHashJoin",
                        "!ArrowEvalPython", "!MapInPandas"],
    # token-weighted mixture: token counts are a native regexp projection
    # folded into the map-side partial agg; rates still broadcast in
    "mixture_tokens": ["BroadcastHashJoin", "partial_sum",
                       "!ArrowEvalPython", "!MapInPandas"],
    # exact-substring dup spans: positional gram hashes from one Arrow
    # pass + posexplode; duplicate set via hash-only partial agg; the
    # corpus rejoins it with a semi-join (no broadcast assumption); the
    # island merge is a per-doc window
    "dup_spans": ["ArrowEvalPython", "Generate", "partial_count",
                  "LeftSemi", "windowspecdefinition\\(doc_id"],
    # as-of join: union-tag shape — one union, one window over the key,
    # NEVER a nested-loop theta-join; pure native exprs
    "asof_clicks": ["Union", r"windowspecdefinition\(_k",
                    "!BroadcastNestedLoopJoin", "!CartesianProduct",
                    "!ArrowEvalPython", "!MapInPandas"],
    # interval join: bucketed equi-join (interval explode + hash join +
    # residual filter) — the BETWEEN theta-join would be a nested loop
    "range_windows": [r"Generate explode\(sequence", "partial_count",
                      "!BroadcastNestedLoopJoin", "!CartesianProduct",
                      "!ArrowEvalPython", "!MapInPandas"],
    # integer PageRank: Pregel step = edges⋈ranks + partial-agg groupBy;
    # pure native integer exprs, no Python stage anywhere in the loop
    "pagerank_hosts": ["partial_sum", "!ArrowEvalPython", "!MapInPandas",
                       "!CartesianProduct"],
    # SemDeDup: the pairwise check must be an EQUI-join on the cluster id
    # (shuffle by cluster, residual predicates on sim/order) — never a
    # nested-loop/cartesian over the corpus; all native exprs
    "semdedup": ["SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin",
                 "!CartesianProduct", "!BroadcastNestedLoopJoin",
                 "!ArrowEvalPython", "!MapInPandas"],
    # HLL registers: explode grams -> 256-group partial-max agg; pure
    # native md5/shift exprs, no Python stage
    "hll_registers": ["Generate", "partial_max",
                      "!ArrowEvalPython", "!MapInPandas"],
    # HLL summary: same sketch + scalar fold; the one BNLJ in this plan is
    # the 1-row x 1-row crossJoin of two scalar aggregates (constant), so
    # it is deliberately NOT forbidden here
    "hll_card": ["partial_max", "partial_sum", "partial_count",
                 "!ArrowEvalPython", "!MapInPandas"],
    # count-min heavy hitters: map-side partial counts, constant-size grid
    # broadcast into the probe join, heap top-k
    "cms_heavy_hitters": ["partial_count", "BroadcastHashJoin",
                          "TakeOrderedAndProject",
                          "!ArrowEvalPython", "!MapInPandas"],
    # deterministic k-per-stratum sample: the literal rank bound MUST
    # trigger WindowGroupLimit (per-partition partial top-k = the
    # distributed-reservoir property); hash ranking is a native expr
    "stratified_sample": ["WindowGroupLimit",
                          "!ArrowEvalPython", "!MapInPandas"],
    # exact group quantiles: one rank window; the BNLJ is the deliberate
    # cross join against the constant 3-row percentile frame (broadcast,
    # constant work per row) — NOT a data-sized nested loop
    "group_quantiles": ["Window", "!CartesianProduct",
                        "!ArrowEvalPython", "!MapInPandas"],
    # composed hygiene lifecycle (single-pass labeling): fingerprint-rank
    # window (no group limit — every row keeps its label), broadcast
    # contamination join, Arrow signal UDFs — never a BatchEvalPython
    "hygiene_pipeline": ["Window", "BroadcastHashJoin",
                         "ArrowEvalPython"],
    # integer k-means: the returned assignment pass is a pure narrow map
    # (argmin over literal centroids, no UDF, no shuffle); the training
    # loop's per-iteration agg is the one shuffle and stays off this plan
    "kmeans_clusters": ["!Exchange", "!ArrowEvalPython", "!MapInPandas"],
    # trained IVF: probe filter + exact re-rank -> heap top-k
    "ann_ivf_trained": ["TakeOrderedAndProject",
                        "!ArrowEvalPython", "!MapInPandas"],
    # PQ ADC: encode + table lookups are one narrow codegen map feeding
    # the heap top-k — NO shuffle anywhere in the query path
    "pq_topk": ["TakeOrderedAndProject", "!Exchange",
                "!ArrowEvalPython", "!MapInPandas"],
    "ivf_pq_topk": ["TakeOrderedAndProject", "!Exchange",
                    "!ArrowEvalPython", "!MapInPandas"],
    # recrawl scheduling: lag window keyed on the page id; the single-
    # Exchange property is asserted exactly in tests/test_temporal.py
    "recrawl_schedule": [r"windowspecdefinition\(user_id",
                         "!ArrowEvalPython", "!MapInPandas"],
    # sitemap parse: block explode + narrow regexp maps, NO shuffle and
    # no Python stage — cheap enough to run inside the fetch round
    "sitemap_ingest": ["Generate", "!Exchange",
                       "!ArrowEvalPython", "!MapInPandas"],
    # pair QA: dup-group window keyed on phash; never a nested loop; all
    # native exprs (join strategy left to Catalyst/AQE — caption spread
    # is data-sized, so no broadcast assertion)
    "image_text_qa": [r"windowspecdefinition\(phash",
                      "!CartesianProduct", "!BroadcastNestedLoopJoin",
                      "!ArrowEvalPython", "!MapInPandas"],
    # WebDataset sink: one cogroup stage builds each tar executor-side
    "webdataset_export": ["FlatMapGroupsInPandas"],
    # r4 pair curation: ONE Arrow batch stage over the scan, no shuffle,
    # and the bytes column pruned out of the read entirely
    "pair_alignment": ["ArrowEvalPython", "!Exchange", "!bytes"],
    "pair_filters": ["ArrowEvalPython", "!Exchange", "!bytes"],
    # r4 authority compose: equi-joins only through the PR loop
    "frontier_authority": ["!CartesianProduct", "!BroadcastNestedLoopJoin"],
    # r4 incremental dedup: band equi-joins, never an all-pairs scan
    "incremental_dedup": ["ArrowEvalPython", "!CartesianProduct",
                          "!BroadcastNestedLoopJoin"],
    # r4 quality->policy feedback: partial agg + equi-join, bytes pruned
    "host_blocklist": ["partial_count", "!bytes", "!CartesianProduct"],
    # r4 stratified gating: percentile rank window on the group key +
    # broadcast cutoff join; native exprs only
    "adaptive_quality": [r"windowspecdefinition\(source", "BroadcastHashJoin",
                         "!ArrowEvalPython", "!MapInPandas"],
    # r4 composed lifecycle: phash keep-first window feeding the tar
    # cogroup; never a nested loop
    "image_pipeline": [r"windowspecdefinition\(phash",
                       "FlatMapGroupsInPandas",
                       "!CartesianProduct", "!BroadcastNestedLoopJoin"],
    # r4 robots sitemap discovery: one Generate over a narrow scan
    "robots_sitemaps": ["Generate", "!Exchange",
                        "!ArrowEvalPython", "!MapInPandas"],
    # r5 incremental image dedup: block posexplode + (blk, blk_val)
    # equi-joins only — all-native (phash is a stored column), and the
    # archive side is probed, never self-joined
    "incremental_image_dedup": ["Generate", "!CartesianProduct",
                                "!BroadcastNestedLoopJoin",
                                "!ArrowEvalPython", "!MapInPandas"],
    # r5 video near-dup: clip synthesis + signature extraction are narrow
    # MapInPandas stages (bytes never cross the block join's shuffle —
    # only the 8-byte signature does); pairs via equi-join, no nested loop
    "video_neardup": ["MapInPandas", "!CartesianProduct",
                      "!BroadcastNestedLoopJoin"],
    # r5 WARC ingest: build cogroup + parse map, bodies split natively —
    # no shuffle after the parse, no Python beyond the two Arrow stages
    "warc_source": ["FlatMapGroupsInPandas", "MapInPandas",
                    "!CartesianProduct", "!BroadcastNestedLoopJoin"],
    # r5 audio near-dup: synthesis + fingerprint are narrow MapInPandas
    # stages; pairs via the block equi-join, never a nested loop
    "audio_neardup": ["MapInPandas", "!CartesianProduct",
                      "!BroadcastNestedLoopJoin"],
    # r5 cross-modal retrieval: constant-mask scoring is pure codegen
    # (no Python stage, bytes pruned), top-k per query pushes the
    # literal rank bound into the shuffle
    "crossmodal_topk": ["WindowGroupLimit", "!bytes",
                        "!ArrowEvalPython", "!MapInPandas"],
    # r5 byte-budget shards: the global byte prefix is TWO-LEVEL (bucket-
    # partitioned running window + broadcast bucket-prefix frame), then
    # the shared tar cogroup — never a whole-corpus single-partition sort
    "webdataset_budget": [r"windowspecdefinition\(_bucket",
                          "FlatMapGroupsInPandas", "BroadcastHashJoin",
                          "!CartesianProduct", "!BroadcastNestedLoopJoin"],
}
FORBIDDEN = "BatchEvalPython"  # row-at-a-time Python UDF — never acceptable


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app="audit", cores=8, shuffle_partitions=8)
    qs = E.queries()
    print("# PLANS — physical-plan audit (auto-generated by "
          "tools/audit_plans.py)\n")
    print(f"Input: `{sf_dir}`. Each query's executed plan is checked for the "
          "properties that matter at scale; the full formatted plan for the "
          "flagship queries follows.\n")
    print("| query | expected plan properties | verdict |")
    print("|---|---|---|")
    failures = 0
    plans = {}
    for name, props in AUDIT.items():
        df = qs[name](spark, sf_dir)
        # the statically-planned string (pre-AQE-finalization) carries every
        # property we assert; executing the query would not refresh this
        # cached lazy val anyway
        plan = df._jdf.queryExecution().executedPlan().toString()
        plans[name] = plan
        bad = []
        for p in props:
            if p.startswith("!"):
                if re.search(p[1:], plan):
                    bad.append(f"unexpected {p[1:]}")
            elif not re.search(p, plan):
                bad.append(f"missing {p}")
        if re.search(FORBIDDEN, plan):
            bad.append("row-at-a-time Python UDF (BatchEvalPython)")
        verdict = "OK" if not bad else "FAIL: " + "; ".join(bad)
        failures += bool(bad)
        print(f"| {name} | {', '.join(props)} | {verdict} |")

    # r5: the bucketed url_seen anti-join is engine state, not a driver
    # query — audit it directly on a bootstrapped bucketed-layout engine
    # (broadcast disabled to expose the worst-case SMJ shape). Asserts:
    # the seen scan is bucketed, exactly ONE url_hash Exchange exists
    # (the candidate delta side — a seen-side Exchange would add a
    # second), and the inner join is single-key (the Catalyst
    # filter-into-join regression would re-key it to two columns).
    import shutil as _sh

    from pyspark.sql import functions as F

    from ai_intel_web_scraper_spark.crawl.scheduler import (CrawlConfig,
                                                            CrawlEngine)
    wh = "/tmp/spark_graft_audit_wh"
    _sh.rmtree(wh, ignore_errors=True)
    eng = CrawlEngine(spark, E._crawl_fixture_paths(), wh,
                      CrawlConfig(seen_layout="bucketed",
                                  write_payload=False))
    eng.bootstrap()
    cand = eng.store.read("url_seen").select(
        "url_hash", "url", F.lit("h").alias("host"),
        F.lit(1).alias("depth"),
        F.lit(5).cast("long").alias("discovery_seq"), "bucket")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (eng._anti_seen(cand)._jdf.queryExecution()
                .executedPlan().toString())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
    anti_props = [
        r"Bucketed: true",
        r"Exchange hashpartitioning\(url_hash",
        r"!(?s)Exchange hashpartitioning\(url_hash"
        r".*Exchange hashpartitioning\(url_hash",
        r"!Join \[[^\]]*,[^\]]*\], \[[^\]]*\], Inner",
    ]
    bad = []
    for p in anti_props:
        if p.startswith("!"):
            if re.search(p[1:], plan):
                bad.append(f"unexpected {p[1:]}")
        elif not re.search(p, plan):
            bad.append(f"missing {p}")
    verdict = "OK" if not bad else "FAIL: " + "; ".join(bad)
    failures += bool(bad)
    print(f"| crawl_anti_seen[bucketed] | bucketed seen scan, single "
          f"url_hash Exchange (delta side only), single-key inner join "
          f"| {verdict} |")

    print("\n## Notes\n")
    print("- `WindowGroupLimit` = Catalyst's partial per-partition top-k "
          "inserted BEFORE the window shuffle (enabled by the literal "
          "max-quota conjunct in `politeness_rank` and `quota_window`).")
    print("- `ArrowEvalPython`/`MapInPandas` appear only for operators that "
          "are genuinely non-relational (minhash permutations, hash "
          "embeddings, image decode); `BatchEvalPython` (row-at-a-time) "
          "appears nowhere.")
    print("- Scans show `ReadSchema` restricted to referenced columns "
          "(column pruning) and `PushedFilters` for scan-level predicates.")
    print("- `!X` rows assert X is ABSENT (e.g. narrow maps must not "
          "shuffle).")
    print("- Whole-stage codegen is not asserted textually: Spark 4's "
          "cached pre-finalization AQE plan string omits codegen ids; all "
          "operators used here (scan/filter/project/hash-agg/window/"
          "broadcast-join) are codegen-supported and run inside "
          "WholeStageCodegen at execution (visible in the Spark UI).")

    print("\n## Flagship plans (formatted)\n")
    for name in ("pricing_summary", "user_quota", "new_docs_anti"):
        print(f"### {name}\n\n```")
        print(plans[name][:4000])
        print("```\n")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
