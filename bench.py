"""Benchmark harness.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "crawl": {scheduled, deduped_candidates, new_urls, wall_sec,
             throughput_urls_per_sec}}

- Operator queries run at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  on local[$SPARK_GRAFT_CPUS] (default 32).
- The crawl bench generates a synthetic web (cached in /tmp, Spark-parallel,
  seeded) and runs the full frontier scheduler on it; throughput counts URLs
  scheduled plus candidate URLs deduped per second of crawl wall time.

Flags:
  --cores N        override core count (used for the N vs 4N scaling runs)
  --crawl-only     skip operator queries (scaling evidence mode)
  --queries-only   skip the crawl bench
  --hosts/--pages  crawl bench scale knobs
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary", "docs_keep_first", "topic_tags", "budget_prefix",
    "rrf_fusion", "topk_cosine", "group_stats", "jaccard_top_pairs",
    "user_quota", "token_window_chunks", "minhash_pairs", "simhash_pairs",
]


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as E
    qs = E.queries()
    out = {}
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        out[name] = round(time.time() - t0, 3)
        _ = n
    return out


def crawl_fixtures(spark, n_hosts: int, total_pages: int, with_bytes: bool,
                   budget_scale: int = 1) -> dict:
    from ai_intel_web_scraper_spark.synth.generator import (
        FX_VERSION, WebSpec, generate_fixtures_spark)
    tag = (f"h{n_hosts}_p{total_pages}_b{int(with_bytes)}_s{budget_scale}"
           f"_v{FX_VERSION}")
    out = f"/tmp/spark_graft_bench_fx_{tag}"
    done = os.path.join(out, "_DONE")
    spec = WebSpec(seed=42, n_hosts=n_hosts, total_pages=total_pages,
                   budget_scale=budget_scale,
                   max_pages_per_host=400 * budget_scale)
    if not os.path.exists(done):
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        generate_fixtures_spark(spark, spec, out, with_bytes=with_bytes)
        with open(done, "w") as f:
            f.write(f"{time.time() - t0:.1f}")
    return {n: os.path.join(out, f"{n}.parquet")
            for n in ("pages", "web_graph", "seeds", "politeness", "robots")}


def run_crawl(spark, n_hosts: int, total_pages: int,
              with_payload: bool, round_seconds: float,
              budget_scale: int = 1) -> dict:
    from ai_intel_web_scraper_spark.crawl.scheduler import (CrawlConfig,
                                                            CrawlEngine)
    fx = crawl_fixtures(spark, n_hosts, total_pages,
                        with_bytes=with_payload, budget_scale=budget_scale)
    wh = "/tmp/spark_graft_bench_wh"
    shutil.rmtree(wh, ignore_errors=True)
    eng = CrawlEngine(spark, fx, wh, CrawlConfig(
        expected_urls=max(1 << 20, total_pages * 4),
        write_payload=with_payload, round_seconds=round_seconds,
        n_salt=8))
    t0 = time.time()
    rounds = eng.run()
    wall = time.time() - t0
    scheduled = sum(m["scheduled"] for m in rounds)
    discovered = sum(m["discovered"] for m in rounds)
    new_urls = sum(m["new_urls"] for m in rounds)
    fetched = sum(m["fetched_ok"] for m in rounds)
    return {
        "rounds": len(rounds), "scheduled": scheduled,
        "deduped_candidates": discovered, "new_urls": new_urls,
        "fetched_ok": fetched, "wall_sec": round(wall, 2),
        "throughput_urls_per_sec": round((scheduled + discovered) / wall, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--crawl-only", action="store_true")
    ap.add_argument("--queries-only", action="store_true")
    ap.add_argument("--hosts", type=int, default=1200)
    ap.add_argument("--pages", type=int, default=60000)
    ap.add_argument("--payload", action="store_true", default=True)
    ap.add_argument("--no-payload", dest="payload", action="store_false")
    ap.add_argument("--round-seconds", type=float, default=600.0)
    ap.add_argument("--budget-scale", type=int, default=1)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from ai_intel_web_scraper_spark.session import get_spark
    spark = get_spark(app="bench", cores=args.cores,
                      shuffle_partitions=max(args.cores, 16))

    t_all = time.time()
    queries: dict[str, float] = {}
    crawl: dict = {}
    if not args.crawl_only:
        queries = run_queries(spark, sf_dir)
    if not args.queries_only:
        crawl = run_crawl(spark, args.hosts, args.pages,
                          args.payload, args.round_seconds,
                          args.budget_scale)
        queries["crawl_scheduling"] = crawl["wall_sec"]
    total = round(time.time() - t_all, 2)

    print(json.dumps({
        "metric": "frontier-scheduling throughput + operator suite wall time",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cores": args.cores,
        "crawl": crawl,
    }))


if __name__ == "__main__":
    main()
