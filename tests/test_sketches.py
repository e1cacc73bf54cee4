"""Sketch-operator properties: HLL register/estimate laws, CMS bounds,
and the merge associativity that makes both sketches scale-safe."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_intel_web_scraper_spark.operators import sketches as SK


def _keys(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k"))


def test_hll_estimate_within_rse_bound(spark):
    """Raw HLL estimate on a known-cardinality key set lands within 3x
    the theoretical relative standard error (1.04/sqrt(256) = 6.5%)."""
    n = 20_000
    row = SK.hll_cardinality(_keys(spark, 0, n), "k").first()
    assert row["exact_distinct"] == n
    est = SK.hll_estimate(row["n_nonempty"], row["numer"])
    assert abs(est - n) / n < 3 * 1.04 / (SK.HLL_M ** 0.5)
    # the emitted integer estimate is the floor of the raw formula
    raw = SK.HLL_ALPHA * SK.HLL_M * SK.HLL_M * SK.HLL_NUMER_SCALE / row["numer"]
    assert row["est_card"] == int(raw // 1)


def test_hll_duplicates_do_not_move_registers(spark):
    """Cardinality sketches ignore multiplicity: hashing each key once vs
    five times yields identical register tables."""
    once = {(r["bucket"], r["max_rho"])
            for r in SK.hll_registers(_keys(spark, 0, 500), "k").collect()}
    five = _keys(spark, 0, 500).withColumn(
        "x", F.explode(F.array(*[F.lit(i) for i in range(5)]))).select("k")
    assert once == {(r["bucket"], r["max_rho"])
                    for r in SK.hll_registers(five, "k").collect()}


def test_hll_registers_merge_by_max(spark):
    """Union-then-sketch == sketch-then-elementwise-max: the property that
    lets 1000 executors sketch partitions independently and OR-merge 256
    integers at the end."""
    a = SK.hll_registers(_keys(spark, 0, 3000), "k")
    b = SK.hll_registers(_keys(spark, 2000, 6000), "k")
    merged = {r["bucket"]: r["max_rho"]
              for r in (a.unionByName(b).groupBy("bucket")
                        .agg(F.max("max_rho").alias("max_rho")).collect())}
    direct = {r["bucket"]: r["max_rho"]
              for r in SK.hll_registers(_keys(spark, 0, 6000), "k").collect()}
    assert merged == direct


def test_hll_small_range_correction(spark):
    """With far fewer keys than registers the client-side estimate takes
    the linear-counting branch and is exact-ish (here: well within 20%)."""
    row = SK.hll_cardinality(_keys(spark, 0, 30), "k").first()
    est = SK.hll_estimate(row["n_nonempty"], row["numer"])
    assert abs(est - 30) / 30 < 0.2


def test_cms_never_underestimates_and_is_tight_without_collisions(spark):
    """CMS point queries are always >= the true count; with 100 keys in a
    4x256 grid at least one depth row is collision-free for most keys, so
    the min over rows is usually exact."""
    items = spark.range(0, 100).select(
        F.explode(F.sequence(F.lit(1), (F.pmod(F.col("id"), 7) + 1)))
        .alias("_"), F.concat(F.lit("w"), F.col("id")).alias("k"))
    exact = {r["k"]: r["n"] for r in
             items.groupBy("k").agg(F.count("*").alias("n")).collect()}
    counts = items.groupBy("k").agg(F.count("*").alias("cnt"))
    regs = SK.cms_registers(counts, "k", "cnt")
    ests = {r["k"]: r["cms_est"] for r in
            SK.cms_estimates(regs, counts.select("k"), "k").collect()}
    assert set(ests) == set(exact)
    assert all(ests[k] >= exact[k] for k in exact)
    tight = sum(1 for k in exact if ests[k] == exact[k])
    assert tight >= 0.9 * len(exact)


def test_cms_grids_merge_by_addition(spark):
    """grid(A + B) == grid(A) + grid(B) cell-wise — the linearity that
    makes the sketch a partition-parallel aggregate at scale."""
    a = spark.createDataFrame([("x", 3), ("y", 2)], "k string, cnt long")
    b = spark.createDataFrame([("x", 4), ("z", 1)], "k string, cnt long")
    both = spark.createDataFrame([("x", 7), ("y", 2), ("z", 1)],
                                 "k string, cnt long")
    merged = {(r["d"], r["bucket"]): r["s"] for r in
              (SK.cms_registers(a, "k", "cnt")
               .unionByName(SK.cms_registers(b, "k", "cnt"))
               .groupBy("d", "bucket").agg(F.sum("reg_cnt").alias("s"))
               .collect())}
    direct = {(r["d"], r["bucket"]): r["reg_cnt"]
              for r in SK.cms_registers(both, "k", "cnt").collect()}
    assert merged == direct


def test_cms_heavy_hitters_matches_exact_topk(spark, sf_dir):
    """On the fixture corpus the reported top-10 is the exact top-10 and
    every estimate respects the one-sided error bound."""
    import os
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    words = (docs.select(F.explode(F.split(F.trim("text"), r"\s+"))
                         .alias("word"))
             .where(F.length("word") > 0))
    got = SK.cms_heavy_hitters(words, "word", k=10).collect()
    assert len(got) == 10
    assert all(r["cms_est"] >= r["exact_cnt"] for r in got)
    top_exact = [r["word"] for r in
                 (words.groupBy("word").agg(F.count("*").alias("n"))
                  .orderBy(F.desc("n"), F.asc("word")).limit(10).collect())]
    assert [r["word"] for r in got] == top_exact


def test_cms_point_query_on_absent_key_is_zero(spark):
    """ADVICE r3: a key hashing into an empty (d, bucket) cell must get a
    0 vote for that depth (left join + coalesce), and a key absent from
    every cell must estimate 0 — not vanish or overestimate."""
    counts = spark.createDataFrame([("a", 5), ("b", 3)], "k string, cnt int")
    regs = SK.cms_registers(counts, "k", "cnt")
    # probe a large set of never-inserted keys: with 2 inserted keys and
    # a 4x256 grid most probes hit at least one empty cell per depth row
    probes = _keys(spark, 1000, 1100)
    est = {r["k"]: r["cms_est"]
           for r in SK.cms_estimates(regs, probes, "k").collect()}
    assert len(est) == 100          # nobody vanished
    assert min(est.values()) == 0   # absent keys CAN reach 0
    # and inserted keys still never underestimate
    own = {r["k"]: r["cms_est"] for r in SK.cms_estimates(
        regs, counts.select("k"), "k").collect()}
    assert own["a"] >= 5 and own["b"] >= 3
