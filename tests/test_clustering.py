"""Distributed integer-exact Lloyd's k-means (operators/clustering.py).

The exactness contract is the whole point: the Spark recurrence must equal
an independent pure-Python replay bit-for-bit, survive repartitioning (the
integer means make summation-order irrelevant), and keep empty clusters
pinned to their previous centroid.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ai_intel_web_scraper_spark.operators import clustering as KM


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _py_kmeans(rows, k, iters):
    """Independent replay of the quantized recurrence in plain Python
    (arbitrary-precision ints — overflow in the engine would show up as a
    mismatch here)."""
    ids = [r[0] for r in rows]
    import math
    q = [[math.floor(float(x) * KM.KM_QSCALE) + KM.KM_QOFF for x in r[1]]
         for r in rows]

    def nearest(v, cents):
        return min((sum((a - c) ** 2 for a, c in zip(v, ce)), i)
                   for i, ce in enumerate(cents))

    order = sorted(range(len(ids)), key=lambda j: ids[j])
    cents = [list(q[j]) for j in order[:k]]
    for _ in range(iters):
        asg = [nearest(v, cents)[1] for v in q]
        nxt = [list(c) for c in cents]
        for ci in range(k):
            mem = [q[j] for j in range(len(q)) if asg[j] == ci]
            if mem:
                nxt[ci] = [sum(m[d] for m in mem) // len(mem)
                           for d in range(len(q[0]))]
        cents = nxt
    return {ids[j]: nearest(q[j], cents) for j in range(len(q))}


def test_kmeans_matches_python_replay(emb):
    got = {r["vec_id"]: (r["qdist"], r["cluster"])
           for r in KM.kmeans(emb).collect()}
    rows = [(r["vec_id"], r["embedding"])
            for r in emb.select("vec_id", "embedding").collect()]
    want = _py_kmeans(rows, KM.KM_K, KM.KM_ITERS)
    assert got == want
    assert len({c for _, c in got.values()}) > 1  # actually clusters


def test_kmeans_partition_invariant(emb):
    a = sorted(map(tuple, KM.kmeans(emb).collect()))
    b = sorted(map(tuple, KM.kmeans(emb.repartition(13)).collect()))
    assert a == b


def test_empty_cluster_keeps_previous_centroid(spark):
    # 4 identical points but k=3: clusters 1 and 2 go empty after the
    # first assignment (everything lands on centroid 0) and must keep
    # their seed centroids rather than crash or emit nulls.
    df = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(4)], "vec_id long, v array<float>")
    cents = KM.kmeans_fit(df, k=3, iters=2, vec_col="v")
    seed = KM.init_centroids(df, 3, vec_col="v")
    assert cents[1] == seed[1] and cents[2] == seed[2]
    out = KM.kmeans(df, k=3, iters=2, vec_col="v").collect()
    assert all(r["cluster"] == 0 and r["qdist"] == 0 for r in out)


def test_dequantize_is_exact_dyadic():
    cents = [[KM.KM_QOFF + KM.KM_QSCALE // 2, KM.KM_QOFF - 3 * KM.KM_QSCALE]]
    assert KM.dequantize(cents) == [[0.5, -3.0]]


def test_trained_ivf_scores_match_brute_force(emb):
    """IVF over a kmeans-trained codebook: every returned (id, score) must
    appear in the brute-force ranking with the identical rounded score
    (the probe only prunes candidates, never rescores them)."""
    from ai_intel_web_scraper_spark.operators import vectors as V
    q = [float((i * 37 % 19) - 9) / 10.0 for i in range(64)]
    cents = KM.dequantize(KM.kmeans_fit(emb))
    assert len(cents) == KM.KM_K
    got = {r["vec_id"]: r["score"]
           for r in V.ivf_topk(emb, q, 10, cents=cents).collect()}
    brute = {r["vec_id"]: r["score"]
             for r in V.brute_force_topk(emb, q, 500).collect()}
    assert got and all(brute[i] == s for i, s in got.items())


def test_quantize_col_is_floor_exact(spark):
    df = spark.createDataFrame([(0, [0.5, -0.5, 0.0])],
                               "vec_id long, v array<float>")
    [r] = df.select(KM.quantize_col(F.col("v")).alias("q")).collect()
    half = KM.KM_QSCALE // 2
    assert list(r["q"]) == [half + KM.KM_QOFF,
                            -half + KM.KM_QOFF,
                            KM.KM_QOFF]


def test_fit_many_bit_identical_to_single_fits(emb):
    """The one-job-per-iteration multi-slice trainer must equal the
    sequential trainers bit-for-bit: full-dim slice == kmeans_fit, and
    the ragged (full + subspace) combination changes nothing."""
    many = KM.kmeans_fit_many(emb, [(0, 64), (0, 16), (48, 16)])
    assert many[0] == KM.kmeans_fit(emb)
    from pyspark.sql import functions as F
    sub0 = emb.select("vec_id",
                      F.slice(F.col("embedding"), 1, 16).alias("s"))
    sub3 = emb.select("vec_id",
                      F.slice(F.col("embedding"), 49, 16).alias("s"))
    assert many[1] == KM.kmeans_fit(sub0, vec_col="s")
    assert many[2] == KM.kmeans_fit(sub3, vec_col="s")


def test_sampled_fit_bit_identical_to_distributed_fit(emb):
    """r4 train-on-sample path: with sample_n >= corpus size the local
    numpy trainer must reproduce the distributed trainer bit-for-bit
    (same seed, argmin ties, integer means, empty-cluster pinning)."""
    assert KM.kmeans_fit_sampled(emb) == KM.kmeans_fit(emb)


def test_sampled_fit_equals_distributed_fit_on_the_sample(emb):
    """With sample_n < corpus size the contract is: train exactly as
    kmeans_fit would on the first-sample_n-by-id subset."""
    n = 64
    sub = emb.orderBy("vec_id").limit(n)
    got = KM.kmeans_fit_sampled(emb, sample_n=n)
    assert got == KM.kmeans_fit(sub)


def test_sampled_fit_many_bit_identical_to_distributed(emb):
    """The multi-slice local trainer (IVF-PQ's coarse + subspace pass,
    per-slice ks) matches the distributed batched trainer."""
    slices = [(0, 64), (0, 16), (16, 16), (32, 16), (48, 16)]
    ks = [KM.KM_K, 4, 4, 4, 4]
    assert (KM.kmeans_fit_many_sampled(emb, slices, k=ks)
            == KM.kmeans_fit_many(emb, slices, k=ks))


def test_arrow_argmin_bit_identical_to_literal(emb):
    """The large-k Arrow argmin fallback must equal the inlined literal
    argmin on every row — including exact ties (duplicated centroids),
    which both paths must break toward the smaller centroid id."""
    cents = KM.kmeans_fit_sampled(emb, k=6)
    cents = cents + [list(cents[0]), list(cents[3])]  # planted ties
    lit = {r["vec_id"]: (r["cluster"], r["qdist"])
           for r in KM.kmeans_assign(emb, cents).collect()}
    arw = {r["vec_id"]: (r["cluster"], r["qdist"])
           for r in KM.kmeans_assign_arrow(emb, cents).collect()}
    assert lit == arw and len(lit) > 0
    # ties really happened and resolved to the smaller ids
    assert not any(cl in (6, 7) for cl, _ in arw.values())


def test_assign_auto_selects_arrow_above_cell_threshold(emb):
    """kmeans_assign flips to the Arrow-batch MapInPandas path
    above KM_ARGMIN_LITERAL_MAX_CELLS and stays codegen below it; output is
    identical either way (blocked argmin crosses >1 centroid block)."""
    base = KM.kmeans_fit_sampled(emb, k=8)
    big = [[c + i for c in base[i % 8]]
           for i in range(KM.KM_ARGMIN_LITERAL_MAX_CELLS // 64 + 300)]
    assert len(big) > KM._ARGMIN_BLOCK_K  # exercises cross-block minima
    auto = KM.kmeans_assign(emb, big)
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    small = KM.kmeans_assign(emb, base)
    plan_s = small._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan_s and "EvalPython" not in plan_s
    qv = KM.quantize_col(F.col("embedding"))
    cl, qd = KM._argmin_cols(qv, big)
    lit = {r["vec_id"]: (r["cluster"], r["qdist"]) for r in emb.select(
        F.col("vec_id"), cl.alias("cluster"), qd.alias("qdist")).collect()}
    got = {r["vec_id"]: (r["cluster"], r["qdist"]) for r in auto.collect()}
    assert got == lit


def test_ivf_partitioned_index_prunes_and_matches(emb, tmp_path):
    """write_ivf_index + ivf_topk_pruned: the probe scans ONLY the
    probed cluster partitions (PartitionFilters carries the cluster
    predicate; partition count = n_probe) and returns exactly the
    scores of the assignment-on-the-fly IVF path."""
    from ai_intel_web_scraper_spark.operators import vectors as V
    spark = emb.sparkSession
    cents = KM.dequantize(KM.kmeans_fit_sampled(emb))
    path = str(tmp_path / "ivf_idx")
    V.write_ivf_index(emb, path, cents)
    q = [0.15 * ((i * 7) % 5 - 2) for i in range(64)]
    pruned = V.ivf_topk_pruned(spark, path, q, 25, cents)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cluster" in m.group(1), plan
    base = V.ivf_topk(emb, q, 25, cents=cents)
    def key(df):
        return [(r["vec_id"], round(r["score"], 9))
                for r in df.collect()]
    assert key(pruned) == key(base)
