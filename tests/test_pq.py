"""Product quantization + ADC top-k (operators/pq.py).

The chain must be integer-exact end to end: per-subspace codebooks equal
an independent pure-Python Lloyd replay, codes are the argmin of the
replayed codebooks, the ADC score of any row equals the sum of its
subspace table entries, and a planted exact copy of the query is an ADC
top-1 (its per-subspace codes each minimize the distance table)."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from ai_intel_web_scraper_spark.operators import clustering as KM
from ai_intel_web_scraper_spark.operators import pq as PQ


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _quant(vec):
    return [math.floor(float(x) * KM.KM_QSCALE) + KM.KM_QOFF for x in vec]


def _py_subspace_kmeans(rows, s, k, iters):
    """Pure-Python Lloyd replay over the s-th 16-dim slice (arbitrary
    precision ints — engine overflow would surface as a mismatch)."""
    lo, hi = s * PQ.PQ_SUBDIM, (s + 1) * PQ.PQ_SUBDIM
    ids = sorted(range(len(rows)), key=lambda j: rows[j][0])
    q = [_quant(r[1])[lo:hi] for r in rows]

    def nearest(v, cents):
        return min((sum((a - c) ** 2 for a, c in zip(v, ce)), i)
                   for i, ce in enumerate(cents))

    cents = [list(q[j]) for j in ids[:k]]
    for _ in range(iters):
        asg = [nearest(v, cents)[1] for v in q]
        nxt = [list(c) for c in cents]
        for ci in range(k):
            mem = [q[j] for j in range(len(q)) if asg[j] == ci]
            if mem:
                nxt[ci] = [sum(m[d] for m in mem) // len(mem)
                           for d in range(len(mem[0]))]
        cents = nxt
    return cents, {rows[j][0]: nearest(q[j], cents)[1]
                   for j in range(len(q))}


def test_pq_chain_matches_python_replay(emb):
    rows = [(r["vec_id"], r["embedding"])
            for r in emb.select("vec_id", "embedding").collect()]
    books = PQ.pq_train(emb)
    q = [float((i * 29 % 17) - 8) / 8.0 for i in range(64)]
    want_adc = {}
    py_codes = {}
    for s in range(PQ.PQ_M):
        cents, codes = _py_subspace_kmeans(rows, s, PQ.PQ_K, KM.KM_ITERS)
        assert books[s] == cents
        py_codes[s] = codes
    dt = PQ.adc_table(q, books)
    qq = _quant(q)
    assert dt == [[sum((a - c) ** 2 for a, c in zip(
        qq[s * 16:(s + 1) * 16], cent)) for cent in books[s]]
        for s in range(PQ.PQ_M)]
    for vid, _ in rows:
        want_adc[vid] = sum(dt[s][py_codes[s][vid]] for s in range(PQ.PQ_M))
    got_codes = PQ.pq_encode(emb, books).collect()
    assert {(r["vec_id"], s): r[f"code_{s}"]
            for r in got_codes for s in range(PQ.PQ_M)} == \
        {(vid, s): py_codes[s][vid] for vid, _ in rows
         for s in range(PQ.PQ_M)}
    got = [(r["vec_id"], r["adc"])
           for r in PQ.pq_topk(emb, q, 10).collect()]
    want = sorted(want_adc.items(), key=lambda t: (t[1], t[0]))[:10]
    assert got == want


def test_planted_query_copy_is_adc_top1(spark, emb):
    q = [float((i * 13 % 23) - 11) / 11.0 for i in range(64)]
    planted = spark.createDataFrame([(-1, q)],
                                    "vec_id long, embedding array<double>")
    both = (emb.select("vec_id", F.col("embedding").cast("array<double>")
                       .alias("embedding")).unionByName(planted))
    top = PQ.pq_topk(both, q, 1).collect()
    books = PQ.pq_train(both)
    dt = PQ.adc_table(q, books)
    assert top[0]["vec_id"] == -1
    assert top[0]["adc"] == sum(min(row) for row in dt)


def test_ivf_pq_is_pq_restricted_to_probed_lists(emb):
    """IVF-PQ must equal plain PQ-ADC filtered to the probed coarse
    lists: same codes, same ADC values, just candidate pruning — the
    invariant that makes the probe a pure partition-pruning step."""
    q = [float((i * 31 % 13) - 6) / 6.0 for i in range(64)]
    coarse = KM.kmeans_fit(emb)
    qq = _quant(q)
    probe = sorted(range(len(coarse)), key=lambda i: (
        sum((a - c) ** 2 for a, c in zip(qq, coarse[i])), i))[:PQ.IVFPQ_PROBE]
    probed_ids = {r["vec_id"]
                  for r in KM.kmeans_assign(emb, coarse).collect()
                  if r["cluster"] in probe}
    books = PQ.pq_train(emb)
    full = PQ.pq_adc_topk(PQ.pq_encode(emb, books), q, books,
                          10 ** 9).collect()
    want = [(r["vec_id"], r["adc"]) for r in full
            if r["vec_id"] in probed_ids][:25]
    got = [(r["vec_id"], r["adc"])
           for r in PQ.ivf_pq_topk(emb, q, 25).collect()]
    assert got == want and 0 < len(probed_ids) < len(full)


def test_ivf_pq_non_default_ks(emb):
    """Non-default coarse_k/pq_k (ADVICE r5: these previously had zero
    coverage — the DuckDB oracle replays only the module constants).
    Same restriction invariant as above, but with a 4-centroid coarse
    quantizer and 4-centroid subspace codebooks built independently."""
    q = [float((i * 7 % 19) - 9) / 9.0 for i in range(64)]
    ck, pk = 4, 4
    coarse = KM.kmeans_fit(emb, k=ck)
    assert len(coarse) == ck
    qq = _quant(q)
    probe = sorted(range(len(coarse)), key=lambda i: (
        sum((a - c) ** 2 for a, c in zip(qq, coarse[i])), i))[:PQ.IVFPQ_PROBE]
    probed_ids = {r["vec_id"]
                  for r in KM.kmeans_assign(emb, coarse).collect()
                  if r["cluster"] in probe}
    books = PQ.pq_train(emb, k=pk)
    assert all(len(b) == pk for b in books)
    full = PQ.pq_adc_topk(PQ.pq_encode(emb, books), q, books,
                          10 ** 9).collect()
    want = [(r["vec_id"], r["adc"]) for r in full
            if r["vec_id"] in probed_ids][:25]
    got = [(r["vec_id"], r["adc"])
           for r in PQ.ivf_pq_topk(emb, q, 25, coarse_k=ck,
                                   pq_k=pk).collect()]
    assert got == want and 0 < len(probed_ids) < len(full)


def test_pq_partition_invariant(emb):
    q = [0.1] * 64
    a = PQ.pq_topk(emb, q, 25).collect()
    b = PQ.pq_topk(emb.repartition(13), q, 25).collect()
    assert list(map(tuple, a)) == list(map(tuple, b))
