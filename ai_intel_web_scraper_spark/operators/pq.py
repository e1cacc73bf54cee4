"""Product quantization (PQ) + asymmetric-distance (ADC) top-k.

Why the engine needs it: at 10^9-10^10 vectors the raw float corpus
(256 B/vector at dim 64) cannot sit in executor memory next to the data
it indexes; PQ (Jégou et al. 2011, the FAISS IVF-PQ building block)
compresses each vector to M subspace codes (here 4 codes x 8 centroids =
4 bytes, a 64x shrink) and answers queries against the codes alone via a
precomputed query-to-centroid distance table. The reference has no
vector compression at all (`vectorstore/store.py` hands full embeddings
to ChromaDB); this extends the ANN family (brute force / multi-probe
LSH / IVF / trained IVF) with the shape production systems actually run
at scale.

Exactness contract (same device as `operators/clustering.py`, which
trains the per-subspace codebooks): vectors are floor-quantized once to
64-bit integers, every subspace codebook is an integer k-means product,
codes are integer-argmin assignments, and the ADC score is a sum of M
integer table lookups — no float is ever computed, so the full
(vec_id, adc) output hash-checks against a DuckDB replay of the whole
chain (M unrolled Lloyd recurrences + assignment + an independently
recomputed distance table).

Scale shape:
- Training: M independent k-means fits (each = KM_ITERS one-shuffle
  aggregations); in production these run concurrently and on a sample —
  codebook quality needs O(k) examples per centroid, not the corpus.
- Encoding: ONE narrow map (M native integer argmins over sliced
  arrays), no shuffle, no UDF; emits M small-int codes per vector.
- Query: the M x k distance table is computed driver-side from the
  quantized query (constant work), inlined as literal arrays, and the
  score is M element_at lookups + a sum — a narrow map feeding
  TakeOrderedAndProject. The float corpus is never touched at query
  time, which is the entire point of PQ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clustering import KM_ITERS, quantize_col

PQ_M = 4          # subspaces (dim 64 -> 4 x 16)
PQ_K = 8          # centroids per subspace -> 3-bit codes, 64x compression
PQ_SUBDIM = 16


def _sub_col(vec_col, s: int, sub_dim: int = PQ_SUBDIM):
    """The s-th subvector slice (1-based F.slice)."""
    return F.slice(vec_col, s * sub_dim + 1, sub_dim)


def pq_train(embeddings: DataFrame, m: int = PQ_M, k: int = PQ_K,
             sub_dim: int = PQ_SUBDIM, iters: int = KM_ITERS,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> list[list[list[int]]]:
    """Per-subspace integer k-means codebooks, all m subspaces trained in
    ONE Spark job per Lloyd iteration: the quantized vector explodes into
    (s, subvector) rows once, each iteration is a single
    groupBy(s, cluster) aggregate of m·k rows × (sub_dim+1) long sums,
    and only the m × k × sub_dim codebook crosses the driver. The
    arithmetic is EXACTLY `clustering.kmeans_fit` run per slice (seeded
    from the first k rows by id; integer argmin, integer means, empty
    clusters pinned) — the batched schedule changes job count, not one
    bit of output (pytest replays per-subspace in pure Python). The
    batched schedule lives in `clustering.kmeans_fit_many` (shared with
    the IVF-PQ coarse+subspace single-pass training).

    r4: training runs on the first-KM_TRAIN_SAMPLE-by-id sample via the
    LOCAL recurrence (`kmeans_fit_many_sampled` — one bounded collect,
    zero Spark jobs per iteration; bit-identical to the distributed
    trainer on <= 4096-row corpora, pytest-proven). The distributed
    `kmeans_fit_many` path stays as the parity reference."""
    from .clustering import kmeans_fit_many_sampled
    return kmeans_fit_many_sampled(
        embeddings, [(s * sub_dim, sub_dim) for s in range(m)],
        k=k, iters=iters, id_col=id_col, vec_col=vec_col)


def _code_col(qsub, book: list[list[int]]):
    """Integer argmin code for one subspace (ties to the smaller centroid
    id via the struct min's field order) — the same native shape as
    `clustering._argmin_cols`, inlined here over the quantized slice."""
    from .clustering import _sqdist
    return F.array_min(F.array(*[
        F.struct(_sqdist(qsub, c).alias("d"), F.lit(ci).alias("i"))
        for ci, c in enumerate(book)]))["i"].cast("int")


def pq_encode(embeddings: DataFrame, books: list[list[list[int]]],
              sub_dim: int = PQ_SUBDIM, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, code_0..code_{m-1}): one narrow map, M native integer argmins
    — the corpus-compression pass. No shuffle, no UDF."""
    qv = quantize_col(F.col(vec_col))
    return embeddings.select(
        F.col(id_col),
        *[_code_col(F.slice(qv, s * sub_dim + 1, sub_dim), book)
          .alias(f"code_{s}")
          for s, book in enumerate(books)])


def adc_table(query: list[float], books: list[list[list[int]]]) -> \
        list[list[int]]:
    """dt[s][c] = integer squared distance from the floor-quantized query
    subvector to centroid c of subspace s — exact Python ints, constant
    size (M x k), computed once per query on the driver."""
    import math

    from .clustering import KM_QOFF, KM_QSCALE
    qq = [math.floor(float(x) * KM_QSCALE) + KM_QOFF for x in query]
    sub = len(qq) // len(books)
    return [[sum((a - c) ** 2
                 for a, c in zip(qq[s * sub:(s + 1) * sub], cent))
             for cent in book]
            for s, book in enumerate(books)]


def pq_adc_topk(encoded: DataFrame, query: list[float],
                books: list[list[list[int]]], k: int,
                id_col: str = "vec_id") -> DataFrame:
    """Top-k by ADC distance over the CODES ONLY: score = sum over
    subspaces of a literal-array lookup dt[s][code_s]. Narrow map +
    TakeOrderedAndProject; the float corpus is never read."""
    dt = adc_table(query, books)
    adc = None
    for s, row in enumerate(dt):
        term = F.element_at(F.array(*[F.lit(int(d)) for d in row]),
                            F.col(f"code_{s}") + 1)
        adc = term if adc is None else adc + term
    return (encoded.select(F.col(id_col), adc.cast("long").alias("adc"))
            .orderBy(F.asc("adc"), F.asc(id_col)).limit(k))


def pq_topk(embeddings: DataFrame, query: list[float], k: int,
            m: int = PQ_M, n_centroids: int = PQ_K,
            sub_dim: int = PQ_SUBDIM, id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """Train -> encode -> ADC top-k, end to end. Every emitted value is
    an exact 64-bit integer."""
    books = pq_train(embeddings, m, n_centroids, sub_dim,
                     id_col=id_col, vec_col=vec_col)
    codes = pq_encode(embeddings, books, sub_dim, id_col, vec_col)
    return pq_adc_topk(codes, query, books, k, id_col)


IVFPQ_PROBE = 2


def ivf_pq_topk(embeddings: DataFrame, query: list[float], k: int,
                n_probe: int = IVFPQ_PROBE, m: int = PQ_M,
                sub_dim: int = PQ_SUBDIM, coarse_k: int | None = None,
                pq_k: int = PQ_K, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """The full production ANN shape — IVF-PQ (FAISS IndexIVFPQ,
    by_residual=False variant): a k-means-trained coarse quantizer
    partitions the corpus into inverted lists, the query probes only the
    n_probe nearest lists, and ranking inside them reads the PQ CODES
    ALONE via the ADC table. At 10^10 vectors the coarse cluster id is
    the table partition key, so the probe is partition pruning, and each
    probed partition scans 4-byte codes, not 256-byte floats.

    Integer-exact end to end: coarse assignment/probe use integer squared
    distances on the floor-quantized vectors (ties to the smaller
    centroid id), so the emitted (vec_id, adc) is fully hash-checkable.
    """
    import math

    from .clustering import (KM_K, KM_QOFF, KM_QSCALE, _argmin_cols,
                             kmeans_fit_many_sampled, quantize_col)
    # the coarse (full-dim) codebook and the M subspace codebooks all
    # train in ONE bounded sample collect + local recurrences (r4: the
    # train-on-a-sample FAISS convention; bit-identical to the
    # distributed one-job-per-iteration trainer at <= 4096 rows).
    # ks are EXPLICIT per slice (coarse defaults to KM_K, subspaces to
    # PQ_K) so the oracle's coarse-KM_K/subspace-PQ_K replay stays in
    # sync even if the module constants diverge.
    dim = m * sub_dim
    all_books = kmeans_fit_many_sampled(
        embeddings, [(0, dim)] + [(s * sub_dim, sub_dim)
                                  for s in range(m)],
        k=[KM_K if coarse_k is None else coarse_k] + [pq_k] * m,
        id_col=id_col, vec_col=vec_col)
    coarse, books = all_books[0], all_books[1:]
    qq = [math.floor(float(x) * KM_QSCALE) + KM_QOFF for x in query]
    probe = [i for _, i in sorted(
        (sum((a - c) ** 2 for a, c in zip(qq, cent)), i)
        for i, cent in enumerate(coarse))[:n_probe]]
    cluster, _d = _argmin_cols(quantize_col(F.col(vec_col)), coarse)
    cand = (embeddings.withColumn("_cl", cluster)
            .where(F.col("_cl").isin(probe)))
    codes = pq_encode(cand, books, sub_dim, id_col, vec_col)
    return pq_adc_topk(codes, query, books, k, id_col)
