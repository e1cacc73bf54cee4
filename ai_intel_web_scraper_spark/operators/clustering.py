"""Distributed Lloyd's k-means over embedding columns, integer-exact.

Why a crawl/training-data engine needs it: coarse quantizers (the IVF /
SemDeDup cluster structure in `operators/vectors.py`) are *trained* with
k-means in production systems (FAISS trains IVF codebooks this way); topic
balancing, curriculum strata, and cluster-local dedup all start from a
clustering pass. The reference has no clustering (its corpus never grows
past a few thousand records, `vectorstore/store.py` just indexes
everything); this extends the engine per the large-scale-pipeline mandate.

Exactness contract (what makes an *iterative float* algorithm fully
hash-checkable cross-engine, same device as `graph.pagerank`):
- Vectors are quantized ONCE to 64-bit integers: q[d] = floor(x[d] *
  2^20) + 2^24. floor of (double * power-of-two) is exact IEEE arithmetic
  — no round()-at-.5 engine divergence (the shipping_priority lesson) —
  and the +2^24 offset keeps every value positive so integer division
  below is floor division on both engines (Spark DIV truncates toward
  zero, DuckDB // floors; they agree only on non-negatives).
- Assignment = argmin of integer squared L2 distance, ties to the
  smaller centroid id. |q| <= 2^25, so a 32-dim squared distance is
  < 2^55: exact in a long under ANSI mode.
- Update = per-dimension integer mean: sum(q[d]) DIV count. Fixed
  iteration count; empty clusters keep their previous centroid.
So a fixed seed (first-k-by-id init) + fixed iterations produce
bit-identical (cluster, qdist) on any engine; the DuckDB oracle replays
the same recurrence as unrolled CTEs over exploded (vec_id, dim, value)
rows.

Scale shape (10^9-vector corpora):
- Each iteration is ONE shuffle: groupBy(cluster) with dim+1 native
  long-sum aggregates (map-side partials; element_at projections, never a
  posexplode — the shuffle carries k rows x (dim+1) longs per partition,
  not n*dim exploded rows).
- Only the k x dim integer codebook ever crosses the driver (the same
  constant-size contract as `vectors.codebook`).
- Assignment is a narrow map (argmin over literal centroids inside
  whole-stage codegen-adjacent higher-order functions, no UDF, no join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KM_K = 8
KM_ITERS = 4
KM_QSCALE = 1 << 20          # quantization unit = 2^-20 of embedding space
KM_QOFF = 1 << 24            # positivity offset (|x| < 16 assumed)
# Codebook training sample cap (the FAISS convention: train on a bounded
# sample — quality needs O(k) examples per centroid, not the corpus).
# The sample is the first KM_TRAIN_SAMPLE rows by id: deterministic,
# constant-size (4096 x dim longs ~ 2 MB), and a superset of every test
# corpus, so sample-trained codebooks are bit-identical to full-corpus
# ones at test scale (pytest-proven) while a 10^10-vector corpus trains
# in constant time.
KM_TRAIN_SAMPLE = 4096


def quantize_col(vec_col, qscale: int = KM_QSCALE, qoff: int = KM_QOFF):
    """array<long> of floor(x * qscale) + qoff per component. Exact and
    engine-agnostic: the cast widens float->double losslessly, the
    power-of-two multiply is exact, floor is unambiguous."""
    return F.transform(
        vec_col.cast("array<double>"),
        lambda x: F.floor(x * F.lit(float(qscale))).cast("long")
        + F.lit(qoff))


def _sqdist(qv, cent: list[int]):
    """Integer squared L2 distance between a quantized vector column and
    a literal centroid (native fold, no UDF)."""
    return F.aggregate(
        F.zip_with(qv, F.array(*[F.lit(c) for c in cent]),
                   lambda a, c: (a - c) * (a - c)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def _argmin_cols(qv, cents: list[list[int]]):
    """(cluster, qdist) for the nearest centroid; ties break toward the
    smaller centroid id via the struct min's (d, i) field order."""
    best = F.array_min(F.array(*[
        F.struct(_sqdist(qv, c).alias("d"), F.lit(i).alias("i"))
        for i, c in enumerate(cents)]))
    return best["i"].cast("int"), best["d"].cast("long")


# Above this many codebook cells (k x dim) the inlined literal argmin is
# no longer the right physical plan: expression-tree size grows O(k*dim)
# and falls out of whole-stage codegen at production coarse-k (10^3-10^5
# IVF lists). The Arrow path ships the codebook to executors once per
# batch and runs the identical integer argmin vectorized in numpy.
KM_ARGMIN_LITERAL_MAX_CELLS = 4096
_ARGMIN_BLOCK_K = 256        # centroid block size for the n x k workspace


def _argmin_blocked(X, C):
    """Vectorized integer argmin of X (n x dim) against codebook C
    (k x dim) — bit-identical to `_argmin_cols` (pytest-proven):
    d2 = |x|^2 + |c|^2 - 2 x.c in int64 (exact: dot terms < 2^56), ties
    to the smaller centroid id (numpy argmin first-occurrence within a
    block; strict < keeps the earlier block's winner across blocks).
    Blocked over centroids so the workspace stays n x 256, never n x k."""
    import numpy as np
    xx = (X * X).sum(axis=1)
    best_d = None
    best_i = None
    for off in range(0, len(C), _ARGMIN_BLOCK_K):
        Cb = C[off:off + _ARGMIN_BLOCK_K]
        d2 = (xx[:, None] + (Cb * Cb).sum(axis=1)[None, :]
              - 2 * (X @ Cb.T))
        i = d2.argmin(axis=1)
        d = d2[np.arange(len(i)), i]
        if best_d is None:
            best_d, best_i = d, i + off
        else:
            upd = d < best_d
            best_d = np.where(upd, d, best_d)
            best_i = np.where(upd, i + off, best_i)
    return best_i, best_d


def kmeans_assign_arrow(embeddings: DataFrame, cents: list[list[int]],
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """`kmeans_assign` via the blocked Arrow-batch argmin — same output,
    large-k-safe physical plan (one MapInPandas over (id, quantized
    vector); still a narrow map, no shuffle, codebook serialized once
    into the task closure)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    C = np.asarray(cents, dtype=np.int64)
    qdf = embeddings.select(F.col(id_col),
                            quantize_col(F.col(vec_col)).alias("_qv"))
    schema = T.StructType([qdf.schema[id_col],
                           T.StructField("cluster", T.IntegerType()),
                           T.StructField("qdist", T.LongType())])

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf["_qv"].tolist(), dtype=np.int64)
            best_i, best_d = _argmin_blocked(X, C)
            yield pd.DataFrame({id_col: pdf[id_col],
                                "cluster": best_i.astype("int32"),
                                "qdist": best_d})

    return qdf.mapInPandas(gen, schema)


def init_centroids(embeddings: DataFrame, k: int,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> list[list[int]]:
    """Deterministic seed codebook: the quantized vectors of the first k
    rows by id (the same data-sample convention as `vectors.codebook`)."""
    rows = (embeddings.orderBy(id_col).limit(k)
            .select(quantize_col(F.col(vec_col)).alias("qv")).collect())
    return [[int(x) for x in r["qv"]] for r in rows]


def kmeans_fit(embeddings: DataFrame, k: int = KM_K, iters: int = KM_ITERS,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> list[list[int]]:
    """`iters` Lloyd steps; returns the final integer codebook. Each step
    = one narrow argmin map + one k-group aggregate with dim+1 long sums;
    the k x dim codebook is the only thing collected."""
    cents = init_centroids(embeddings, k, id_col, vec_col)
    dim = len(cents[0])
    qdf = embeddings.select(quantize_col(F.col(vec_col)).alias("qv"))
    for _ in range(iters):
        cluster, _d = _argmin_cols(F.col("qv"), cents)
        sums = (qdf.withColumn("_cl", cluster)
                .groupBy("_cl")
                .agg(F.count("*").alias("_n"),
                     *[F.sum(F.element_at("qv", d + 1)).alias(f"_s{d}")
                       for d in range(dim)])
                .collect())
        nxt = list(cents)  # empty clusters keep their previous centroid
        for r in sums:
            nxt[r["_cl"]] = [int(r[f"_s{d}"]) // int(r["_n"])
                             for d in range(dim)]
        cents = nxt
    return cents


def kmeans_fit_many(embeddings: DataFrame,
                    slices: list[tuple[int, int]],
                    k: int | list[int] = KM_K,
                    iters: int = KM_ITERS, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> list[list[list[int]]]:
    """Train SEVERAL integer codebooks — one per (start_dim, sub_dim)
    slice, lengths may differ — in ONE Spark job per Lloyd iteration:
    the quantized vector explodes into (slice_idx, subvector) rows once
    and each iteration is a single groupBy(slice, cluster) aggregate.
    The arithmetic per slice is EXACTLY `kmeans_fit` on that slice
    (same seed rows, argmin ties, integer means, empty-cluster pinning)
    — only the job schedule changes, not one bit of output (tested).
    This is how the IVF-PQ query trains its coarse (full-dim) and four
    subspace codebooks in a single pass.

    `k` may be a per-slice list (e.g. coarse k != PQ subspace k); an int
    applies to every slice. Each slice's seed is the first k[s] rows by
    id, so a slice's output is independent of the other slices' ks.

    try_element_at pads the ragged per-dim sums with NULLs for short
    slices (ANSI-safe); each slice's update reads only its own dims."""
    ks = list(k) if isinstance(k, (list, tuple)) else [k] * len(slices)
    assert len(ks) == len(slices)
    qv = quantize_col(F.col(vec_col))
    subarr = F.array(*[F.slice(qv, lo + 1, n) for lo, n in slices])
    init = (embeddings.orderBy(id_col).limit(max(ks))
            .select(subarr.alias("_subs")).collect())
    books = [[[int(x) for x in r["_subs"][s]] for r in init[:ks[s]]]
             for s in range(len(slices))]
    exploded = embeddings.select(
        F.posexplode(subarr).alias("_s", "_qsub"))
    max_dim = max(n for _, n in slices)
    for _ in range(iters):
        # CASE-chain, not element_at(array(...)): CaseWhen codegen only
        # evaluates the matched branch, so each exploded row pays ONE
        # slice's argmin, not all of them
        cl = None
        for s in range(len(slices)):
            arg = F.array_min(F.array(*[
                F.struct(_sqdist(F.col("_qsub"), c).alias("d"),
                         F.lit(ci).alias("i"))
                for ci, c in enumerate(books[s])]))["i"]
            cond = F.col("_s") == F.lit(s)
            cl = F.when(cond, arg) if cl is None else cl.when(cond, arg)
        sums = (exploded
                .withColumn("_cl", cl)
                .groupBy("_s", "_cl")
                .agg(F.count("*").alias("_n"),
                     *[F.sum(F.try_element_at("_qsub", F.lit(d + 1)))
                       .alias(f"_x{d}") for d in range(max_dim)])
                .collect())
        nxt = [[list(c) for c in book] for book in books]
        for r in sums:
            n_dims = slices[r["_s"]][1]
            nxt[r["_s"]][r["_cl"]] = [int(r[f"_x{d}"]) // int(r["_n"])
                                      for d in range(n_dims)]
        books = nxt
    return books


def _collect_sample(embeddings: DataFrame, sample_n: int, id_col: str,
                    vec_col: str):
    """The quantized training sample as an int64 numpy matrix: first
    `sample_n` rows by id (TakeOrderedAndProject — a distributed top-n,
    never a full sort) — the ONLY corpus-size-independent collect in the
    training path."""
    import numpy as np
    rows = (embeddings.orderBy(id_col).limit(sample_n)
            .select(quantize_col(F.col(vec_col)).alias("qv")).collect())
    return np.array([r["qv"] for r in rows], dtype=np.int64)


def _lloyd_local(X, k: int, iters: int):
    """The SAME integer Lloyd recurrence as `kmeans_fit`, run on a local
    int64 matrix: argmin of integer squared L2 (ties to the smaller
    centroid id = numpy argmin's first-occurrence rule), per-dimension
    integer-mean update (floor division — all values positive by the
    KM_QOFF offset, so numpy `//`, Spark DIV and DuckDB `//` agree),
    empty clusters keep their previous centroid. Exact: |q| < 2^25 keeps
    distances < 2^56 and member sums < 2^37, both inside int64."""
    import numpy as np
    cents = X[:k].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cl = d2.argmin(axis=1)
        for c in range(k):
            members = X[cl == c]
            if len(members):
                cents[c] = members.sum(axis=0) // len(members)
    return [[int(v) for v in cent] for cent in cents]


def kmeans_fit_sampled(embeddings: DataFrame, k: int = KM_K,
                       iters: int = KM_ITERS,
                       sample_n: int = KM_TRAIN_SAMPLE,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> list[list[int]]:
    """`kmeans_fit` semantics on the first-`sample_n`-by-id training
    sample, computed locally: one distributed top-n collect, then the
    Lloyd recurrence on the driver — ZERO Spark jobs per iteration
    (kmeans_fit pays one aggregate job per iteration, which at toy k
    dominates wall time and at 10^10 vectors scans the corpus per
    iteration for no quality gain). Bit-identical to
    `kmeans_fit(embeddings)` whenever the corpus has <= sample_n rows
    (pytest-proven), which is the production train-once contract."""
    X = _collect_sample(embeddings, sample_n, id_col, vec_col)
    return _lloyd_local(X, k, iters)


def kmeans_fit_many_sampled(embeddings: DataFrame,
                            slices: list[tuple[int, int]],
                            k: int | list[int] = KM_K,
                            iters: int = KM_ITERS,
                            sample_n: int = KM_TRAIN_SAMPLE,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding"
                            ) -> list[list[list[int]]]:
    """`kmeans_fit_many` semantics (one codebook per slice, per-slice k)
    on the capped training sample: ONE collect, then every slice's Lloyd
    recurrence runs locally on its column range. Bit-identical to the
    distributed trainer on <= sample_n corpora (pytest-proven)."""
    ks = list(k) if isinstance(k, (list, tuple)) else [k] * len(slices)
    assert len(ks) == len(slices)
    X = _collect_sample(embeddings, sample_n, id_col, vec_col)
    return [_lloyd_local(X[:, lo:lo + n], ks[s], iters)
            for s, (lo, n) in enumerate(slices)]


def dequantize(cents: list[list[int]],
               qscale: int = KM_QSCALE,
               qoff: int = KM_QOFF) -> list[list[float]]:
    """Integer codebook -> float centroids: (q - qoff) / qscale. Every
    value is a dyadic rational (power-of-two divisor), so the doubles are
    exact and any engine recomputing the same expression agrees bitwise —
    which is what lets a kmeans-trained codebook feed the float-cosine
    IVF path (`vectors.ivf_topk`) while staying oracle-checkable."""
    return [[(c - qoff) / qscale for c in cent] for cent in cents]


def kmeans_assign(embeddings: DataFrame, cents: list[list[int]],
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """(id, cluster, qdist) against a fixed integer codebook — the
    narrow-map scoring pass (no shuffle). Auto-selects the physical
    strategy by codebook size: inlined literal argmin (whole-stage
    codegen, no UDF) under KM_ARGMIN_LITERAL_MAX_CELLS cells, the
    blocked Arrow argmin above it (identical output, pytest-proven)."""
    if len(cents) * len(cents[0]) > KM_ARGMIN_LITERAL_MAX_CELLS:
        return kmeans_assign_arrow(embeddings, cents, id_col, vec_col)
    qv = quantize_col(F.col(vec_col))
    cluster, qdist = _argmin_cols(qv, cents)
    return embeddings.select(F.col(id_col), cluster.alias("cluster"),
                             qdist.alias("qdist"))


def kmeans(embeddings: DataFrame, k: int = KM_K, iters: int = KM_ITERS,
           id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Fit + final assignment: (id, cluster, qdist), every value an exact
    integer — the cross-engine hash never touches a float. r4: the fit is
    the sample-local trainer (train once on a bounded sample, assign the
    whole corpus with a narrow map — the production split)."""
    cents = kmeans_fit_sampled(embeddings, k, iters, id_col=id_col,
                               vec_col=vec_col)
    return kmeans_assign(embeddings, cents, id_col, vec_col)
