"""Vector / similarity-search operators over array<float> embedding columns.

Brute-force cosine top-k is the exactness baseline (native higher-order
functions, no UDF); the LSH-bucketed variant is the 100 TB scale path: random
hyperplane signatures shrink the candidate set so the expensive exact score
runs on a small fraction of rows. Embedding *generation* (reference
vectorstore/embedder.py:41-123 calls OpenAI) is replaced by a deterministic
hash-projection embedder — a clearly-marked stand-in with the same Spark
plumbing (Arrow-batched mapInPandas, fixed dim, L2-normalized output).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .ranking import cosine_col, dot_col, norm_col, topk_by_score

EMBED_DIM = 32
_HYPERPLANE_SEED = 1234
N_HYPERPLANES = 10  # 1024 buckets; multi-probe at 2 bits scans ~5% of data
N_TABLES = 8        # near-dup banding: 8 tables x 4 hyperplanes
BITS_PER_TABLE = 4  # P(candidate | cos=0.9) = 1-(1-p^4)^8 ~ 0.9998


def brute_force_topk(embeddings: DataFrame, query: list[float], k: int,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k (SURVEY S10/R4): scan + TakeOrderedAndProject."""
    return topk_by_score(embeddings, cosine_col(vec_col, query), k, id_col)


def _hyperplanes(dim: int, n: int = N_HYPERPLANES) -> np.ndarray:
    rng = np.random.default_rng(_HYPERPLANE_SEED)
    return rng.standard_normal((n, dim))


def lsh_bucket_udf(dim: int):
    @F.pandas_udf(T.IntegerType())
    def bucket(vec: pd.Series) -> pd.Series:
        H = _hyperplanes(dim)
        M = np.stack([np.asarray(v, dtype=np.float64) for v in vec])
        signs = (M @ H.T) > 0
        vals = (signs * (1 << np.arange(N_HYPERPLANES))).sum(axis=1)
        return pd.Series(vals.astype(np.int32))
    return bucket


def query_probes(query: list[float], n_probe_bits: int = 2) -> list[int]:
    """Multi-probe bucket set for a query vector: its own hyperplane
    signature plus every signature within n_probe_bits hamming bits.
    Deterministic (seeded hyperplanes) — shared by lsh_topk and the DuckDB
    oracle SQL generator."""
    import itertools
    H = _hyperplanes(len(query))
    qsig = int((((H @ np.asarray(query)) > 0)
                * (1 << np.arange(N_HYPERPLANES))).sum())
    probes = {qsig}
    for r in range(1, min(n_probe_bits, N_HYPERPLANES) + 1):
        for bits in itertools.combinations(range(N_HYPERPLANES), r):
            flip = 0
            for b in bits:
                flip ^= 1 << b
            probes.add(qsig ^ flip)
    return sorted(probes)


def lsh_topk(embeddings: DataFrame, query: list[float], k: int,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_probe_bits: int = 2) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane LSH bucket pruning.
    Probes the query's bucket plus all buckets within `n_probe_bits`
    hamming bits (multi-probe), then exact-scores only those rows.
    At scale the bucket column is a partition/cluster key, so the probe is
    partition pruning, not a full scan."""
    dim = len(query)
    probes = query_probes(query, n_probe_bits)
    bucketed = embeddings.withColumn("_bkt", lsh_bucket_udf(dim)(F.col(vec_col)))
    cand = bucketed.where(F.col("_bkt").isin([int(p) for p in probes]))
    return topk_by_score(cand, cosine_col(vec_col, query), k, id_col)


IVF_CENTROIDS = 8
IVF_PROBE = 2


def codebook(embeddings: DataFrame, n_centroids: int,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> list[list[float]]:
    """Deterministic coarse codebook: the first n_centroids rows by id
    (a data-sample stand-in for a trained k-means codebook — only this
    constant-size list ever crosses the driver)."""
    rows = (embeddings.orderBy(id_col).limit(n_centroids)
            .select(vec_col).collect())
    return [[float(x) for x in r[vec_col]] for r in rows]


def assignment_cols(cents: list[list[float]], vec_col: str,
                    norm=None):
    """(cluster, centroid_sim) expressions for a coarse-quantizer argmax:
    native array-of-structs max over per-centroid cosines. Scores are
    rounded to 9 dp before the argmax so the assignment is stable across
    engines/summation orders; ties break toward the smaller centroid id
    (the struct max compares s first, then -i).

    `norm` optionally supplies the row's precomputed L2 norm COLUMN so
    the norm fold is evaluated once per row instead of once per centroid
    — the arithmetic (dot / (norm * |c|), same fold, same multiplication
    order) is unchanged, so the doubles are bit-identical either way.

    Large-k contract: this literal expression is O(k*dim) tree size and
    is kept for small codebooks only (IVF_CENTROIDS-scale). Production
    coarse-k (10^3-10^5 lists) assigns in the INTEGER domain instead —
    `clustering.kmeans_assign`, which auto-selects a blocked Arrow
    argmin above 4096 codebook cells (FAISS likewise does coarse
    assignment in the compressed/quantized domain). A float-cosine numpy
    fallback is deliberately NOT offered: numpy's pairwise summation
    cannot reproduce this fold's left-to-right order bit-for-bit."""
    import math

    def cos(c):
        if norm is None:
            return cosine_col(vec_col, c)
        qn = math.sqrt(sum(x * x for x in c)) or 1.0
        return dot_col(vec_col, c) / (norm * F.lit(qn))

    arr = F.array(*[
        F.struct(F.round(cos(c), 9).alias("s"), F.lit(-i).alias("ni"))
        for i, c in enumerate(cents)])
    best = F.array_max(arr)
    return (-best["ni"]).cast("int"), best["s"]


def ivf_topk(embeddings: DataFrame, query: list[float], k: int,
             n_centroids: int = IVF_CENTROIDS, n_probe: int = IVF_PROBE,
             id_col: str = "vec_id", vec_col: str = "embedding",
             cents: list[list[float]] | None = None) -> DataFrame:
    """IVF-style ANN: coarse quantizer -> probe the n_probe nearest
    inverted lists -> exact cosine re-rank within them. Assignment is a
    native argmax over codebook cosines (at scale the cluster id is the
    partition/cluster key, so the probe is partition pruning), and only a
    constant-size codebook ever crosses the driver.

    `cents` optionally supplies an externally trained codebook (the
    production shape: `clustering.kmeans_fit` + `dequantize`, the same
    train-then-index split FAISS IVF uses); default stays the
    deterministic data-sample codebook."""
    import math
    if cents is None:
        cents = codebook(embeddings, n_centroids, id_col, vec_col)

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(y * y for y in b)) or 1.0
        return num / (na * nb)

    ranked = sorted(((round(cos(query, c), 9), i)
                     for i, c in enumerate(cents)), key=lambda t: (-t[0], t[1]))
    probe = [i for _, i in ranked[:n_probe]]
    cluster, _ = assignment_cols(cents, vec_col)
    cand = (embeddings.withColumn("_cluster", cluster)
            .where(F.col("_cluster").isin(probe)))
    return topk_by_score(cand, cosine_col(vec_col, query), k, id_col)


def write_ivf_index(embeddings: DataFrame, path: str,
                    cents: list[list[float]],
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> None:
    """Materialize the inverted-list layout the ivf_topk docstrings
    promise: embeddings written parquet-partitioned BY CLUSTER ID, so a
    probe over n_probe lists is literal partition pruning — the scan
    touches n_probe directories out of k, never the corpus. At 10^10
    vectors this (or its Iceberg `partition by cluster` equivalent) is
    the difference between reading 0.1% and 100% of the index per
    query."""
    cluster, _ = assignment_cols(cents, vec_col)
    (embeddings.withColumn("cluster", cluster)
     .write.mode("overwrite").partitionBy("cluster").parquet(path))


def ivf_topk_pruned(spark, path: str, query: list[float], k: int,
                    cents: list[list[float]], n_probe: int = IVF_PROBE,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """ivf_topk's query side over a `write_ivf_index` layout: rank the
    probe lists from the codebook (driver-side constant work), then scan
    ONLY those partitions (the `cluster IN probe` predicate becomes
    PartitionFilters — asserted by tests) and exact-re-rank within.
    Same scores as the assignment-on-the-fly path (tested equal)."""
    import math

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(y * y for y in b)) or 1.0
        return num / (na * nb)

    ranked = sorted(((round(cos(query, c), 9), i)
                     for i, c in enumerate(cents)),
                    key=lambda t: (-t[0], t[1]))
    probe = [i for _, i in ranked[:n_probe]]
    cand = spark.read.parquet(path).where(F.col("cluster").isin(probe))
    return topk_by_score(cand, cosine_col(vec_col, query), k, id_col)


def lsh_table_buckets_udf(dim: int, n_tables: int = N_TABLES,
                          bits: int = BITS_PER_TABLE):
    """array of per-TABLE bucket values (banding): one independent
    bits-hyperplane signature per table. A pair is a candidate if it
    collides in ANY table — recall 1-(1-p^bits)^n_tables, p = 1 - theta/pi,
    vs the single-table exact-signature join whose recall is p^all_bits
    (the bug this replaces: ~1% recall at loose thresholds)."""
    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def buckets(vec: pd.Series) -> pd.Series:
        H = _hyperplanes(dim, n_tables * bits)
        M = np.stack([np.asarray(v, dtype=np.float64) for v in vec])
        signs = ((M @ H.T) > 0).reshape(len(M), n_tables, bits)
        vals = (signs * (1 << np.arange(bits))).sum(axis=2).astype(np.int32)
        return pd.Series(list(vals))
    return buckets


def embedding_neardup_pairs(embeddings: DataFrame, threshold: float = 0.9,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs via multi-table LSH banding:
    candidates collide in >=1 of N_TABLES independent hyperplane tables,
    then are exact-scored; no O(n^2) cross join."""
    first = embeddings.select(vec_col).first()
    dim = len(first[vec_col])
    b = (embeddings.select(F.col(id_col).alias("id"),
                           F.col(vec_col).alias("v"),
                           F.posexplode(
                               lsh_table_buckets_udf(dim)(F.col(vec_col)))
                           .alias("tbl", "bkt")))
    l, r = b.alias("l"), b.alias("r")
    pairs = (l.join(r, (F.col("l.tbl") == F.col("r.tbl"))
                    & (F.col("l.bkt") == F.col("r.bkt"))
                    & (F.col("l.id") < F.col("r.id")))
             .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                     F.col("l.v").alias("va"), F.col("r.v").alias("vb"))
             .dropDuplicates(["id_a", "id_b"]))
    return (pairs.withColumn("cosine",
                             pair_cosine_col(F.col("va"), F.col("vb")))
            .where(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def pair_cosine_col(va, vb, dp: int = 6):
    """Cosine between two array<float> columns, accumulated in double by a
    native sequential fold (same order both here and in the DuckDB
    list_dot_product oracle replay, so the rounded value is engine-exact)."""
    dot = F.aggregate(F.zip_with(va.cast("array<double>"),
                                 vb.cast("array<double>"),
                                 lambda a, c: a * c),
                      F.lit(0.0), lambda acc, x: acc + x)
    nrm = (F.sqrt(F.aggregate(va.cast("array<double>"), F.lit(0.0),
                              lambda acc, x: acc + x * x))
           * F.sqrt(F.aggregate(vb.cast("array<double>"), F.lit(0.0),
                                lambda acc, x: acc + x * x)))
    return F.round(dot / nrm, dp)


SEMDEDUP_CENTROIDS = 16
SEMDEDUP_THRESHOLD = 0.40


def semdedup(embeddings: DataFrame,
             threshold: float = SEMDEDUP_THRESHOLD,
             n_centroids: int = SEMDEDUP_CENTROIDS,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): coarse-cluster the embeddings, order each cluster
    by similarity-to-centroid (descending, id ascending on ties), and drop
    every point that has a predecessor in the SAME cluster with cosine >=
    threshold — the paper's upper-triangular max rule, which is one-shot
    (not iterative greedy) and therefore a single cluster-local self-join.

    Scale shape: the cluster id is the only shuffle key; the pairwise
    check is confined to within-cluster pairs (the paper sizes k so
    clusters stay bounded — k ~ sqrt(n)), every cluster dedupes fully in
    parallel, and only the constant-size codebook crosses the driver.
    There is no all-pairs scan anywhere.

    Returns (id_col, cluster, kept) — integers/boolean only, so the
    cross-engine check never hashes a float: the cosines decide but are
    identical doubles in both engines (same fold order, rounded).
    """
    cents = codebook(embeddings, n_centroids, id_col, vec_col)
    # precompute each row's L2 norm ONCE: the interpreted fold would
    # otherwise re-run per centroid in the argmax and twice per pair in
    # the join (the expression cost that dominates this operator); the
    # arithmetic is unchanged — dot / (norm * other), same fold, same
    # multiplication order — so the doubles are bit-identical
    base = (embeddings
            .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .withColumn("nv", norm_col("v")))
    cluster, csim = assignment_cols(cents, "v", norm=F.col("nv"))
    # persist: the assignment expressions (k interpreted cosine folds per
    # row) feed BOTH self-join sides and the final kept projection —
    # uncached they would evaluate three times over the corpus
    assign = (base.withColumn("cl", cluster).withColumn("cs", csim)
              .persist())
    l = assign.select(F.col("id").alias("lid"), F.col("v").alias("lv"),
                      F.col("nv").alias("lnv"),
                      F.col("cl").alias("lcl"), F.col("cs").alias("lcs"))
    r = assign.select(F.col("id").alias("rid"), F.col("v").alias("rv"),
                      F.col("nv").alias("rnv"),
                      F.col("cl").alias("rcl"), F.col("cs").alias("rcs"))
    precedes = ((F.col("lcs") > F.col("rcs"))
                | ((F.col("lcs") == F.col("rcs"))
                   & (F.col("lid") < F.col("rid"))))
    pair_dot = F.aggregate(
        F.zip_with(F.col("lv").cast("array<double>"),
                   F.col("rv").cast("array<double>"), lambda a, c: a * c),
        F.lit(0.0), lambda acc, x: acc + x)
    similar = (F.round(pair_dot / (F.col("lnv") * F.col("rnv")), 6)
               >= threshold)
    dropped = (l.join(r, (F.col("lcl") == F.col("rcl")) & precedes & similar)
               .select(F.col("rid").alias("id")).distinct()
               .withColumn("_d", F.lit(True)))
    return (assign.join(dropped, "id", "left")
            .select(F.col("id").alias(id_col),
                    F.col("cl").alias("cluster"),
                    F.col("_d").isNull().alias("kept")))


def perturbed_copies(embeddings: DataFrame, id_offset: int = 1_000_000,
                     noise: float = 0.2, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Deterministic near-duplicate vectors for dedup evaluation: each row
    gains a copy (id + id_offset) with seeded Gaussian noise added and
    re-normalized — cos(original, copy) ~ 1/sqrt(1+noise^2) ~ 0.98."""
    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def jitter(vid: pd.Series, vec: pd.Series) -> pd.Series:
        out = []
        for i, v in zip(vid, vec):
            a = np.asarray(v, dtype=np.float64)
            n = np.linalg.norm(a) or 1.0
            a = a / n
            g = np.random.default_rng([int(i), 77]).standard_normal(len(a))
            p = a + noise * g / np.linalg.norm(g)
            out.append((p / np.linalg.norm(p)).astype(np.float32).tolist())
        return pd.Series(out)

    return embeddings.select(
        (F.col(id_col) + id_offset).alias(id_col),
        jitter(F.col(id_col), F.col(vec_col)).alias(vec_col))


def hash_embed_udf(dim: int = EMBED_DIM):
    """Deterministic text embedder STAND-IN (reference embedder.py calls
    OpenAI text-embedding-3-small; no network here). Same plumbing:
    Arrow-batched, fixed dim, L2-normalized float array.

    Hash scheme is md5-hex based (idx = first 8 hex chars mod dim, sign =
    parity of hex chars 9-10) so the DuckDB oracle can reproduce it in pure
    SQL — the accumulator holds small integers (exact in float64) and the
    final divide/sqrt are correctly-rounded IEEE ops, so both engines emit
    bit-identical values."""
    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(text: pd.Series) -> pd.Series:
        import hashlib
        out = []
        for t in text:
            acc = np.zeros(dim, dtype=np.float64)
            for tok in (t or "").lower().split():
                h = hashlib.md5(tok.encode()).hexdigest()
                idx = int(h[:8], 16) % dim
                acc[idx] += 1.0 if int(h[8:10], 16) & 1 else -1.0
            n = np.linalg.norm(acc)
            out.append((acc / n if n > 0 else acc).astype(np.float32).tolist())
        return pd.Series(out)
    return embed
