"""Deduplication operators (SURVEY C16/C17, P7-P9; plus the training-data
additions: exact hash, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine
near-dup).

Exact and Jaccard variants are pure DataFrame compositions (SQL-checkable);
MinHash/SimHash use one vectorized Arrow UDF each for the signature, then
native band-explode + self-join — the scale path (no O(n^2) pair scan).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .spread import spread_scan

# ------------------------------------------------------------------ exact

def keep_first(df: DataFrame, key_cols: list[str],
               order_cols: list[str]) -> DataFrame:
    """SURVEY C16/P7/P8: keep-first dedup — first row per key under a stable
    total order (the reference's insertion order becomes explicit columns)."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact-content duplicate groups via content hash; returns
    (content_key, n_dups, keep_id) for groups with >1 member."""
    keyed = df.select(F.col(id_col), F.md5(F.lower(F.trim(F.col(text_col))))
                      .alias("content_key"))
    return (keyed.groupBy("content_key")
            .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
            .where(F.col("n_dups") > 1))


# ------------------------------------------------------------------ shingles

def shingle_col(text_col: str, n: int = 3):
    """Word-level n-gram shingles as an array column — native higher-order
    fns only (reference builds these in Python, deduplicator.py:148-158)."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    ).otherwise(F.array(F.concat_ws(" ", words)))


def jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                  n: int = 3, threshold: float = 0.6) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (id_a < id_b, sim >= threshold).
    Plan: explode distinct shingles -> self-equi-join on shingle (the only
    shuffle key; no O(n^2)) -> |A∩B| per pair -> sim via |A|+|B|-∩."""
    sh = (df.select(F.col(id_col).alias("id"),
                    F.explode(F.array_distinct(shingle_col(text_col, n)))
                    .alias("shingle")))
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.id") < F.col("b.id")))
             .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
             .agg(F.count("*").alias("n_int")))
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard",
                        F.round(F.col("n_int")
                                / (F.col("n_a") + F.col("n_b") - F.col("n_int")), 6))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


# ------------------------------------------------------------------ minhash

N_PERM = 128    # reference processors/deduplicator.py:25 (num_perm=128)
LSH_BANDS = 32  # 32 bands x 4 rows: >=0.999 recall at Jaccard 0.7 (the
# reference's MinHashLSH threshold, deduplicator.py:24)
_MERSENNE = (1 << 61) - 1


def _minhash_params(seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    # odd 64-bit multipliers + xor seeds for multiply-xorshift mixing
    a = rng.integers(0, 1 << 63, N_PERM, dtype=np.uint64) * 2 + 1
    b = rng.integers(0, 1 << 63, N_PERM, dtype=np.uint64)
    return a, b


def minhash_text_sig_udf(n: int = 3):
    """text -> MinHash signature in ONE Arrow UDF (shingling included).
    Shingling in Python str ops beats the equivalent JVM higher-order
    expression (transform/slice/concat_ws builds each shingle string
    through codegen ~5x slower) AND avoids shipping the exploded shingle
    arrays through Arrow — only the fixed-size signature crosses.

    Permutation family: multiply-xorshift over the 64-bit shingle hash with
    natural uint64 wraparound — ((h ^ b_j) * a_j) ^ (v >> 32) — fully
    vectorized numpy, one (n_shingles x N_PERM) pass per row. (An affine
    (a*h+b) mod M map over NARROW h is NOT min-wise usable: when a*h never
    exceeds M the map is monotone in h and every such "permutation" shares
    one argmin, inflating agreement between unrelated short docs.)"""
    a, b = _minhash_params()

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def fn(text: pd.Series) -> pd.Series:
        import hashlib
        # batch-level shingle dedup (r6): near-dup corpora repeat shingles
        # heavily ACROSS documents, so hash each distinct shingle once per
        # Arrow batch and compute its 128 permutation values once — the
        # per-document signature is then a min over gathered rows. The min
        # is duplicate-invariant, so values are bit-identical.
        docs_sh = []
        uniq: dict[str, int] = {}
        for t in text:
            w = (t or "").lower().split()
            sh = ([" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]
                  if len(w) >= n else [" ".join(w)])
            docs_sh.append([uniq.setdefault(s, len(uniq)) for s in sh])
        hv = np.fromiter(
            (int.from_bytes(hashlib.blake2b(
                s.encode(), digest_size=8).digest(), "little")
             for s in uniq),
            dtype=np.uint64, count=len(uniq))
        out = []
        with np.errstate(over="ignore"):
            v = (hv[:, None] ^ b[None, :]) * a[None, :]
            v ^= v >> np.uint64(32)
            vs = v.astype(np.int64)
            for idx in docs_sh:
                out.append(vs[idx].min(axis=0).tolist())
        return pd.Series(out)
    return fn


def minhash_band_rows(df: DataFrame, id_col: str, text_col: str,
                      n: int = 3) -> DataFrame:
    """(id, sig, band, band_hash) LSH band rows — the PERSISTABLE index
    representation: write these per ingest round (bucketed/partitioned
    by (band, band_hash) at scale) and later rounds probe new documents
    against the stored rows without ever re-shingling the corpus
    (`incremental_minhash_verified`)."""
    sig = df.select(F.col(id_col).alias("id"),
                    minhash_text_sig_udf(n)(F.col(text_col)).alias("sig"))
    return sig.select("id", "sig",
                      _band_hash_cols().alias("band", "band_hash"))


def _band_hash_cols(sig_col: str = "sig"):
    rows_per_band = N_PERM // LSH_BANDS
    return F.posexplode(F.transform(
        F.sequence(F.lit(0), F.lit(LSH_BANDS - 1)),
        lambda bi: F.xxhash64(F.concat_ws(
            ",", F.slice(sig_col, bi * rows_per_band + 1, rows_per_band)))))


def minhash_neardup_pairs(df: DataFrame, id_col: str, text_col: str,
                          n: int = 3) -> DataFrame:
    """Candidate near-dup pairs via MinHash LSH banding: signature ->
    band hashes -> explode -> self-equi-join on (band, band_hash) ->
    estimated Jaccard = matching permutations / N_PERM.

    r6 shape: the signature table is computed ONCE (persisted — the
    Arrow UDF is the dominant per-row cost and would otherwise re-run
    per join side) and the self-join moves only (id, band, band_hash)
    rows; the ~KB signature arrays re-attach to the small candidate
    set by id afterwards (shuffle the proxy, not the payload)."""
    sig = spread_scan(df).select(
        F.col(id_col).alias("id"),
        minhash_text_sig_udf(n)(F.col(text_col)).alias("sig"))
    sig = sig.persist()
    bands = sig.select("id", _band_hash_cols().alias("band", "band_hash"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.band_hash") == F.col("b.band_hash"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"]))
    with_sigs = (cand
                 .join(sig.select(F.col("id").alias("id_a"),
                                  F.col("sig").alias("sig_a")), "id_a")
                 .join(sig.select(F.col("id").alias("id_b"),
                                  F.col("sig").alias("sig_b")), "id_b"))
    est = F.expr(
        "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) ") \
        / F.lit(float(N_PERM))
    return (with_sigs.withColumn("est_jaccard", F.round(est, 6))
            .select("id_a", "id_b", "est_jaccard"))


def shingle_hash_udf(n: int = 3):
    """text -> SORTED array of distinct 64-bit shingle hashes, one Arrow
    pass (the interpreted JVM higher-order chain — split/transform/slice/
    concat_ws/array_distinct — costs ~2 ms/doc and gets re-evaluated per
    join side; this UDF is ~10x cheaper and only longs cross back). The
    hash order doubles as the prefix-filter's global total order; a 64-bit
    collision can only ADD a candidate, which exact verification rejects."""
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def fn(text: pd.Series) -> pd.Series:
        import hashlib
        # batch-level shingle dedup (r6): hash each distinct shingle once
        # per Arrow batch (shingles repeat across near-dup documents);
        # per-doc output is np.unique over gathered rows — identical to
        # hashing per doc, since the hash is a pure function
        docs_sh = []
        uniq: dict[str, int] = {}
        for t in text:
            w = (t or "").lower().split()
            sh = ({" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}
                  if len(w) >= n else {" ".join(w)})
            docs_sh.append([uniq.setdefault(s, len(uniq)) for s in sh])
        hv_all = np.fromiter(
            (int.from_bytes(hashlib.blake2b(
                s.encode(), digest_size=8).digest(), "little")
             for s in uniq), dtype=np.uint64, count=len(uniq))
        out = []
        for idx in docs_sh:
            hv = np.unique(hv_all[idx])
            out.append(hv.astype(np.int64).tolist())
        return pd.Series(out)
    return fn


def _verify_pairs_exact(cand: DataFrame, base: DataFrame,
                        threshold: float) -> DataFrame:
    """Exact-verify candidate pairs: join each side's distinct-shingle-hash
    array back (base = (id, _hs) from shingle_hash_udf) and compute Jaccard
    with native array set-ops — all JVM-side, arrays of longs only."""
    with_arrays = (cand
                   .join(base.select(F.col("id").alias("id_a"),
                                     F.col("_hs").alias("_sa")), "id_a")
                   .join(base.select(F.col("id").alias("id_b"),
                                     F.col("_hs").alias("_sb")), "id_b"))
    n_int = F.size(F.array_intersect("_sa", "_sb"))
    union = F.size("_sa") + F.size("_sb") - n_int
    return (with_arrays
            .withColumn("jaccard",
                        F.round(n_int / F.greatest(union, F.lit(1)), 6))
            .where(F.col("jaccard") >= threshold)
            .drop("_sa", "_sb"))


def minhash_verified_pairs(df: DataFrame, id_col: str, text_col: str,
                           n: int = 3, threshold: float = 0.6) -> DataFrame:
    """The full near-dup pipeline (SURVEY P9 at scale): MinHash-LSH surfaces
    candidate pairs (no O(n^2)); the small candidate set then joins the
    texts back and computes EXACT n-gram Jaccard in one Arrow UDF — the
    estimate never decides, it only prunes. Returns pairs with
    (est_jaccard, jaccard) at jaccard >= threshold."""
    cand = minhash_neardup_pairs(df, id_col, text_col, n)
    # persist: the verify stage joins this frame on BOTH pair sides — the
    # shingling UDF would otherwise run twice over the corpus
    base = spread_scan(df).select(
        F.col(id_col).alias("id"),
        shingle_hash_udf(n)(F.col(text_col)).alias("_hs"))
    base = base.persist()
    return _verify_pairs_exact(cand, base, threshold) \
        .select("id_a", "id_b", "est_jaccard", "jaccard")


def incremental_minhash_verified(new_docs: DataFrame, index_docs: DataFrame,
                                 id_col: str, text_col: str, n: int = 3,
                                 threshold: float = 0.6) -> DataFrame:
    """The CONTINUOUS-crawl dedup shape: each ingest round shingles and
    bands only the NEW documents and probes them against the persisted
    band table (here recomputed from `index_docs` for the oracle check —
    in production the right side is `minhash_band_rows` output read back
    from the store, and this round's `new_bands` are appended to it).
    Detects new-vs-index and new-vs-new near-dups; index-vs-index pairs
    are never re-derived, so per-round cost scales with the DELTA, not
    the corpus — the property that makes LSH dedup sustainable at a
    10^10-document archive growing by 10^7/day.

    Returns (id_a, id_b, jaccard, vs_index) with id_a < id_b, exact
    n-gram Jaccard >= threshold (LSH only prunes; the estimate never
    decides), vs_index = the pair spans the index/new boundary."""
    # slim persisted band rows (r6): nb feeds the cross join AND both
    # sides of the within join — without the persist the signature UDF
    # would re-run per consumer; the sig arrays are not needed downstream
    # (verification is exact-shingle, not estimate-based), so only
    # (id, band, band_hash) rows enter the joins
    nb = (minhash_band_rows(new_docs, id_col, text_col, n)
          .drop("sig").persist())
    ib = (minhash_band_rows(index_docs, id_col, text_col, n)
          .drop("sig").persist())
    cross = (nb.alias("a")
             .join(ib.alias("b"),
                   (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.band_hash") == F.col("b.band_hash"))
                   & (F.col("a.id") != F.col("b.id")))
             .select(F.least("a.id", "b.id").alias("id_a"),
                     F.greatest("a.id", "b.id").alias("id_b"),
                     F.lit(True).alias("vs_index")))
    within = (nb.alias("a")
              .join(nb.alias("b"),
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.band_hash") == F.col("b.band_hash"))
                    & (F.col("a.id") < F.col("b.id")))
              .select(F.col("a.id").alias("id_a"),
                      F.col("b.id").alias("id_b"),
                      F.lit(False).alias("vs_index")))
    cand = (cross.unionByName(within)
            .dropDuplicates(["id_a", "id_b"]))
    corpus = new_docs.unionByName(index_docs)
    base = corpus.select(F.col(id_col).alias("id"),
                         shingle_hash_udf(n)(F.col(text_col)).alias("_hs"))
    base = base.persist()  # joined on both pair sides (see above)
    return (_verify_pairs_exact(cand, base, threshold)
            .select("id_a", "id_b", "jaccard", "vs_index"))


def jaccard_pairs_prefix(df: DataFrame, id_col: str, text_col: str,
                         n: int = 3, threshold: float = 0.6) -> DataFrame:
    """EXACT set-similarity self-join with PREFIX FILTERING (the
    AllPairs/PPJoin family): under any global total order over shingles, a
    pair with Jaccard >= t shares at least one shingle among each side's
    first |S| - ceil(t*|S|) + 1 shingles (pigeonhole: the intersection has
    >= ceil(t*|S|) elements, more than fit in the suffix). So the
    self-equi-join explodes ONLY prefixes — at t=0.5 that's ~quarter the
    join fanout of the all-shingles join — then the candidate set is
    exact-verified from the texts. Recall is guaranteed, not probabilistic.
    Returns (id_a, id_b, jaccard) at jaccard >= threshold."""
    # shingle-hash arrays (sorted = the global prefix order) built ONCE in
    # an Arrow UDF and persisted: the self-join's two sides and the verify
    # stage all reuse it (tiny: one ~8*|S|-byte row per doc)
    base = df.select(F.col(id_col).alias("id"),
                     shingle_hash_udf(n)(F.col(text_col)).alias("_hs"))
    base = base.persist()
    plen = (F.size("_hs") - F.ceil(F.size("_hs") * F.lit(float(threshold)))
            + F.lit(1)).cast("int")
    pre = base.select("id", F.explode(F.slice("_hs", F.lit(1), plen))
                      .alias("sh"))
    a, b = pre.alias("a"), pre.alias("b")
    cand = (a.join(b, (F.col("a.sh") == F.col("b.sh"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"]))
    return _verify_pairs_exact(cand, base, threshold) \
        .select("id_a", "id_b", "jaccard")


def greedy_keep_first_dedup(pairs: DataFrame, all_ids: DataFrame,
                            id_col: str, threshold: float = 0.6) -> DataFrame:
    """Single-pass approximation: drops any id pairing with ANY smaller id
    above threshold. Diverges from the reference on bridge chains (a-b,
    b-c: reference keeps c because b was dropped) — use
    `greedy_chain_dedup` for exact insert-order parity."""
    drop = (pairs.where(F.col("est_jaccard") >= threshold)
            .select(F.col("id_b").alias(id_col)).distinct())
    return all_ids.join(drop, id_col, "left_anti")


def connected_components(pairs: DataFrame, max_iter: int = 15) -> DataFrame:
    """Min-label propagation over an (id_a, id_b) edge list -> (id, comp)
    with comp = the component's minimum id. Converges in component-diameter
    iterations (near-dup clusters are shallow); each iteration is one
    shuffle join + agg with lineage truncated via localCheckpoint.
    Convergence = no label changed vs the previous iteration (checked by a
    changed-row probe join; a sum-of-labels test would overflow Spark 4's
    ANSI long sum under the 64-bit hash ids this repo uses as doc ids)."""
    sym = (pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
           .unionByName(pairs.select(F.col("id_b").alias("src"),
                                     F.col("id_a").alias("dst"))))
    # the candidate-pair graph is tiny relative to the corpus (LSH already
    # pruned it); iterating at the session's full shuffle width would run
    # mostly-empty tasks per round — size the loop's parallelism to the
    # edge count instead
    n_parts = max(2, min(16, sym.sparkSession.sparkContext.defaultParallelism))
    sym = sym.repartition(n_parts, "src").localCheckpoint(eager=True)
    comp = (sym.select(F.col("src").alias("id")).distinct()
            .repartition(n_parts, "id")
            .withColumn("comp", F.col("id")).localCheckpoint(eager=True))
    for _ in range(max_iter):
        # new label = min(own label, neighbors' labels), expressed as a
        # UNION + groupBy-min so comp never self-joins (Spark's ambiguous-
        # self-join check trips even across localCheckpoint boundaries).
        # The OLD label rides along as min(lab) over the tagged self row
        # (exactly one per id), so the fixpoint probe below is a scan of
        # the checkpointed result instead of a join back to `comp`.
        self_lab = comp.select(F.col("id").alias("src"),
                               F.col("comp").alias("lab"),
                               F.lit(True).alias("_own"))
        nbr_lab = (sym.join(comp.select(F.col("id").alias("_nid"),
                                        F.col("comp").alias("lab")),
                            sym["dst"] == F.col("_nid"))
                   .select("src", "lab", F.lit(False).alias("_own")))
        new_comp = (self_lab.unionByName(nbr_lab)
                    .repartition(n_parts, "src")
                    .groupBy("src").agg(
                        F.min("lab").alias("comp"),
                        F.min(F.when(F.col("_own"), F.col("lab")))
                        .alias("_old"))
                    .withColumnRenamed("src", "id")
                    .localCheckpoint(eager=True))
        # labels only decrease, so "any row with a strictly smaller label"
        # is the exact fixpoint test; limit(1) short-circuits the probe
        changed = (new_comp.where(F.col("comp") < F.col("_old"))
                   .limit(1).count())
        comp = new_comp.drop("_old")
        if changed == 0:
            break
    return comp


def greedy_chain_dedup(all_ids: DataFrame, pairs: DataFrame, id_col: str,
                       seq_col: str) -> DataFrame:
    """EXACT reference-greedy near-dup resolution (deduplicator.py:119-146):
    iterate records in `seq_col` order; a record is dropped iff some
    already-KEPT earlier record is one of its candidate pairs (so a record
    whose only earlier partner was itself dropped stays — bridge chains
    survive). Distributed shape: connected components over the pair graph,
    then the sequential greedy runs per component inside a cogrouped
    applyInPandas (components are tiny near-dup clusters; cross-component
    work is fully parallel). Returns the kept ids."""
    # persist: the candidate-pair pipeline (LSH + joins) above this call
    # is the expensive subtree, and it feeds BOTH the component loop and
    # the per-component edge lists — uncached it would execute twice
    pairs = pairs.persist()
    comp = connected_components(pairs)
    # alias comp's columns per consumer: members and edges_c meet again in
    # the cogroup, so shared expression ids would be flagged as ambiguous
    members = (all_ids.select(F.col(id_col).alias("_id"),
                              F.col(seq_col).alias("_seq"))
               .join(comp.select(F.col("id").alias("_cid"),
                                 F.col("comp").alias("comp")),
                     F.col("_id") == F.col("_cid"))
               .select(F.col("comp").alias("comp"), "_id", "_seq"))
    edges_c = (pairs.select("id_a", "id_b")
               .join(comp.select(F.col("id").alias("_cid"),
                                 F.col("comp").alias("comp")),
                     F.col("id_a") == F.col("_cid"))
               .select(F.col("comp").alias("comp"), "id_a", "id_b"))

    def greedy(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        adj: dict = {}
        for a, b in zip(right["id_a"], right["id_b"]):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        kept: set = set()
        out = []
        for rid in left.sort_values("_seq")["_id"]:
            if not (adj.get(rid, set()) & kept):
                kept.add(rid)
                out.append(rid)
        return pd.DataFrame({"_id": out})

    id_type = dict(all_ids.dtypes)[id_col]
    kept_in_graph = (members.groupBy("comp")
                     .cogroup(edges_c.groupBy("comp"))
                     .applyInPandas(greedy, schema=f"_id {id_type}")
                     .select(F.col("_id").alias(id_col)))
    trivially_kept = (all_ids.select(F.col(id_col))
                      .join(comp, F.col(id_col) == comp["id"], "left_anti"))
    return trivially_kept.unionByName(kept_in_graph)


# ------------------------------------------------------------------ simhash

SIMHASH_BITS = 60  # 15 md5 hex chars -> non-negative int64, SQL-replayable


@F.pandas_udf(T.LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    """60-bit SimHash over whitespace tokens (training-data near-dup).

    Token hash = first 15 hex chars of md5 so a SQL oracle (DuckDB) can
    recompute the identical signature: per bit b, the signature bit is
    set iff sum over tokens of ((h>>b)&1 ? +1 : -1) is positive."""
    import hashlib
    out = np.zeros(len(text), dtype=np.int64)
    shifts = np.arange(SIMHASH_BITS, dtype=np.uint64)
    # batch-level token dedup (r6): md5 each distinct token once per Arrow
    # batch and expand its +1/-1 bit vector once; each document then sums
    # gathered rows (occurrence multiplicity preserved by the index list),
    # which is arithmetically identical to the per-occurrence loop
    docs_tok = []
    uniq: dict[str, int] = {}
    for t in text:
        toks = (t or "").lower().split()
        docs_tok.append([uniq.setdefault(tok, len(uniq)) for tok in toks])
    hv = np.fromiter(
        (int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
         for tok in uniq), dtype=np.uint64, count=len(uniq))
    pm = np.where(((hv[:, None] >> shifts[None, :]) & np.uint64(1)) == 1,
                  np.int64(1), np.int64(-1))
    for i, idx in enumerate(docs_tok):
        if not idx:
            continue
        acc = pm[idx].sum(axis=0)
        out[i] = int(((acc > 0).astype(np.uint64)
                      << shifts).sum(dtype=np.uint64))
    return pd.Series(out)


def hamming_block_rows(df: DataFrame, id_col: str, hash_col: str,
                       max_hamming: int, bits: int = 64) -> DataFrame:
    """The persistable block table for hamming LSH — (id, h, blk,
    blk_val), one row per (item, block). This is the hamming analog of
    `minhash_band_rows`: in a CONTINUOUS pipeline this frame is what you
    append to the store each ingest round, so the next round's delta can
    probe it with plain (blk, blk_val) equi-joins instead of re-deriving
    the whole archive. Blocks tile `bits` into max_hamming+1 slices —
    by pigeonhole ANY pair within max_hamming differs in at most
    max_hamming blocks, so at least one block matches EXACTLY
    (guaranteed recall, not probabilistic).

    `bits` = the hash's EFFECTIVE width. Blocks must tile only real bits:
    tiling 64 for a 60-bit signature would leave one block almost
    constant (its top 4 bits always 0), whose join degenerates toward the
    full cross product."""
    if not 0 <= max_hamming < bits:
        # a silent cap would void the pigeonhole guarantee (need
        # max_hamming+1 non-empty blocks out of `bits` bits)
        raise ValueError(
            f"max_hamming must be in [0, {bits - 1}], got {max_hamming}")
    n_blocks = max_hamming + 1
    bounds = [i * bits // n_blocks for i in range(n_blocks)] + [bits]

    def block(i: int):
        width = bounds[i + 1] - bounds[i]
        shifted = F.shiftrightunsigned(hash_col, bounds[i])
        if width >= 64:  # single-block case: the mask would overflow int64
            return shifted
        return shifted.bitwiseAND(F.lit((1 << width) - 1))

    block_cols = [block(i) for i in range(n_blocks)]
    return df.select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("h"),
        F.posexplode(F.array(*block_cols)).alias("blk", "blk_val"))


def hamming_block_pairs(df: DataFrame, id_col: str, hash_col: str,
                        max_hamming: int, bits: int = 64) -> DataFrame:
    """Shared block-LSH for hamming near-dup (SimHash, image phash):
    split the hash into max_hamming+1 bit blocks (`hamming_block_rows`),
    self-equi-join on (block, value), then exact bit_count verify.
    Narrower blocks (bigger max_hamming) mean more candidates: the
    guaranteed-recall tradeoff is inherent."""
    # persist: the self-join consumes the block rows on BOTH sides, and
    # for signature inputs (video/audio/simhash) the upstream subtree is
    # a full decode/hash pass that must not run twice
    blocks = hamming_block_rows(df, id_col, hash_col, max_hamming,
                                bits).persist()
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (a.join(b, (F.col("a.blk") == F.col("b.blk"))
                   & (F.col("a.blk_val") == F.col("b.blk_val"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.col("a.h").alias("h_a"), F.col("b.h").alias("h_b"))
            .dropDuplicates(["id_a", "id_b"]))
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (cand.withColumn("hamming", hamming)
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def incremental_hamming_neardup(new_df: DataFrame, index_df: DataFrame,
                                id_col: str, hash_col: str,
                                max_hamming: int, bits: int = 64,
                                index_blocks: DataFrame | None = None,
                                broadcast_delta: bool = False
                                ) -> DataFrame:
    """The CONTINUOUS-crawl shape for hamming near-dup (the image-side
    twin of `incremental_minhash_verified`): block only the NEW items
    and probe them against the persisted block table (here recomputed
    from `index_df` for the oracle check — in production the right side
    is `hamming_block_rows` output read back from the store, and this
    round's new blocks are appended to it). Detects new-vs-index and
    new-vs-new pairs; index-vs-index pairs are never re-derived, so
    per-round cost scales with the DELTA, not the archive — what makes
    phash dedup sustainable on an image archive growing by 10^7/day.

    Returns (id_a, id_b, hamming, vs_index) with id_a < id_b, exact
    bit_count hamming <= max_hamming (the block join only prunes; the
    exact distance decides), vs_index = the pair spans the index/new
    boundary. Recall guarantee is inherited from the block tiling —
    pigeonhole needs only that SOME block of the pair matches, which
    holds regardless of which side each item lives on.

    `index_blocks` is the production path: pass the PERSISTED
    `hamming_block_rows` output ((id, h, blk, blk_val), read back from
    the store) and `index_df` is ignored — the per-round cost drops to
    blocking the delta plus one probe join against the stored table
    (the archive is scanned, never re-exploded or re-derived). The
    caller owns keeping the stored table's (max_hamming, bits) tiling
    in sync — mismatched tilings void the recall guarantee silently.

    `broadcast_delta` asserts the steady-state size relation (delta <<
    archive): the delta's block rows broadcast into the probe join, so
    the stored table is SCANNED but never shuffled — at a 10^10-image
    archive the difference between re-sorting the archive every round
    and streaming it past a ~MB hash table. Caller-owned because only
    the caller knows the delta really is broadcast-sized."""
    nb = hamming_block_rows(new_df, id_col, hash_col, max_hamming, bits)
    ib = (index_blocks if index_blocks is not None else
          hamming_block_rows(index_df, id_col, hash_col, max_hamming, bits))
    nbc = F.broadcast(nb) if broadcast_delta else nb
    cross = (nbc.alias("a")
             .join(ib.alias("b"),
                   (F.col("a.blk") == F.col("b.blk"))
                   & (F.col("a.blk_val") == F.col("b.blk_val"))
                   & (F.col("a.id") != F.col("b.id")))
             .select(F.least("a.id", "b.id").alias("id_a"),
                     F.greatest("a.id", "b.id").alias("id_b"),
                     # hamming is symmetric — safe under the least/
                     # greatest swap
                     F.bit_count(F.col("a.h").bitwiseXOR(F.col("b.h")))
                     .alias("hamming"),
                     F.lit(True).alias("vs_index")))
    within = (nb.alias("a")
              .join(nb.alias("b"),
                    (F.col("a.blk") == F.col("b.blk"))
                    & (F.col("a.blk_val") == F.col("b.blk_val"))
                    & (F.col("a.id") < F.col("b.id")))
              .select(F.col("a.id").alias("id_a"),
                      F.col("b.id").alias("id_b"),
                      F.bit_count(F.col("a.h").bitwiseXOR(F.col("b.h")))
                      .alias("hamming"),
                      F.lit(False).alias("vs_index")))
    return (cross.unionByName(within)
            .where(F.col("hamming") <= max_hamming)
            .dropDuplicates(["id_a", "id_b"]))


def simhash_neardup_pairs(df: DataFrame, id_col: str, text_col: str,
                          max_hamming: int = 6) -> DataFrame:
    """SimHash near-dup with guaranteed-recall block LSH over the
    signature's effective 60 bits. Default max_hamming=6 keeps blocks
    ~8.6 bits wide; every extra allowed bit of distance narrows blocks
    and grows the candidate set (the guaranteed-recall cost curve —
    production callers pick max_hamming by that budget)."""
    sh = spread_scan(df).select(F.col(id_col).alias("id"),
                                simhash_udf(F.col(text_col)).alias("sim"))
    # hamming_block_pairs persists its block rows, so the md5 token-hash
    # UDF here runs exactly once despite the self-join
    return hamming_block_pairs(sh, "id", "sim", max_hamming,
                               bits=SIMHASH_BITS)
