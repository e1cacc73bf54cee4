"""Training-shard packing and deterministic mixture sampling — the two
dataset-assembly steps a pretraining pipeline runs AFTER hygiene
(`operators/corpus.py`) and dedup (`operators/dedup.py`): a deterministic
global shuffle + concat-and-split sequence packing into fixed-token-budget
shards (the standard LLM pretraining layout: tokenize, concatenate in a
seeded order, split every `budget` tokens), and hash-thresholded
domain-mixture downsampling toward target source weights (the DoReMi /
The-Pile-style mixture step).

The reference pipeline stops at per-record storage (`main.py` process →
vectorize); these operators extend it to the shard-assembly stage the
SURVEY's training-data brief calls for.

Scale notes (100 TB):
- The global token prefix-sum is TWO-LEVEL: a per-bucket running sum
  (hash-bucketed window, fully parallel) plus a bucket-prefix frame of
  `n_buckets` rows (~one row per core) that alone crosses a
  single-partition window. No corpus-sized single-partition window
  exists; the expensive window shuffles once on the bucket key.
- Bucket ranges partition the 60-bit key space in ORDER (`key DIV step`),
  so bucket-major order == global key order; integer DIV keeps boundary
  keys exact where a double divide would round past 2^53.
- The mixture sampler's keep rule is a pure per-row comparison against a
  per-source rate joined in from a source-cardinality-sized broadcast
  frame; no per-row Python, no driver collects.
- Determinism: the shuffle key is md5-derived (not xxhash64) so the
  DuckDB oracle replays it verbatim; every emitted column is an exact
  integer, and the sampling rate is a single long/long IEEE division both
  engines round identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count_col

KEY_BITS = 60                    # 15 hex digits of md5 -> non-negative long
PACK_SEED = "pack-v1"
MIX_SEED = "mix-v1"
SHARD_TOKEN_BUDGET = 512         # test-scale; production = ctx_len * seqs/shard

# Target mixture weights: source "src<i>" gets weight (i % 4 + 1) / 50
# (20 sources, weights sum to 1). The sampled corpus keeps
# MIX_FRAC_NUM/MIX_FRAC_DEN of the input token BUDGET in expectation, so
# per-source keep rate r_s = min(1, w_s * frac * total / count_s).
MIX_WEIGHTS = {f"src{i}": i % 4 + 1 for i in range(20)}
MIX_WEIGHT_DEN = sum(MIX_WEIGHTS.values())
MIX_FRAC_NUM, MIX_FRAC_DEN = 3, 5

# Curriculum bands for stratified packing: token count >= CURR_BANDS[0]
# -> stratum 0 (long/high-signal docs first), >= CURR_BANDS[1] -> 1,
# else 2. Thresholds are module constants so driver SQL generates from
# them.
CURR_BANDS = (200, 50)


def curriculum_stratum_col(n_tokens: F.Column) -> F.Column:
    """Integer curriculum stratum in [0, 3) from an exact token count."""
    return (F.when(n_tokens >= CURR_BANDS[0], F.lit(0))
            .when(n_tokens >= CURR_BANDS[1], F.lit(1))
            .otherwise(F.lit(2)).cast("long"))


def shuffle_key_col(col: F.Column, seed: str) -> F.Column:
    """Seeded deterministic 60-bit shuffle key: first 15 hex digits of
    md5("<seed>:<value>") as a non-negative long. DuckDB replays it as
    ('0x' || substring(md5('<seed>:' || v::VARCHAR), 1, 15))::BIGINT."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + ":"), col.cast("string"))), 1, 15),
        16, 10).cast("long")


def pack_shards(docs: DataFrame, id_col: str, text_col: str,
                budget: int = SHARD_TOKEN_BUDGET, seed: str = PACK_SEED,
                n_buckets: int | None = None,
                strata_col: str | None = None,
                n_strata: int = 1) -> DataFrame:
    """Concat-and-split sequence packing: order documents by a seeded
    hash key (the deterministic global shuffle), lay their token streams
    end-to-end, and cut a shard every `budget` tokens. Emits one row per
    document: (id, n_tokens, start_offset, shard_id, offset_in_shard,
    n_spans) where shard_id is the shard the document STARTS in and
    n_spans counts how many shards its tokens touch (documents may split
    across a shard boundary — the standard pretraining layout).

    Curriculum mode: pass `strata_col` (integer values in [0, n_strata))
    to order strata-major, seeded-key within — the quality-band /
    annealing-phase layout (all stratum-0 tokens pack before any
    stratum-1 tokens, each stratum internally shuffled). Implemented as
    a composite key `stratum << KEY_BITS | key`, so the SAME two-level
    prefix-sum machinery covers both modes; n_strata * 2^60 must stay
    within a signed long, i.e. n_strata <= 7.

    Token counts use the repo-wide BPE-ish regex proxy
    (`text.token_count_col`); swap in `functions/bpe.py` budgets for
    tiktoken fidelity the same way `bpe_chunks` does."""
    sp = docs.sparkSession
    if n_buckets is None:
        n_buckets = max(8, sp.sparkContext.defaultParallelism)
    if not 1 <= n_strata <= 7:
        raise ValueError("n_strata must be in [1, 7] (composite key must "
                         "fit a signed 64-bit long)")
    key = shuffle_key_col(F.col(id_col), seed)
    if strata_col is not None:
        key = (F.col(strata_col).cast("long") * F.lit(1 << KEY_BITS)
               + key)
    keyspace = n_strata << KEY_BITS
    step = -(keyspace // -n_buckets)         # ceil-div: last bucket short
    toks = docs.select(
        F.col(id_col),
        token_count_col(F.col(text_col)).cast("long").alias("n_tokens"),
        key.alias("_key"),
    ).withColumn("_bucket", F.expr(f"_key DIV {step}"))
    # level 1: running sum inside each ordered key-range bucket (parallel)
    w_in = (Window.partitionBy("_bucket").orderBy("_key", id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    toks = toks.withColumn("_cum_in", F.sum("n_tokens").over(w_in))
    # level 2: exclusive prefix over the n_buckets-row totals frame (tiny
    # by construction — the one deliberate single-partition window)
    w_pre = (Window.orderBy("_bucket")
             .rowsBetween(Window.unboundedPreceding, -1))
    bpre = (toks.groupBy("_bucket").agg(F.sum("n_tokens").alias("_btok"))
            .withColumn("_bpre", F.coalesce(F.sum("_btok").over(w_pre),
                                            F.lit(0).cast("long")))
            .select("_bucket", "_bpre"))
    return (toks.join(F.broadcast(bpre), "_bucket")
            .withColumn("start_offset",
                        F.col("_bpre") + F.col("_cum_in") - F.col("n_tokens"))
            .withColumn("shard_id", F.expr(f"start_offset DIV {budget}"))
            .withColumn("offset_in_shard",
                        F.col("start_offset") % F.lit(budget))
            .withColumn("n_spans", F.expr(
                f"greatest(start_offset + n_tokens - 1, start_offset) "
                f"DIV {budget}") - F.col("shard_id") + F.lit(1))
            .select(id_col, "n_tokens", "start_offset", "shard_id",
                    "offset_in_shard", "n_spans"))


def shard_spans(packed: DataFrame, id_col: str,
                budget: int = SHARD_TOKEN_BUDGET) -> DataFrame:
    """Explode `pack_shards` output into the per-(document, shard) span
    manifest a training loader consumes: one row per shard a document's
    tokens touch, with exact in-shard offsets. `span_index` counts the
    document's spans (0 = the shard it starts in); `span_start_in_shard`
    / `span_tokens` delimit the slice inside that shard. Sum of
    span_tokens per document == n_tokens; sum per shard == budget for
    every full shard.

    Pure native exprs (`sequence` -> explode + min/max clamps) — the
    explode fan-out is bounded by ceil(n_tokens/budget) per doc and
    stays a narrow map over the packed frame (no extra shuffle).

    Only the budget-independent packed columns (start_offset, n_tokens)
    are consumed — the shard geometry is re-derived under THIS budget,
    so passing a budget different from the one `pack_shards` used
    cannot produce inconsistent spans (the re-derived first shard is
    definitionally start_offset DIV budget)."""
    b = F.lit(budget)
    start, n = F.col("start_offset"), F.col("n_tokens")
    spans = (packed
             .withColumn("_first", F.expr(f"start_offset DIV {budget}"))
             .withColumn("_last", F.expr(
                 f"greatest(start_offset + n_tokens - 1, start_offset)"
                 f" DIV {budget}"))
             .withColumn("shard", F.explode(
                 F.sequence(F.col("_first"), F.col("_last")))))
    lo = F.greatest(F.col("shard") * b, start)
    hi = F.least((F.col("shard") + 1) * b, start + n)
    return (spans.select(
        id_col,
        F.col("shard").alias("shard_id"),
        (F.col("shard") - F.col("_first")).alias("span_index"),
        (lo - F.col("shard") * b).alias("span_start_in_shard"),
        (hi - lo).alias("span_tokens"))
        # zero-token docs keep their single bookkeeping row (hi==lo)
        .where((F.col("span_tokens") > 0) | (F.col("span_index") == 0)))


def mixture_rates(docs: DataFrame, source_col: str,
                  weights: dict[str, int] | None = None,
                  tokens_col: str | None = None) -> DataFrame:
    """Per-source keep rates toward the target mixture:
    rate_s = min(1, (frac_num * w_num_s * total) /
                    (weight_den * frac_den * count_s)).
    Integer products stay exact longs; ONE long/long division produces
    the double, so Spark and DuckDB compute bit-identical rates. Returns
    (source, n_before, rate).

    `count_s` is the per-source DOCUMENT count by default; pass
    `tokens_col` (an exact integer per-doc token count) to weight the
    mixture by TOKEN mass instead — the DoReMi/Pile convention, where a
    source of few huge documents is downsampled like a source of many
    small ones."""
    weights = MIX_WEIGHTS if weights is None else weights
    weight_den = sum(weights.values())
    sp = docs.sparkSession
    wdf = sp.createDataFrame(sorted(weights.items()),
                             schema=f"{source_col} string, _wnum int")
    mass = (F.count("*") if tokens_col is None
            else F.sum(F.col(tokens_col)))
    counts = docs.groupBy(source_col).agg(
        mass.cast("long").alias("n_before"))
    total = counts.agg(F.sum("n_before").alias("_total"))
    return (counts.crossJoin(F.broadcast(total))
            .join(F.broadcast(wdf), source_col)
            .withColumn("rate", F.least(
                F.lit(1.0),
                (F.lit(MIX_FRAC_NUM) * F.col("_wnum").cast("long")
                 * F.col("_total"))
                / (F.lit(weight_den * MIX_FRAC_DEN) * F.col("n_before"))))
            .select(source_col, "n_before", "rate"))


def mixture_sample(docs: DataFrame, id_col: str, source_col: str,
                   weights: dict[str, int] | None = None,
                   seed: str = MIX_SEED,
                   tokens_col: str | None = None) -> DataFrame:
    """Deterministic domain-mixture downsampling: keep a row iff its
    seeded hash fraction u = key/2^60 falls below its source's rate.
    Sources absent from the weight table are dropped (weight 0). Adds a
    boolean `kept` column; callers filter or account on it. With
    `tokens_col`, rates target the token-mass mixture (see
    mixture_rates) while the keep decision stays per-document."""
    rates = mixture_rates(docs, source_col, weights, tokens_col=tokens_col)
    u = shuffle_key_col(F.col(id_col), seed) / F.lit(float(1 << KEY_BITS))
    return (docs.join(F.broadcast(rates.select(source_col, "rate")),
                      source_col)
            .withColumn("kept", u < F.col("rate")))


STRAT_SEED = "strat-v1"


def stratified_sample(df: DataFrame, strata_cols: list[str], k: int,
                      id_col: str, seed: str = STRAT_SEED) -> DataFrame:
    """Deterministic uniform k-per-stratum sample: rank every row within
    its stratum by the seeded md5-60bit hash of its id (a fixed random
    permutation of each stratum) and keep the k smallest, ties broken by
    id. One shuffle on the strata key; the LITERAL rank bound lets
    Catalyst insert WindowGroupLimit (per-partition partial top-k BEFORE
    the window shuffle), so each map task forwards at most k rows per
    stratum — the distributed-reservoir property expressed as a plan
    shape. The hash replays verbatim in DuckDB, so the sampled id set is
    engine-exact, unlike rand()-based sampling."""
    key = shuffle_key_col(F.col(id_col), seed)
    w = Window.partitionBy(*strata_cols).orderBy(key.asc(),
                                                F.col(id_col).asc())
    return (df.withColumn("sample_rank", F.row_number().over(w))
            .where(F.col("sample_rank") <= F.lit(int(k))))
