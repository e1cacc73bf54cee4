"""Streaming-sketch operators for web-scale cardinality and frequency:
HyperLogLog registers (Flajolet et al. 2007, "HyperLogLog: the analysis of
a near-optimal cardinality estimation algorithm") and count-min sketch
heavy hitters (Cormode & Muthukrishnan 2005, "An improved data stream
summary: the count-min sketch and its applications").

Why these belong in a crawl/training-data engine: at 10^10 URLs the
questions "how many distinct shingles/URLs/hosts have we seen" and "which
keys are the heavy hitters" cannot afford exact distinct/groupBy state —
the sketch state is constant-size (256 registers / a 4x256 counter grid),
merges associatively across partitions, and every per-row step here is a
native JVM expression (md5 -> 60-bit int -> shift/mod), no UDFs at all.

The reference has no sketches (its scale never needs them:
`pipeline.py:358-414` counts statuses exactly); these extend the engine
per the large-scale-pipeline mandate. Spark's own approx_count_distinct
is the production shortcut, but its HLL++ register layout is not
reproducible in a second engine — this implementation is deliberately
plain HLL over the repo's md5-60bit hash convention so DuckDB replays
every register bit-for-bit (`('0x' || substring(md5(..), 1, 15))::BIGINT`,
see `packing.shuffle_key_col`).

Determinism contract: every emitted value is an integer (register maxima,
integer numerator in 2^-53 units, floor()ed estimate, exact counts) so
cross-engine hashing never touches a float. The one double intermediate
(alpha * m^2 * 2^53 / numer) divides identical inputs in both engines and
is floor()ed, which is unambiguous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .packing import shuffle_key_col

# --- HyperLogLog -----------------------------------------------------------
HLL_P = 8                    # 2^8 = 256 registers: ~1.04/sqrt(m) = 6.5% rse
HLL_M = 1 << HLL_P
HLL_HASH_BITS = 60           # the repo-wide md5-60bit hash convention
HLL_REST_BITS = HLL_HASH_BITS - HLL_P          # 52 rank bits
HLL_REST_MOD = 1 << HLL_REST_BITS
HLL_RHO_MAX = HLL_REST_BITS + 1                # rest == 0 -> rho = 53
HLL_SEED = "hll1"
# alpha_256 = 0.7213 / (1 + 1.079/m) (Flajolet et al. 2007, fig. 3)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# numerator fixed-point scale: sum over registers of 2^(RHO_MAX - rho)
# is the harmonic denominator scaled by 2^RHO_MAX — max 256 * 2^53 < 2^62,
# exact in a long, and turns the float harmonic mean into integer math.
HLL_NUMER_SCALE = 1 << HLL_RHO_MAX


def hll_cols(key, seed: str = HLL_SEED):
    """(bucket, rho) expressions for one key: bucket = top HLL_P bits of
    the 60-bit md5 hash, rho = leading-zero rank of the remaining 52 bits
    (bit-length via base-2 string length — conv/bin agree across engines
    on minimal, unpadded representations of non-negative longs)."""
    h = shuffle_key_col(key, seed)
    rest = F.pmod(h, F.lit(HLL_REST_MOD))
    rho = (F.when(rest == 0, F.lit(HLL_RHO_MAX))
           .otherwise(F.lit(HLL_RHO_MAX)
                      - F.length(F.conv(rest.cast("string"), 10, 2))))
    return (F.shiftright(h, HLL_REST_BITS).cast("int"), rho.cast("int"))


def hll_registers(keys: DataFrame, key_col: str,
                  seed: str = HLL_SEED) -> DataFrame:
    """(bucket, max_rho) HLL register table for a key column.
    groupBy(bucket).max is a 256-group aggregate with map-side partials —
    the shuffle carries at most m rows per partition regardless of input
    size (the whole point of the sketch)."""
    bucket, rho = hll_cols(F.col(key_col), seed)
    return (keys.select(bucket.alias("bucket"), rho.alias("rho"))
            .groupBy("bucket").agg(F.max("rho").alias("max_rho")))


def hll_cardinality(keys: DataFrame, key_col: str,
                    seed: str = HLL_SEED,
                    with_exact: bool = True) -> DataFrame:
    """One-row HLL cardinality summary: (m, n_nonempty, numer, est_card
    [, exact_distinct]). `numer` is the integer harmonic denominator in
    2^-53 units (empty registers contribute 2^53 each); est_card is the
    floor()ed raw HLL estimate alpha_m * m^2 / (numer / 2^53).

    The raw estimate is emitted WITHOUT the small-range linear-counting
    correction: ln() is not bit-reproducible across engines, so the
    correction belongs to the consumer (see `hll_estimate` for the full
    client-side rule). `with_exact` joins in the exact distinct count for
    accuracy evaluation — only sane at test scale; at 10^10 keys the
    register table IS the product."""
    if with_exact:
        # registers are duplicate-invariant (per-bucket MAX), so both the
        # sketch and the exact count derive from ONE distinct-hash pass —
        # without this the key explode + md5 hashing (the dominant per-row
        # work) ran twice, once per branch; the shared Exchange under the
        # distinct is reused across the two consumers (r6)
        # persist: the two consumers below are separate aggregation
        # branches and Catalyst does not reuse the distinct's exchange
        # across them (verified in the r6 plan) — cache the ~8B/row
        # distinct hash set instead of exploding + hashing twice
        hashed = (keys.select(shuffle_key_col(F.col(key_col), seed)
                              .alias("_h")).distinct().persist())
        rest = F.pmod(F.col("_h"), F.lit(HLL_REST_MOD))
        rho = (F.when(rest == 0, F.lit(HLL_RHO_MAX))
               .otherwise(F.lit(HLL_RHO_MAX)
                          - F.length(F.conv(rest.cast("string"), 10, 2))))
        regs = (hashed.select(F.shiftright("_h", HLL_REST_BITS).cast("int")
                              .alias("bucket"), rho.cast("int").alias("rho"))
                .groupBy("bucket").agg(F.max("rho").alias("max_rho")))
        exact = hashed.agg(F.count("*").alias("exact_distinct"))
    else:
        regs = hll_registers(keys, key_col, seed)
    part = regs.agg(
        F.count("*").cast("long").alias("n_nonempty"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {HLL_RHO_MAX} - max_rho)"))
        .alias("part_numer"))
    numer = (F.col("part_numer")
             + (F.lit(HLL_M) - F.col("n_nonempty"))
             * F.lit(HLL_NUMER_SCALE))
    est = F.floor(F.lit(HLL_ALPHA) * F.lit(float(HLL_M * HLL_M))
                  * F.lit(float(HLL_NUMER_SCALE)) / numer)
    out = part.select(F.lit(HLL_M).cast("long").alias("m"),
                      F.col("n_nonempty"),
                      numer.cast("long").alias("numer"),
                      est.cast("long").alias("est_card"))
    if with_exact:
        out = out.crossJoin(exact)
    return out


def hll_estimate(n_nonempty: int, numer: int, m: int = HLL_M) -> float:
    """Client-side full HLL estimate from the emitted integer state,
    including the small-range linear-counting correction the engine query
    deliberately leaves out (ln() is not cross-engine reproducible)."""
    import math
    raw = HLL_ALPHA * m * m * HLL_NUMER_SCALE / numer
    zeros = m - n_nonempty
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return raw


# --- Count-min sketch ------------------------------------------------------
CMS_DEPTH = 4                # P(overestimate > 2N/w) <= (1/2)^4 per key
CMS_WIDTH = 256
CMS_SEED = "cms"


def _cms_bucket(depth_col, key_col) -> F.Column:
    """Row `d`'s hash bucket for a key: md5("cms:<d>:<key>") % width —
    one independent hash function per sketch row via the depth salt."""
    h = shuffle_key_col(F.concat_ws(":", depth_col, key_col), CMS_SEED)
    return F.pmod(h, F.lit(CMS_WIDTH)).cast("int")


def cms_registers(counts: DataFrame, key_col: str,
                  cnt_col: str = "cnt") -> DataFrame:
    """(d, bucket, reg_cnt) count-min grid from pre-aggregated (key, cnt)
    rows. Building from the aggregated counts (not raw occurrences) keeps
    the explode factor at depth x distinct-keys; the grid itself is a
    constant DEPTH*WIDTH rows and merges across partitions by addition."""
    rows = counts.select(
        F.col(key_col).alias("k"), F.col(cnt_col).alias("c"),
        F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d"))
    return (rows.withColumn("bucket", _cms_bucket(F.col("d"), F.col("k")))
            .groupBy("d", "bucket")
            .agg(F.sum("c").alias("reg_cnt")))


def cms_estimates(regs: DataFrame, keys: DataFrame,
                  key_col: str) -> DataFrame:
    """Point-query the sketch for each key: est = min over rows d of
    grid[d][hash_d(key)] — always >= the true count (counters only ever
    overcount on collisions). Broadcast the constant-size grid.

    LEFT join + coalesce(0): a key hashing into a (d, bucket) cell the
    grid never touched has a zero counter there, so that depth's vote is
    0 (and a key absent from every cell estimates 0) — an inner join
    would silently drop the empty cell and overestimate."""
    probes = (keys.select(F.col(key_col).alias("k"))
              .withColumn("d", F.explode(
                  F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))))
              .withColumn("bucket", _cms_bucket(F.col("d"), F.col("k"))))
    return (probes.join(F.broadcast(regs), ["d", "bucket"], "left")
            .groupBy("k")
            .agg(F.min(F.coalesce(F.col("reg_cnt"), F.lit(0)))
                 .alias("cms_est"))
            .select(F.col("k").alias(key_col), "cms_est"))


def cms_heavy_hitters(items: DataFrame, key_col: str,
                      k: int = 10) -> DataFrame:
    """Top-k keys by exact count, annotated with the count-min estimate:
    (key, exact_cnt, cms_est). cms_est >= exact_cnt always; at true scale
    the exact side disappears and candidate heavy hitters stream through
    `cms_estimates` alone — here the exact column IS the accuracy check."""
    counts = (items.groupBy(key_col)
              .agg(F.count("*").alias("exact_cnt")))
    regs = cms_registers(counts, key_col, "exact_cnt")
    top = (counts.orderBy(F.desc("exact_cnt"), F.asc(key_col)).limit(k))
    return (top.join(cms_estimates(regs, top, key_col), key_col)
            .select(key_col, "exact_cnt", "cms_est")
            .orderBy(F.desc("exact_cnt"), F.asc(key_col)))
