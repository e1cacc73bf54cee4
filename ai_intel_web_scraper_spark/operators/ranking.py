"""Ranking / windowed-budget operators (SURVEY C8/C9, P12, R3, R4, R6)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60  # reference webapp/rag/retriever.py:222-255


def dot_col(vec_col: str, query: list[float]) -> Column:
    """Dot product of an array<float> column with a literal query vector,
    accumulated in double — native higher-order aggregate, no UDF."""
    q = F.array(*[F.lit(float(x)) for x in query])
    return F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), q, lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)


def norm_col(vec_col: str) -> Column:
    return F.sqrt(F.aggregate(
        F.col(vec_col).cast("array<double>"),
        F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_col(vec_col: str, query: list[float]) -> Column:
    import math
    qn = math.sqrt(sum(x * x for x in query)) or 1.0
    return dot_col(vec_col, query) / (norm_col(vec_col) * F.lit(qn))


def topk_by_score(df: DataFrame, score: Column, k: int,
                  id_col: str = "vec_id") -> DataFrame:
    """SURVEY R4: global top-k — Catalyst compiles orderBy+limit to
    TakeOrderedAndProject (per-partition heap + driver merge, no full sort)."""
    return (df.select(F.col(id_col), F.round(score, 6).alias("score"))
            .orderBy(F.desc("score"), F.asc(id_col)).limit(k))


def rrf_fuse(result_sets: list[DataFrame], id_col: str,
             score_col: str = "score", k: int = 20) -> DataFrame:
    """SURVEY R3: Reciprocal Rank Fusion across result sets.
    rank within each set by score desc (tie-break id), fused score =
    sum over sets of 1/(RRF_K + rank); top-k by fused score."""
    tagged = None
    for i, df in enumerate(result_sets):
        t = df.select(F.col(id_col), F.col(score_col),
                      F.lit(i).alias("query_set_id"))
        tagged = t if tagged is None else tagged.unionByName(t)
    w = Window.partitionBy("query_set_id").orderBy(
        F.desc(score_col), F.asc(id_col))
    ranked = tagged.withColumn("rank", F.row_number().over(w))
    return (ranked.groupBy(id_col)
            .agg(F.round(F.sum(1.0 / (F.lit(RRF_K) + F.col("rank"))), 6)
                 .alias("rrf_score"))
            .orderBy(F.desc("rrf_score"), F.asc(id_col)).limit(k))


def budget_prefix_filter(df: DataFrame, part_cols: list[str],
                         order_cols: list[Column], amount: Column,
                         budget: float) -> DataFrame:
    """SURVEY P12: running-total prefix under a budget — keep rows while the
    cumulative amount (inclusive) stays <= budget, in the given order
    (reference generators/comparison_generator.py:266-299 char budget)."""
    w = (Window.partitionBy(*part_cols).orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (df.withColumn("_run", F.sum(amount).over(w))
            .where(F.col("_run") <= budget).drop("_run"))


def history_compaction(df: DataFrame, part_cols: list[str], ts_col: str,
                       amount: Column, budget: float) -> DataFrame:
    """SURVEY R6: newest-first token-budgeted prefix
    (reference webapp/rag/query_engine.py:685-744)."""
    return budget_prefix_filter(df, part_cols, [F.col(ts_col).desc()],
                                amount, budget)


def quota_window(df: DataFrame, part_cols: list[str],
                 order_cols: list[Column], quota: int) -> DataFrame:
    """SURVEY C8/C9: per-group top-quota rows. The rank<=k filter compiles to
    WindowGroupLimit (partial per-partition limit before the shuffle)."""
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return (df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= quota).drop("_rn"))
