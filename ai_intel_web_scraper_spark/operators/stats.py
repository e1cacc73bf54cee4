"""Aggregation / status operators (SURVEY P10, P11, P15, R7)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_stats(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """SURVEY P15: per-(segment, status) record counts + value sums —
    broadcast the small dim, partial-agg before the shuffle (Catalyst)."""
    return (orders.join(F.broadcast(customer.select("c_custkey", "c_mktsegment")),
                        orders["o_custkey"] == customer["c_custkey"])
            .groupBy("c_mktsegment", "o_orderstatus")
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 4).alias("total_price"),
                 F.round(F.avg("o_totalprice"), 4).alias("avg_price")))


def cube_stats(orders: DataFrame) -> DataFrame:
    """SURVEY P15 multi-dim breakdown (reference store.py:290-305) as a
    native CUBE (all 4 grouping-set combinations in one shuffle)."""
    return (orders.cube("o_orderpriority", "o_orderstatus")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("o_totalprice"), 4).alias("total_price")))


def source_status(documents: DataFrame) -> DataFrame:
    """Reference `pipeline.py status` analog: per-source record counts and
    size stats (pipeline.py:358-414)."""
    return (documents.groupBy("source", "lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 F.round(F.avg("n_chars"), 4).alias("avg_chars")))


QUANTILES_PCT = (50, 90, 99)


def group_quantiles(df: DataFrame, group_cols: list[str], val_col: str,
                    qs: tuple[int, ...] = QUANTILES_PCT) -> DataFrame:
    """Exact discrete quantiles per group — percentile_disc semantics:
    the element at rank ceil(q*n/100), found by one rank window plus an
    integer rank-arithmetic filter ((q*n + 99) DIV 100). No
    interpolation, so every emitted value is a real data point and the
    result is integer-exact across engines; tie order within equal values
    cannot change the selected VALUE. One shuffle on the group key; the
    tiny percentile frame joins broadcast. (Spark's approx_percentile is
    the production shortcut at extreme group counts, but its GK-sketch
    output is neither exact nor reproducible in a second engine.)"""
    spark = df.sparkSession
    qdf = spark.createDataFrame([(int(q),) for q in qs], "q int")
    w = Window.partitionBy(*group_cols).orderBy(F.col(val_col).asc())
    ranked = (df.select(*group_cols, val_col)
              .withColumn("rn", F.row_number().over(w))
              .withColumn("n", F.count("*").over(
                  Window.partitionBy(*group_cols))))
    return (ranked.join(F.broadcast(qdf))
            .where(F.col("rn") == F.expr("(q * n + 99) DIV 100"))
            .select(*group_cols, "q", F.col(val_col).alias("value")))
