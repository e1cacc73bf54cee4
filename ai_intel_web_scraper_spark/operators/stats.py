"""Aggregation / status operators (SURVEY P10, P11, P15, R7)."""

from __future__ import annotations

from pyspark.sql import DataFrame
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
