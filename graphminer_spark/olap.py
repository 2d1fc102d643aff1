"""Relational OLAP surface demos over the TPC-H-ish tables.

The reference has no SQL layer (SURVEY §2.6) — on Spark these come
free; exposing a few canonical shapes (rollup/grouping-sets, window
top-k per group, pivot) keeps that surface tested against DuckDB.
Money amounts are rendered at fixed precision for engine-exact
comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def revenue_rollup(lineitem: DataFrame) -> DataFrame:
    """ROLLUP(returnflag, linestatus): sum qty + revenue with subtotal
    and grand-total rows → ``(l_returnflag, l_linestatus, sum_qty,
    revenue_s)``."""
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.format_string(
                "%.2f",
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            ).alias("revenue_s"),
        )
    )


def top_parts_per_supplier(lineitem: DataFrame, k: int = 3) -> DataFrame:
    """Top-k parts by shipped quantity per supplier →
    ``(l_suppkey, l_partkey, qty, rank)``; deterministic tie-break by
    part key."""
    agg = lineitem.groupBy("l_suppkey", "l_partkey").agg(
        F.sum("l_quantity").cast("long").alias("qty")
    )
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("qty").desc(), F.col("l_partkey")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def order_status_pivot(orders: DataFrame) -> DataFrame:
    """Orders per priority pivoted by status →
    ``(o_orderpriority, n_O, n_F, n_P)``."""
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce("O", F.lit(0)).alias("n_O"),
            F.coalesce("F", F.lit(0)).alias("n_F"),
            F.coalesce("P", F.lit(0)).alias("n_P"),
        )
    )


def revenue_cube(lineitem: DataFrame) -> DataFrame:
    """CUBE(returnflag, linestatus): the full grouping-set lattice
    (both one-dimension margins, unlike ROLLUP's prefix chain) →
    same output shape as :func:`revenue_rollup`."""
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.format_string(
                "%.2f",
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            ).alias("revenue_s"),
        )
    )
