"""Category G — set operations."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_playground_spark.registry import register
from parquet_playground_spark.tables import load_table


def _buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 35000)
        .select(F.col("o_custkey").alias("custkey"))
    )


def _building(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )


_BUYERS_SQL = "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 35000"
_BUILDING_SQL = (
    "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
)


@register(
    "set_union_all",
    oracle=f"SELECT custkey FROM (({_BUYERS_SQL}) UNION ALL ({_BUILDING_SQL}))",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — pure narrow op, no shuffle at any scale."""
    return _buyers(spark, sf_dir).unionAll(_building(spark, sf_dir))


@register(
    "set_union_distinct",
    oracle=f"SELECT custkey FROM (({_BUYERS_SQL}) UNION ({_BUILDING_SQL}))",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _buyers(spark, sf_dir).union(_building(spark, sf_dir)).distinct()


@register(
    "set_intersect",
    oracle=f"({_BUYERS_SQL}) INTERSECT ({_BUILDING_SQL})",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _buyers(spark, sf_dir).intersect(_building(spark, sf_dir))


_BIG_BUYERS_SQL = (
    "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 350000"
)


@register(
    "set_except",
    oracle=f"({_BUILDING_SQL}) EXCEPT ({_BIG_BUYERS_SQL})",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT against a selective right side (the >35000 buyer set covers
    every BUILDING customer at sf0.01, which made the result vacuously
    empty; >350000 leaves a non-empty difference)."""
    big_buyers = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 350000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return _building(spark, sf_dir).subtract(big_buyers)


@register(
    "set_intersect_all",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics INTERSECT ALL: a customer appearing m times among
    open orders and n times among finished ones appears min(m, n)
    times — the multiplicity-preserving sibling of set_intersect
    (which dedups). Spark plans it as a count-compare aggregate join,
    one shuffle per side; no distinct pre-pass."""
    o = load_table(spark, sf_dir, "orders")
    open_side = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin_side = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_side.intersectAll(fin_side)


@register(
    "set_except_all",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics difference (exceptAll): each customer key keeps
    max(0, open_count - finished_count) copies — the multiset algebra
    LIMIT/retry reconciliation pipelines need (set_except's DISTINCT
    semantics would collapse the multiplicities). Plans as a single
    hash shuffle per side with a count-diff generate, not a sort."""
    o = load_table(spark, sf_dir, "orders")
    open_side = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin_side = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_side.exceptAll(fin_side)
