"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (TPC-H-Q1-style pricing summary) at
                sf0.001; driver smoke-checks rows > 0.
queries()     — every implemented operator from SURVEY.md §2.3, keyed
                by the §2.3 query name; callables (spark, sf_dir) ->
                DataFrame.
oracle_sql()  — DuckDB-equivalent SQL per key (omitted for
                approximate / streaming-semantic / stub-backed ops,
                which get rows-only checks).

All definitions live in parquet_playground_spark; this file is a thin
re-export so the registry stays importable as a library.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from parquet_playground_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry.load_all()
    return registry.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry.load_all()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    registry.load_all()
    return dict(registry.ORACLES)
