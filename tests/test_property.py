"""Property-based engine parity (hypothesis).

Beyond the fixed oracle queries: for randomized filter predicates and
aggregation choices over orders, the Spark DataFrame result must equal
DuckDB running the equivalent SQL. This probes the predicate/cast
surface at points no hand-written query pins — boundary thresholds,
empty results, combined conjunctions.

Examples are capped (Spark job per example) and deadline-disabled:
correctness, not latency, is under test.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

STATUSES = ["F", "O", "P"]
PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]


def _orders(spark):
    from parquet_playground_spark.tables import load_table

    return load_table(spark, SF_DIR, "orders")


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    threshold=st.floats(
        min_value=0.0, max_value=70000.0, allow_nan=False, allow_infinity=False
    ),
    status=st.sampled_from(STATUSES),
    strict=st.booleans(),
)
def test_filter_count_parity(spark, oracle_con, threshold, status, strict):
    op = ">" if strict else ">="
    spark_n = (
        _orders(spark)
        .filter(
            (
                F.col("o_totalprice") > threshold
                if strict
                else F.col("o_totalprice") >= threshold
            )
            & (F.col("o_orderstatus") == status)
        )
        .count()
    )
    duck_n = oracle_con.sql(
        f"SELECT count(*) FROM orders "
        f"WHERE o_totalprice {op} {threshold!r} AND o_orderstatus = '{status}'"
    ).fetchone()[0]
    assert spark_n == duck_n


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lo=st.integers(min_value=1, max_value=14000),
    width=st.integers(min_value=0, max_value=2000),
    priority=st.sampled_from(PRIORITIES),
)
def test_group_sum_parity(spark, oracle_con, lo, width, priority):
    hi = lo + width
    row = (
        _orders(spark)
        .filter(
            F.col("o_orderkey").between(lo, hi)
            & (F.col("o_orderpriority") == priority)
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("s"),
        )
        .collect()[0]
    )
    duck = oracle_con.sql(
        f"SELECT count(*), round(sum(o_totalprice), 2) FROM orders "
        f"WHERE o_orderkey BETWEEN {lo} AND {hi} "
        f"AND o_orderpriority = '{priority}'"
    ).fetchone()
    assert row["n"] == duck[0]
    assert (row["s"] is None) == (duck[1] is None)
    if row["s"] is not None:
        assert abs(row["s"] - duck[1]) < 1e-6
