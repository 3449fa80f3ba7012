"""Category E — window functions.

Every window has PARTITION BY + a deterministic ORDER BY including a
unique tie-break key (SURVEY §7.3 rule 4). Window exec = one shuffle on
the partition key then in-partition sort; partition keys chosen with
SF-proportional cardinality so no single partition explodes at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_playground_spark.registry import register
from parquet_playground_spark.tables import load_table


@register(
    "window_row_number",
    oracle="""
        SELECT o_custkey, o_orderkey,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
               ) AS rn
        FROM orders
    """,
)
def window_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey", F.row_number().over(w).alias("rn")
    )


@register(
    "window_rank_dense",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               rank() OVER (
                   PARTITION BY l_returnflag ORDER BY l_quantity
               ) AS rnk,
               dense_rank() OVER (
                   PARTITION BY l_returnflag ORDER BY l_quantity
               ) AS drnk
        FROM lineitem
        WHERE l_orderkey <= 400
    """,
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 400)
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "window_lag_lead",
    oracle="""
        SELECT o_custkey, o_orderkey,
               round(lag(o_totalprice, 1, 0.0) OVER w, 4) AS prev_price,
               round(lead(o_totalprice, 2) OVER w, 4) AS next2_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.lag("o_totalprice", 1, 0.0).over(w), 4).alias("prev_price"),
        F.round(F.lead("o_totalprice", 2).over(w), 4).alias("next2_price"),
    )


@register(
    "window_running_sum",
    oracle="""
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 4) AS running_spend
        FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 4).alias("running_spend"),
    )


@register(
    "window_moving_avg",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(floor(CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5)
                                        AS BIGINT)) OVER w AS DOUBLE)
                          / count(*) OVER w / 100.0 * 10000.0 + 0.5)
                    AS DOUBLE) / 10000.0 AS avg3
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # avg over the frame as exact cents (q1 avg pattern, r8 VERDICT
    # item 2): the 2dp price integerizes exactly, the frame sum is an
    # integer add, and the average is one identical IEEE division +
    # portable floor on both engines instead of engine round(avg(..)).
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")
    return o.select(
        "o_custkey",
        "o_orderkey",
        (
            F.floor(
                F.sum(cents).over(w).cast("double")
                / F.count(F.lit(1)).over(w)
                / 100.0
                * 10000.0
                + 0.5
            ).cast("double")
            / 10000.0
        ).alias("avg3"),
    )


@register(
    "window_range_frame",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity,
               round(sum(l_extendedprice) OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_quantity
                   RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
               ), 4) AS near_qty_price
        FROM lineitem
        WHERE l_orderkey <= 400
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 400)
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rangeBetween(-1, 1)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.round(F.sum("l_extendedprice").over(w), 4).alias("near_qty_price"),
    )


@register(
    "window_ntile_firstlast",
    oracle="""
        SELECT o_custkey, o_orderkey,
               ntile(4) OVER w AS quartile,
               round(first_value(o_totalprice) OVER w, 4) AS first_price,
               round(last_value(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ), 4) AS final_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_ntile_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.first("o_totalprice").over(w), 4).alias("first_price"),
        F.round(F.last("o_totalprice").over(w_full), 4).alias("final_price"),
    )


@register(
    "window_cume_percent",
    oracle="""
        SELECT c_custkey, c_nationkey,
               floor(cume_dist() OVER w * 10000.0 + 0.5) / 10000.0 AS cd,
               floor(percent_rank() OVER w * 10000.0 + 0.5) / 10000.0 AS pr
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def window_cume_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist/percent_rank per nation ordered by account balance
    (unique c_custkey tie-break keeps both engines' orderings
    identical, §7.3 rule 5). Rounding is the portable floor form
    (§7.3 rule 1b): at sf1 a rank/n ratio landed exactly on a .xxxx5
    shortest-repr boundary where Spark's BigDecimal.valueOf round and
    DuckDB's binary-value round disagree by one ulp of the grid."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        (F.floor(F.cume_dist().over(w) * 10000.0 + 0.5) / 10000.0).alias(
            "cd"
        ),
        (F.floor(F.percent_rank().over(w) * 10000.0 + 0.5) / 10000.0).alias(
            "pr"
        ),
    )


@register(
    "window_nth_first_ignore",
    oracle="""
        SELECT c_custkey, c_nationkey,
               nth_value(c_name, 2) OVER (
                   PARTITION BY c_nationkey ORDER BY c_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS second_name,
               first_value(CASE WHEN c_acctbal > 5000 THEN round(c_acctbal, 4)
                           END IGNORE NULLS) OVER (
                   PARTITION BY c_nationkey ORDER BY c_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS first_big_bal
        FROM customer
    """,
)
def window_nth_first_ignore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over the full partition frame plus a running
    first_value(... IGNORE NULLS) — the 'first qualifying event so
    far' pattern. Both engines share frame and null-skipping
    semantics; order is made total by the unique c_custkey."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    full = (
        Window.partitionBy("c_nationkey")
        .orderBy("c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    running = (
        Window.partitionBy("c_nationkey")
        .orderBy("c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    big = F.when(F.col("c_acctbal") > 5000, F.round(F.col("c_acctbal"), 4))
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.nth_value("c_name", 2).over(full).alias("second_name"),
        F.first(big, ignorenulls=True).over(running).alias("first_big_bal"),
    )


@register(
    "window_rolling_median",
    oracle="""
        SELECT event_id, user_id,
               round(median(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
               ), 4) AS med5
        FROM events
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median over the trailing 5 events per user — the robust
    smoother that rolling averages can't give you (one spiked reading
    shifts a mean by spike/5 but leaves the median untouched).

    Spark refuses median() with a window FRAME
    (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the frame is
    materialized as a bounded collect_list (<=5 doubles — constant
    state at any scale, same pattern as ts_ewma_bounded's ordered
    fold), sorted JVM-side, and the midpoint taken with the standard
    even-count interpolation DuckDB's windowed median() applies.
    Tie-broken ordering (ts, event_id) keeps frame membership
    engine-identical."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    med = F.when(
        n % 2 == 1, F.element_at(arr, (n / 2).cast("int") + 1)
    ).otherwise(
        (
            F.element_at(arr, (n / 2).cast("int"))
            + F.element_at(arr, (n / 2).cast("int") + 1)
        )
        / 2.0
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(med, 4).alias("med5"),
    )
