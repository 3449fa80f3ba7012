"""Time-series operators over the events table: gap-filled minute
spine with zero-fill + LOCF, and hypertable-style multi-resolution
rollup.

These are the batch halves of the streaming window queries
(streaming/stream_queries.py): same 1-minute buckets, but with an
explicit dense spine so downstream consumers (forecasting, rate
alerting) see every bucket even when no events arrived.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_playground_spark.registry import register
from parquet_playground_spark.tables import load_table


@register(
    "ts_gapfill_locf",
    oracle="""
        WITH per_min AS (
            SELECT date_trunc('minute', ts) AS minute,
                   count(*) AS cnt,
                   round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1
        ),
        bounds AS (SELECT min(minute) AS mn, max(minute) AS mx FROM per_min),
        spine AS (
            SELECT unnest(generate_series(mn, mx, INTERVAL 1 MINUTE)) AS minute
            FROM bounds
        ),
        joined AS (
            SELECT s.minute, coalesce(p.cnt, 0) AS cnt, p.sum_value
            FROM spine s LEFT JOIN per_min p USING (minute)
        )
        SELECT minute, cnt,
               last_value(sum_value IGNORE NULLS) OVER (
                   ORDER BY minute
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sum_value_locf
        FROM joined
    """,
)
def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense minute spine via sequence()+explode, counts zero-filled,
    last-observation-carried-forward for the value column.

    Scale shape: the spine is generated from two scalars (min/max), so
    it never shuffles the fact table; the LOCF runs partitioned by day
    (bounded partitions at any scale) and day-boundary carry-in comes
    from a tiny per-day aggregate (|days| rows) LOCF'd on the driver-
    sized side and broadcast back — no global single-partition sort of
    the spine."""
    e = load_table(spark, sf_dir, "events")
    per_min = e.groupBy(F.date_trunc("minute", "ts").alias("minute")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
    bounds = per_min.agg(
        F.min("minute").alias("mn"), F.max("minute").alias("mx")
    )
    spine = bounds.select(
        F.explode(
            F.sequence("mn", "mx", F.expr("interval 1 minute"))
        ).alias("minute")
    )
    joined = (
        spine.join(per_min, "minute", "left")
        .withColumn("day", F.date_trunc("day", "minute"))
    )
    # Pass 1: LOCF within each day (bounded partition size: 1440 rows).
    w_day = (
        Window.partitionBy("day")
        .orderBy("minute")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the DAG forks below (day_last + final join both consume intra);
    # persist so the scan→agg→spine-join→window subtree runs once
    intra = joined.withColumn(
        "locf_intra", F.last("sum_value", ignorenulls=True).over(w_day)
    ).persist()
    # Pass 2: carry across day boundaries via a |days|-row aggregate:
    # each day's carry-in is the last non-null value of any PRIOR day.
    day_last = (
        intra.groupBy("day")
        .agg(F.max_by("locf_intra", "minute").alias("day_last"))
    )
    w_days = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = day_last.select(
        "day", F.last("day_last", ignorenulls=True).over(w_days).alias("carry_in")
    )
    return (
        intra.join(F.broadcast(carry), "day", "left")
        .select(
            "minute",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
            F.coalesce("locf_intra", "carry_in").alias("sum_value_locf"),
        )
    )


@register(
    "ts_rollup_multires",
    oracle="""
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               date_trunc('hour', ts) AS hour,
               count(*) AS cnt,
               round(sum(value), 4) AS sum_value
        FROM events
        GROUP BY ROLLUP (CAST(date_trunc('day', ts) AS DATE),
                         date_trunc('hour', ts))
    """,
)
def ts_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: one pass produces
    hourly, daily, and grand-total resolutions via ROLLUP grouping
    sets. Catalyst's Expand keeps it a single shuffle; partial
    aggregation is map-side combined, so the shuffle carries
    |hours|+|days|+1 rows per mapper, not events."""
    e = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        "value",
    )
    return e.rollup("day", "hour").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


@register(
    "ts_window_time_range",
    oracle="""
        SELECT event_id, user_id,
               round(sum(value) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(epoch(date_trunc('second', ts)) AS BIGINT)
                   RANGE BETWEEN 7200 PRECEDING AND CURRENT ROW
               ), 4) AS sum_2h
        FROM events
    """,
)
def ts_window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per-user rolling 2-hour sum. The frame
    is defined on epoch seconds so Spark's rangeBetween and the
    oracle's RANGE PRECEDING agree exactly (sub-second precision is
    truncated identically on both sides). One shuffle on user_id;
    frames never cross partitions, so it scales with users."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-7200, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("sum_2h"),
    )


@register(
    "ts_anomaly_zscore",
    oracle="""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   count(*) AS cnt
            FROM events GROUP BY 1, 2
        ),
        scored AS (
            SELECT event_type, hour, cnt,
                   avg(cnt) OVER w AS mu,
                   stddev_samp(cnt) OVER w AS sigma
            FROM hourly
            WINDOW w AS (
                PARTITION BY event_type ORDER BY hour
                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING
            )
        )
        SELECT event_type, hour, cnt,
               CAST(CAST(round((cnt - mu) / sigma, 4) AS DECIMAL(18,4))
                    AS VARCHAR) AS z,
               (cnt - mu) / sigma > 2.0 AS is_spike
        FROM scored
        WHERE sigma IS NOT NULL AND sigma > 0
    """,
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each hour's event count per
    type scored against the trailing 24-hour window (excluding the
    current hour — no self-leak). One shuffle on event_type; trailing
    frames are bounded, so state per partition is 24 rows at any
    scale. The z value uses the fixed-decimal string canon for
    cross-engine float parity."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-24, -1)
    )
    scored = hourly.select(
        "event_type",
        "hour",
        "cnt",
        F.avg("cnt").over(w).alias("mu"),
        F.stddev_samp("cnt").over(w).alias("sigma"),
    )
    z = (F.col("cnt") - F.col("mu")) / F.col("sigma")
    return scored.filter(
        F.col("sigma").isNotNull() & (F.col("sigma") > 0)
    ).select(
        "event_type",
        "hour",
        "cnt",
        F.round(z, 4).cast("decimal(18,4)").cast("string").alias("z"),
        (z > 2.0).alias("is_spike"),
    )
