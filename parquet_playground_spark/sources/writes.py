"""Write paths / egestion (reference R7-R9).

The reference writes one whole Parquet file buffered in heap, then
copies to local disk and S3 (LoadParquet.java:56-71,
InMemoryOutputFile.java). Spark's committer-based writes replace all
of that: executors stream part-files in parallel; an `s3a://` output
path gives the multipart S3 upload (R9) for free. Here we exercise the
local variants: codec choice, partitioned layout, and CSV/JSON
interchange.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_playground_spark.registry import register
from parquet_playground_spark.tables import load_table


def _tmp(name: str) -> str:
    return os.path.join(tempfile.gettempdir(), f"ppspark_{name}")


@register(
    "write_partitioned_parquet",
    oracle="""
        SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 4) AS total
        FROM orders
        GROUP BY o_orderstatus
    """,
)
def write_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned write (partitionBy status) + re-read with
    partition pruning available to downstream filters. At 100 TB,
    partition columns are the first-line data-skipping mechanism."""
    o = load_table(spark, sf_dir, "orders")
    out = _tmp("orders_partitioned")
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 4).alias("total"),
    )


@register(
    "write_codec_matrix",
    oracle="""
        SELECT 'snappy' AS codec, count(*) AS n_rows FROM supplier
        UNION ALL SELECT 'gzip', count(*) FROM supplier
        UNION ALL SELECT 'zstd', count(*) FROM supplier
        UNION ALL SELECT 'lz4', count(*) FROM supplier
        UNION ALL SELECT 'none', count(*) FROM supplier
    """,
)
def write_codec_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write/read under every codec the corpus exercises (uncompressed,
    snappy, lz4 — reference §2.2) plus gzip/zstd."""
    s = load_table(spark, sf_dir, "supplier")
    frames = []
    for codec in ["snappy", "gzip", "zstd", "lz4", "none"]:
        out = _tmp(f"supplier_{codec}")
        s.write.mode("overwrite").option("compression", codec).parquet(out)
        frames.append(
            spark.read.parquet(out)
            .agg(F.count("*").alias("n_rows"))
            .select(F.lit(codec).alias("codec"), "n_rows")
        )
    result = frames[0]
    for f in frames[1:]:
        result = result.unionByName(f)
    return result


@register(
    "write_csv_json_roundtrip",
    oracle="""
        SELECT count(*) AS n_rows,
               count(DISTINCT n_name) AS n_names,
               CAST(sum(n_regionkey) AS BIGINT) AS sum_region
        FROM nation
    """,
)
def write_csv_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interchange formats: parquet -> CSV -> JSON -> parquet, fidelity
    checked against the original table."""
    n = load_table(spark, sf_dir, "nation")
    csv_out, json_out = _tmp("nation_csv"), _tmp("nation_json")
    n.write.mode("overwrite").option("header", "true").csv(csv_out)
    csv_back = spark.read.option("header", "true").schema(n.schema).csv(csv_out)
    csv_back.write.mode("overwrite").json(json_out)
    back = spark.read.schema(n.schema).json(json_out)
    return back.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("n_name").alias("n_names"),
        F.sum("n_regionkey").cast("bigint").alias("sum_region"),
    )
