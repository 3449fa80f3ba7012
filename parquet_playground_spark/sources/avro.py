"""Avro ingestion (reference R6: LoadParquet.java:56, 3records.1.AVRO).

The reference reads an Avro container file and converts it to Snappy
Parquet (LoadParquet.java:74-99). Spark's equivalent is
``spark.read.format('avro')`` — the spark-avro module. That jar is not
bundled in this environment and installs are not permitted, so the
source is gated: `read_avro` tries the datasource and raises a single
clear error if unavailable. `avro_to_parquet` is the R7 pipeline on
top of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

REFERENCE_AVRO = "/root/reference/3records.1.AVRO"


class AvroUnavailableError(RuntimeError):
    """spark-avro jar not on the classpath (and no fallback decoder)."""


def avro_available(spark: SparkSession) -> bool:
    try:
        spark.read.format("avro").load(REFERENCE_AVRO).schema
        return True
    except Exception:
        return False


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro container -> DataFrame (reference LoadParquet.java:56)."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as exc:
        raise AvroUnavailableError(
            "Avro datasource requires the spark-avro module "
            "(org.apache.spark:spark-avro); not bundled in this environment"
        ) from exc


def avro_to_parquet(spark: SparkSession, avro_path: str, parquet_path: str) -> None:
    """Avro -> Snappy Parquet (reference writeAvroToParquet,
    LoadParquet.java:74-99) — executor-parallel, no heap buffering."""
    df = read_avro(spark, avro_path)
    df.write.mode("overwrite").option("compression", "snappy").parquet(parquet_path)
