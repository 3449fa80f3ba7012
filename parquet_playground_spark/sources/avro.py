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

from parquet_playground_spark.registry import register

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


@register("avro_ingest")  # rows-only: availability probe + row count
def avro_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Living entry for the reference's one real ETL pipeline
    (Avro -> Snappy Parquet, LoadParquet.java:56-99): report whether the
    spark-avro datasource is on the classpath and, if so, run the full
    ingest (read 3records.1.AVRO, write Snappy parquet, read back) and
    report the roundtrip row count. Clean single-row fallback when the
    module is absent — never an exception."""
    import os
    import tempfile

    if not avro_available(spark):
        return spark.createDataFrame(
            [("unavailable", -1, -1)],
            "avro_status string, n_rows long, n_rows_roundtrip long",
        )
    df = read_avro(spark, REFERENCE_AVRO)
    n = df.count()
    out = os.path.join(tempfile.gettempdir(), "ppspark_avro_ingest")
    avro_to_parquet(spark, REFERENCE_AVRO, out)
    n_back = spark.read.parquet(out).count()
    return spark.createDataFrame(
        [("available", n, n_back)],
        "avro_status string, n_rows long, n_rows_roundtrip long",
    )
