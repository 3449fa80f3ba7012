"""SparkSession factory.

Scale notes (design target: 1000-executor cluster over ~100 TB):
  * AQE on — runtime coalescing of shuffle partitions, skew-join
    splitting, and dynamic broadcast conversion replace any hand-tuned
    plan at scale.
  * Arrow on — all pandas_udf / applyInPandas paths batch-transfer.
  * Parquet filter pushdown + nested schema pruning on — the engine's
    equivalent of the reference's manual footer column/row-group
    pruning (reference: MutableParquetMetadata.java:35-115), done by
    Catalyst instead of hand-trimmed footers.
  * UTC session timezone — determinism vs the DuckDB oracle.
  * shuffle.partitions is sized for local test SFs; on a real cluster
    AQE coalescing makes the static number mostly irrelevant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "parquet-playground-spark") -> SparkSession:
    """Create (or fetch) the tuned SparkSession."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # --- determinism ---
        .config("spark.sql.session.timeZone", "UTC")
        # --- adaptive execution: coalesce shuffles, split skew, demote
        # sort-merge to broadcast at runtime ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing: small static number for local SFs; AQE
        # re-coalesces so this is a ceiling, not a schedule ---
        .config("spark.sql.shuffle.partitions", cpus)
        # --- scan-side pruning (Catalyst equivalent of reference footer
        # trimming, MutableParquetMetadata.java:35-115) ---
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # --- INT96 legacy timestamps (reference ParquetConverter.java:40-61)
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        # --- timestamp[ns] columns (events.ts): Spark 4 rejects INT64
        # TIMESTAMP(NANOS) outright; read as long nanos and convert in
        # load_table (tables.py) — same lineage as the reference's manual
        # INT96 nano decode (ParquetConverter.java:40-61).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- Arrow for all pandas-UDF exchange ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- bucketed-table warehouse outside the repo tree ---
        .config("spark.sql.warehouse.dir", "/tmp/ppspark_warehouse")
        # --- keep driver logs readable ---
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    # Parquet modular-encryption factory (sources/encrypted.py): the
    # pp-crypto.jar holds PlaygroundDecryptionFactory with the corpus's
    # published keys; classpath entries only apply at JVM launch, so an
    # already-running session simply leaves the encrypted reads gated.
    crypto_jar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "java", "pp-crypto.jar"
    )
    if os.path.exists(crypto_jar):
        builder = builder.config("spark.driver.extraClassPath", crypto_jar)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
