"""Parquet Modular Encryption read path (reference README.md:37-50).

The reference corpus ships 6 `*.parquet.encrypted` files and publishes
their footer/column keys (footer "kf", double_field "kc1", float_field
"kc2", AAD prefix "tester" on two files). The engine reads them with
Spark's normal vectorized parquet reader by supplying a
DecryptionPropertiesFactory (java/PlaygroundDecryptionFactory.java,
built into java/pp-crypto.jar and placed on the driver classpath by
session.get_spark) — activated per-read via the public
`parquet.crypto.factory.class` hadoop conf, which Spark forwards from
reader options.

The files contain an INT32 TIME(MILLIS) column Spark cannot represent,
so reads use an explicit schema limited to the two encrypted columns —
which are exactly the columns that prove decryption works.

Gated: if the factory class is not on the classpath (jar missing or a
session created before the jar existed), every file reports
`factory_unavailable` instead of raising.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_playground_spark.registry import register

CORPUS_DIR = "/root/reference"
FACTORY_CLASS = "pp.PlaygroundDecryptionFactory"
CRYPTO_JAR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "java",
    "pp-crypto.jar",
)

# file -> needs explicit AAD prefix (only the variant that disables
# in-file AAD-prefix storage; the others store or don't use a prefix)
ENCRYPTED_FILES: dict[str, bool] = {
    "uniform_encryption.parquet.encrypted": False,
    "encrypt_columns_and_footer.parquet.encrypted": False,
    "encrypt_columns_and_footer_ctr.parquet.encrypted": False,
    "encrypt_columns_and_footer_aad.parquet.encrypted": False,
    "encrypt_columns_plaintext_footer.parquet.encrypted": False,
    "encrypt_columns_and_footer_disable_aad_storage.parquet.encrypted": True,
}

_READ_SCHEMA = "double_field double, float_field float"


def read_encrypted(
    spark: SparkSession, rel_path: str, aad_prefix: str | None = None
) -> DataFrame:
    """Decrypting scan of one corpus file (encrypted columns only)."""
    reader = spark.read.schema(_READ_SCHEMA).option(
        "parquet.crypto.factory.class", FACTORY_CLASS
    )
    if aad_prefix is not None:
        reader = reader.option("playground.aad.prefix", aad_prefix)
    return reader.parquet(os.path.join(CORPUS_DIR, rel_path))


# Stated-value expectation: all 6 files decrypt to the same 50-row
# arithmetic series (sum(double_field) = 1361.1111 at 4dp). A wrong
# key, AAD, or a missing crypto factory produces an error row and
# fails this hash instead of hiding behind a rows-only check.
_ENCRYPTED_ORACLE = (
    "SELECT * FROM (VALUES "
    + ", ".join(
        f"('{f}', 'ok', 50, 1361.1111)" for f in ENCRYPTED_FILES
    )
    + ") AS t(file, status, n_rows, sum_double)"
)


@register("encrypted_corpus_reads", oracle=_ENCRYPTED_ORACLE)
def encrypted_corpus_reads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read every encrypted corpus file with the published keys; emit
    (file, status, n_rows, sum_double) per file. sum_double is a value
    check: garbage decryption could not produce the arithmetic series
    the files contain, so a wrong key/AAD shows up as an error row, not
    a silent pass."""
    from parquet_playground_spark.tables import ensure_session_defaults

    ensure_session_defaults(spark)
    # A session not built by session.get_spark lacks the jar on the
    # driver classpath; addJar makes it resolvable from task-side
    # classloaders (the explicit read schema keeps footer work in
    # tasks), and if that still fails the per-file gate reports it.
    try:
        spark.sparkContext._jsc.sc().addJar(CRYPTO_JAR)
    except Exception:  # noqa: BLE001 — fallback only
        pass
    records = []
    for rel, needs_aad in ENCRYPTED_FILES.items():
        try:
            df = read_encrypted(spark, rel, "tester" if needs_aad else None)
            agg = df.agg(
                F.count("*").alias("n"),
                F.round(F.sum("double_field"), 4).alias("s"),
            ).collect()[0]
            records.append((rel, "ok", int(agg["n"]), float(agg["s"])))
        except Exception as exc:  # noqa: BLE001 — availability gate
            name = type(exc).__name__
            status = (
                "factory_unavailable"
                if "ClassNotFound" in str(exc) or not os.path.exists(CRYPTO_JAR)
                else f"error:{name}"
            )
            records.append((rel, status, -1, -1.0))
    return spark.createDataFrame(
        records, "file string, status string, n_rows long, sum_double double"
    )
