"""The reference's signature operator: flatten-to-multimap.

Re-derivation of ParquetConverter.java:115-170 (getRecord): every
record becomes (key, value-string) pairs where key = top-level field
name, array elements become repeated entries under the same key,
struct/map values are stringified (here: canonical JSON, vs the
reference's SimpleGroup.toString), and NULL/absent fields emit a single
(key, NULL) pair (ParquetConverter.java:123-124).

The reference walks rows one at a time on one thread and has two
acknowledged bugs (leaf-index keying ParquetConverter.java:118-122,
child-0-only recursion :160-169); this version is schema-driven,
correct for any nesting, and distributed.

Scale note: implemented as ONE narrow pass — per row, build
array<struct<key,value>> spanning all fields, then a single
explode. No shuffle, no per-field re-scan, linear at any SF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_playground_spark.registry import register
from parquet_playground_spark.tables import load_table


def _stringify(col: Column, dtype: T.DataType) -> Column:
    """Leaf -> string (ParquetConverter.java:136-156 semantics); complex
    -> canonical JSON (the attribute-mapper fallback,
    ParquetConverter.java:300-303: complex => stringified)."""
    if isinstance(dtype, (T.StructType, T.MapType, T.ArrayType)):
        return F.to_json(col)
    if isinstance(dtype, T.BinaryType):
        return F.base64(col)
    if isinstance(dtype, T.TimestampType):
        # reference emits ISO-8601 instants for INT96 (ParquetConverter.java:149-153)
        return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    return col.cast("string")


def flatten_multimap(df: DataFrame) -> DataFrame:
    """Flatten any DataFrame to a (key string, value string) relation.

    * scalar field      -> one pair per row
    * array field       -> one pair per element (empty/null array -> one
                           (key, NULL) pair, matching "missing -> null")
    * struct/map field  -> one pair, value = JSON
    """
    per_field: list[Column] = []
    for f in df.schema.fields:
        col = F.col(f.name)
        if isinstance(f.dataType, T.ArrayType):
            elem_t = f.dataType.elementType
            pairs = F.transform(
                col,
                lambda x: F.struct(
                    F.lit(f.name).alias("key"),
                    _stringify(x, elem_t).alias("value"),  # noqa: B023
                ),
            )
            # null or empty array -> single (key, NULL) entry
            fallback = F.array(
                F.struct(
                    F.lit(f.name).alias("key"),
                    F.lit(None).cast("string").alias("value"),
                )
            )
            per_field.append(
                F.when((col.isNull()) | (F.size(col) == 0), fallback).otherwise(pairs)
            )
        else:
            per_field.append(
                F.array(
                    F.struct(
                        F.lit(f.name).alias("key"),
                        _stringify(col, f.dataType).alias("value"),
                    )
                )
            )
    exploded = df.select(
        F.explode(F.concat(*per_field)).alias("kv")
    )
    return exploded.select(F.col("kv.key").alias("key"), F.col("kv.value").alias("value"))


@register(
    "flatten_multimap",
    oracle="""
        SELECT 'doc_id' AS key, CAST(doc_id AS VARCHAR) AS value FROM documents
        UNION ALL
        SELECT 'lang' AS key, lang AS value FROM documents
        UNION ALL
        SELECT 'source' AS key, source AS value FROM documents
        UNION ALL
        SELECT 'tokens' AS key,
               CASE WHEN t.tok = '' THEN NULL ELSE t.tok END AS value
        FROM documents, unnest(string_split(text, ' ')) AS t(tok)
    """,
)
def flatten_multimap_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatten_multimap over documents with a derived token array —
    exercises scalar, and array explode-to-repeated-entries paths."""
    d = load_table(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id",
        "lang",
        "source",
        F.split("text", " ").alias("tokens"),
    )
    out = flatten_multimap(staged)
    # the oracle NULLs empty tokens; split never yields empties here but
    # keep semantics identical
    return out.select(
        "key", F.when(F.col("value") == "", None).otherwise(F.col("value")).alias("value")
    )


@register(
    "fn_posexplode",
    oracle="""
        SELECT p_partkey,
               generate_subscripts(string_split(p_name, ' '), 1) - 1 AS pos,
               unnest(string_split(p_name, ' ')) AS word
        FROM part WHERE p_partkey <= 200
    """,
)
def fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode: split p_name into words and emit (position,
    word) pairs, 0-based — the ordinal matters whenever downstream
    logic reconstructs or windows over token order (seq labeling,
    n-gram positions). DuckDB mirrors with generate_subscripts(arr,1)
    paired with unnest in the same SELECT (both iterate the list in
    lockstep). Narrow generate, no shuffle."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    return p.select(
        "p_partkey",
        F.posexplode(F.split("p_name", " ")).alias("pos", "word"),
    )


@register(
    "fn_inline_struct_explode",
    oracle="""
        SELECT p_partkey, 'list' AS tag,
               round(p_retailprice * 0.98, 2) AS px
        FROM part WHERE p_partkey <= 100
        UNION ALL
        SELECT p_partkey, 'disc', round(p_retailprice * 0.90, 2)
        FROM part WHERE p_partkey <= 100
    """,
)
def fn_inline_struct_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inline(): explode an array of STRUCTS directly into columns —
    the generator that turns one row into N typed variant rows (here
    a list-price and a discounted-price quote per part) without a
    manual explode + field-access chain. Completes the generator
    family (explode / explode_outer / posexplode / inline). The
    oracle states the same rows as a UNION ALL."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return p.select(
        "p_partkey",
        F.inline(
            F.array(
                F.struct(
                    F.lit("list").alias("tag"),
                    F.round(F.col("p_retailprice") * 0.98, 2).alias("px"),
                ),
                F.struct(
                    F.lit("disc").alias("tag"),
                    F.round(F.col("p_retailprice") * 0.90, 2).alias("px"),
                ),
            )
        ),
    )
