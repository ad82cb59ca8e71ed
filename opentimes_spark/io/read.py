"""Table readers.

The driver corpus is one parquet file per table (TESTDATA.md); real
deployments read Hive-partitioned directories — ``read_table`` handles
both (Spark's partition discovery kicks in automatically for dirs).
Reference parity: partitioned scans keep partition values as strings
(session conf disables type inference, matching opentimes
data/src/create_public_files.py:79 ``hive_types_autocast=false``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table: ``{sf_dir}/{name}.parquet`` (file or dir).

    ``events`` is written with nanosecond timestamps, which Spark's parquet
    reader rejects; read the raw int64 nanos (legacy conf, runtime-settable)
    and downcast to a microsecond TimestampType with exact integer division.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in names}


def register_temp_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> None:
    """Register all corpus tables as temp views for spark.sql queries."""
    for n in names:
        read_table(spark, sf_dir, n).createOrReplaceTempView(n)
