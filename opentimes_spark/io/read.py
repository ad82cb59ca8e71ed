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
        prior = spark.conf.get(
            "spark.sql.legacy.parquet.nanosAsLong", "false"
        )
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            # nanos present: the conf must STAY set for this frame's
            # lifetime (executors consult it when decoding the scan).
            # Session-wide effect, documented: other nanosecond parquet
            # read in the same session will also surface as bigint.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            # this corpus carries no nanos — restore the prior value so
            # an unrelated later read keeps its loud unsupported-type
            # error instead of silently materializing bigint columns
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prior)
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


def read_staged_glob(
    spark: SparkSession,
    root: str,
    glob: str | None = None,
    chunk_pattern: str = r"part-([0-9_\-]+)\.parquet",
) -> DataFrame:
    """Globbed multi-file scan of a Hive-partitioned staging layout with
    provenance columns — the reference's public-files input scan
    (create_public_files.py:76-82: ``read_parquet(glob,
    hive_partitioning=true, hive_types_autocast=false, filename=true)``).

    - partition keys come back as STRING (type inference disabled, the
      ``hive_types_autocast=false`` parity knob);
    - ``source_file`` = full path of the parquet file each row came from;
    - ``chunk_id`` = ``chunk_pattern`` group 1 extracted from the
      filename (reference create_public_files.py:75), '' when no match.

    At scale this is a file-listing-parallel scan: partition-key
    predicates on the result prune directories before any file is read.
    """
    from pyspark.sql import functions as F

    spark.conf.set(
        "spark.sql.sources.partitionColumnTypeInference.enabled", "false"
    )
    reader = spark.read.option("basePath", root)
    path = os.path.join(root, glob) if glob else root
    df = reader.parquet(path)
    return df.withColumn("source_file", F.input_file_name()).withColumn(
        "chunk_id",
        F.regexp_extract(F.input_file_name(), chunk_pattern, 1),
    )


def configure_object_store(
    spark: SparkSession,
    endpoint: str,
    access_key: str | None = None,
    secret_key: str | None = None,
    path_style: bool = True,
) -> None:
    """Point the Hadoop s3a connector at an S3-compatible object store
    (reference: R2 endpoint + storage_options, utils/times.py:100-107,
    calculate_times.py:82-94). After this, ``spark.read.parquet('s3a://
    bucket/...')`` and ``df.write`` work unchanged — same code path as
    local files. Credentials default to the standard provider chain
    (env/instance profile) when not given explicitly."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set("fs.s3a.endpoint", endpoint)
    if access_key:
        hconf.set("fs.s3a.access.key", access_key)
    if secret_key:
        hconf.set("fs.s3a.secret.key", secret_key)
    hconf.set("fs.s3a.path.style.access", "true" if path_style else "false")
    hconf.set("fs.s3a.connection.ssl.enabled", "true")


def read_evolving(
    spark: SparkSession,
    root: str,
    canonical: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Scan a parquet dir written over time with an EVOLVING schema
    (later batches added columns) — the 100 TB reality the reference
    sidesteps by full rewrites. ``mergeSchema=true`` unions the file
    footers' schemas (rows from older files get NULL for newer
    columns); ``canonical`` — [(name, type), ...] — then conforms the
    result: missing columns materialize as typed NULLs, extras drop,
    order and types normalize, so downstream plans never depend on
    which files happened to be scanned.

    Scale note: schema merging reads FOOTERS of all files (driver-side
    listing + parallel footer fetch), not data; still, prefer a table-
    level schema registry once file counts hit millions — pass that
    schema as ``canonical`` and flip mergeSchema off via
    ``spark.read.schema(...)`` at that point."""
    from pyspark.sql import functions as F

    df = spark.read.option("mergeSchema", "true").parquet(root)
    if canonical is None:
        return df
    cols = [
        F.col(n).cast(t).alias(n)
        if n in df.columns
        else F.lit(None).cast(t).alias(n)
        for n, t in canonical
    ]
    return df.select(*cols)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines source with an EXPLICIT schema — at scale, schema
    inference is a full extra pass over the data, so it is never
    acceptable; corrupt lines are quarantined into ``_corrupt_record``
    (PERMISSIVE mode) instead of failing the scan, the right contract
    for web-scraped corpora."""
    return (
        spark.read.schema(schema + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV source with an EXPLICIT schema and corrupt-row quarantine —
    the legacy-feed ingestion contract (reference inputs arrive as
    Census CSV payloads; data/src/utils/census.py parses them
    pandas-side).  Schema inference is off for the same reason as
    read_jsonl (it is a full extra pass at scale); malformed rows land
    in ``_corrupt_record`` instead of failing the scan; multiline
    quoted fields are on so embedded newlines in text columns survive.
    """
    return (
        spark.read.schema(schema + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — Spark-native columnar alternative to parquet, with
    the same predicate-pushdown / column-pruning / stripe-stat skipping
    contract.  Exists so a corpus already materialized as ORC (Hive
    estates) can feed every operator without a rewrite; write side in
    io.write.write_orc."""
    return spark.read.orc(path)
