"""Catalog layer (SURVEY.md S12/S13/A5): file-tree listing, hierarchical
directory totals, and pointer-database artifacts.

Reference: opentimes walks its R2 bucket into a nested dict with
per-directory total_size/max_last_modified (data/src/utils/cloudflare.py:
35-121), renders index pages from it, and builds a DuckDB database of
views over the public parquet URLs (data/src/utils/duckdb.py:40-84).

Spark-first shape: the listing is a DataFrame of (path, size, mtime);
per-directory totals are one ``rollup`` over the split path levels
(grouping sets — no recursive tree walk); the pointer artifacts are
(a) Spark catalog views over the parquet roots and (b) a DuckDB file
with the same views, for parity with the reference's consumer story.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def list_tree(spark: SparkSession, root: str) -> DataFrame:
    """Recursive listing → (path, rel_path, size, mtime_ms). Driver-side
    os.walk for local paths (object-store listing is I/O bound and
    paginated either way; the reference's boto pagination is the same
    driver-side pattern). The *analysis* of the listing is distributed."""
    rows = []
    for dirpath, _, files in os.walk(root):
        for fn in files:
            full = os.path.join(dirpath, fn)
            st = os.stat(full)
            rows.append(
                (full, os.path.relpath(full, root), int(st.st_size), int(st.st_mtime * 1000))
            )
    return spark.createDataFrame(
        rows, "path string, rel_path string, size long, mtime_ms long"
    )


def tree_totals(listing: DataFrame, max_depth: int = 6) -> DataFrame:
    """A5 hierarchical totals: total_size / max_mtime / n_files at every
    directory level, via rollup over the split path components — the
    grouping-sets-native replacement for the reference's recursive
    propagation (cloudflare.py:22-33). NULL level = 'all descendants'."""
    parts = F.split(F.col("rel_path"), "/")
    # F.get is NULL beyond the end (ANSI-safe); the last component is the
    # filename, not a directory level, so it is excluded
    levels = [
        F.when(F.size(parts) > i + 1, F.get(parts, i)).alias(f"l{i}")
        for i in range(max_depth)
    ]
    leveled = listing.select(*levels, "size", "mtime_ms")
    level_cols = [f"l{i}" for i in range(max_depth)]
    return (
        leveled.rollup(*level_cols)
        .agg(
            F.sum("size").alias("total_size"),
            F.max("mtime_ms").alias("max_mtime_ms"),
            F.count(F.lit(1)).alias("n_files"),
            # distinguishes a rollup subtotal's NULL from a path that is
            # genuinely shallow (root-level files like _SUCCESS):
            # depth = number of NON-aggregated leading levels
            (
                F.lit(max_depth)
                - sum(F.grouping(c).cast("int") for c in level_cols)
            ).alias("depth"),
        )
    )


def file_count_index(listing: DataFrame, key_levels: list[int]) -> DataFrame:
    """S14's tile-index analogue: file counts grouped by chosen path
    levels (reference: awk count[$1]++ in create_tiles.sh:36-57)."""
    parts = F.split(F.col("rel_path"), "/")
    keys = [F.get(parts, i).alias(f"l{i}") for i in key_levels]
    return listing.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_files"))


def register_views(spark: SparkSession, tables: dict[str, str]) -> None:
    """S12 Spark-side pointer catalog: temp view per table root."""
    for name, path in tables.items():
        spark.read.parquet(path).createOrReplaceTempView(name)


def build_duckdb_pointer(db_path: str, tables: dict[str, str]) -> None:
    """S12 parity artifact: a .duckdb file of views over the parquet
    roots — the reference's consumer-facing pointer database
    (utils/duckdb.py:76-83's CREATE VIEW ... read_parquet shape)."""
    import duckdb

    if os.path.exists(db_path):
        os.remove(db_path)
    con = duckdb.connect(db_path)
    for name, path in tables.items():
        glob = os.path.join(path, "**", "*.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{glob}', hive_partitioning=true, "
            f"hive_types_autocast=false)"
        )
    con.close()
