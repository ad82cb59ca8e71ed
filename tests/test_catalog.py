"""Catalog layer: listing, rollup totals, file-count index, DuckDB
pointer parity (both engines read the same public layout)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from opentimes_spark.operators.catalog import (
    build_duckdb_pointer,
    file_count_index,
    list_tree,
    register_views,
    tree_totals,
)


@pytest.fixture(scope="module")
def public_dir(spark, tmp_path_factory):
    """A small partitioned public layout written by the engine."""
    out = str(tmp_path_factory.mktemp("cat") / "times")
    df = (
        spark.range(1000)
        .withColumn("origin_id", F.lpad((F.col("id") % 20).cast("string"), 11, "0"))
        .withColumn("destination_id", F.lpad(F.col("id").cast("string"), 11, "0"))
        .withColumn("duration_sec", F.col("id").cast("double"))
        .withColumn("mode", F.when(F.col("id") % 2 == 0, "car").otherwise("foot"))
        .withColumn("state", F.when(F.col("id") % 3 == 0, "17").otherwise("18"))
        .drop("id")
    )
    from opentimes_spark.io.write import write_sorted_partitioned

    write_sorted_partitioned(
        df, out, partition_by=["mode", "state"], order_by=["origin_id", "destination_id"]
    )
    return out


def test_tree_totals_root_matches_sum(spark, public_dir):
    listing = list_tree(spark, public_dir)
    totals = tree_totals(listing, max_depth=3)
    root = totals.filter(F.col("depth") == 0).collect()[0]
    assert root["total_size"] == sum(r["size"] for r in listing.collect())
    assert root["n_files"] == listing.count()
    # all depth-1 groups (modes + the NULL group of root-level files
    # like _SUCCESS) partition the root total exactly
    level1 = totals.filter(F.col("depth") == 1).collect()
    assert sum(r["total_size"] for r in level1) == root["total_size"]
    mode_rows = [r for r in level1 if r["l0"] is not None]
    assert {r["l0"] for r in mode_rows} == {"mode=car", "mode=foot"}


def test_file_count_index(spark, public_dir):
    listing = list_tree(spark, public_dir)
    idx = file_count_index(listing, [0, 1])
    got = {(r["l0"], r["l1"]): r["n_files"] for r in idx.collect()}
    keyed = {k: v for k, v in got.items() if k[0] is not None and k[1] is not None}
    assert all(k[0].startswith("mode=") and k[1].startswith("state=") for k in keyed)
    assert sum(got.values()) == listing.count()


def test_pointer_parity_spark_vs_duckdb(spark, public_dir, tmp_path):
    """The same public layout must answer the canonical point query
    identically via the Spark catalog and the DuckDB pointer DB."""
    register_views(spark, {"times_v": public_dir})
    spark_rows = spark.sql(
        "SELECT origin_id, destination_id, duration_sec FROM times_v "
        "WHERE mode='car' AND state='17' AND origin_id='00000000006' "
        "ORDER BY destination_id"
    ).collect()

    db = str(tmp_path / "pointer.duckdb")
    build_duckdb_pointer(db, {"times_v": public_dir})
    con = duckdb.connect(db)
    duck_rows = con.execute(
        "SELECT origin_id, destination_id, duration_sec FROM times_v "
        "WHERE mode='car' AND state='17' AND origin_id='00000000006' "
        "ORDER BY destination_id"
    ).fetchall()

    assert [tuple(r) for r in spark_rows] == duck_rows
    assert len(duck_rows) > 0
    # partition values stayed strings in BOTH engines (autocast parity)
    t = con.execute("SELECT typeof(state) FROM times_v LIMIT 1").fetchone()[0]
    assert t == "VARCHAR"
