"""Salted-join / two-phase-agg equivalence: skew handling must not
change results, only the shuffle distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentimes_spark.io.read import read_table
from opentimes_spark.operators.skew import salted_join, two_phase_agg

SF_DIR = "/root/testdata/sf0.001"


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_plain_join(spark):
    li = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    sup = read_table(spark, SF_DIR, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name", "s_nationkey"
    )
    plain = li.join(sup, "l_suppkey")
    salted = salted_join(li, sup, on="l_suppkey", salt=4, tiebreaker="l_orderkey")
    assert sorted(plain.columns) == sorted(salted.columns)
    assert _sorted_rows(salted.select(*sorted(plain.columns))) == _sorted_rows(
        plain.select(*sorted(plain.columns))
    )


def test_salted_join_spreads_hot_key(spark):
    """Every salt bucket of a hot key must receive rows — the scatter
    actually happens (deterministic hash, not all-in-one-bucket)."""
    from opentimes_spark.operators.skew import _salt_col

    li = read_table(spark, SF_DIR, "lineitem")
    hot = li.withColumn("k", F.lit("HOT")).withColumn(
        "s", _salt_col(F.col("l_orderkey"), 4)
    )
    buckets = {r["s"] for r in hot.select("s").distinct().collect()}
    assert buckets == {0, 1, 2, 3}


def test_two_phase_agg_matches_plain_groupby(spark):
    li = read_table(spark, SF_DIR, "lineitem")
    got = two_phase_agg(
        li,
        key="l_returnflag",
        aggs={"l_quantity": "sum", "l_orderkey": "count", "l_discount": "max"},
        salt=4,
        tiebreaker="l_partkey",
    )
    expect = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_l_quantity"),
        F.count("l_orderkey").alias("count_l_orderkey"),
        F.max("l_discount").alias("max_l_discount"),
    )
    g = {r["l_returnflag"]: (round(r["sum_l_quantity"], 6), r["count_l_orderkey"], r["max_l_discount"]) for r in got.collect()}
    e = {r["l_returnflag"]: (round(r["sum_l_quantity"], 6), r["count_l_orderkey"], r["max_l_discount"]) for r in expect.collect()}
    assert g == e and len(g) > 0


def test_two_phase_agg_rejects_avg(spark):
    li = read_table(spark, SF_DIR, "lineitem")
    try:
        two_phase_agg(li, "l_returnflag", {"l_quantity": "avg"})
        raise AssertionError("should have raised")
    except ValueError:
        pass


def test_aqe_splits_skewed_join_partition_at_runtime(spark):
    """The implicit third skew tool (SCALE.md): AQE's runtime re-plan.
    A join with one hot key (1M rows of key 0 against a uniform dim)
    must come out of execution marked SortMergeJoin(skew=true) with the
    hot side read as 'coalesced and skewed' — the oversized partition
    was split into advisory-sized reader splits at RUNTIME, no salting
    in the query.  The payload is md5 text because skew detection reads
    COMPRESSED shuffle sizes: a constant-key column of longs compresses
    below any threshold and hides the skew (which is itself the lesson:
    size-based skew triggers see post-codec bytes, not row counts)."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
        left = spark.range(1_000_000).select(
            (F.col("id") * 0).alias("k"),
            F.md5(F.col("id").cast("string")).alias("x"),
        ).union(
            spark.range(100_000).select(
                (F.col("id") % 1000 + 1).alias("k"),
                F.md5(F.col("id").cast("string")).alias("x"),
            )
        )
        right = spark.range(1001).select(
            F.col("id").alias("k"), F.lit("v").alias("v")
        )
        # max(x) keeps the payload column alive through column pruning —
        # drop it and the shuffled rows are a single constant-key long
        # column that compresses below any size threshold (see docstring)
        j = left.join(right, "k").groupBy("v").agg(
            F.count(F.lit(1)).alias("n"), F.max("x").alias("mx")
        )
        rows = j.collect()
        assert rows[0]["n"] == 1_100_000  # every row joined exactly once
        final = (
            j._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        assert "SortMergeJoin(skew=true)" in final, final[:2000]
        assert "skewed" in final  # AQEShuffleRead split the hot partition
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_salted_join_rejects_outer_forms(spark):
    """Right/full outer would emit salt copies of an unmatched
    small-side row — the operator must refuse rather than silently
    multiply rows."""
    import pytest as _pytest

    from opentimes_spark.operators.skew import salted_join

    big = spark.range(10).selectExpr("id as k", "id as a")
    small = spark.range(5).selectExpr("id + 100 as k", "id as b")
    for how in ("right", "full", "outer", "full_outer"):
        with _pytest.raises(ValueError, match="salted_join cannot"):
            salted_join(big, small, "k", salt=4, how=how)
    # left stays supported and multiplicity-correct
    n = salted_join(big, small, "k", salt=4, how="left").count()
    assert n == 10
