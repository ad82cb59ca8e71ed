"""Bucketed layout: the orders ⋈ lineitem join on co-bucketed tables
must plan with NO Exchange — the write-time shuffle is the only one."""

from __future__ import annotations

import contextlib
import io as _io

import pytest
from pyspark.sql import functions as F

from opentimes_spark.io.bucketed import cobucketed, write_bucketed
from opentimes_spark.io.read import read_table

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    write_bucketed(
        read_table(spark, SF_DIR, "orders"),
        "orders_b", str(tmp_path / "orders_b"),
        bucket_by=["o_orderkey"], n_buckets=4, sort_by=["o_orderkey"],
    )
    write_bucketed(
        read_table(spark, SF_DIR, "lineitem"),
        "lineitem_b", str(tmp_path / "lineitem_b"),
        bucket_by=["l_orderkey"], n_buckets=4, sort_by=["l_orderkey"],
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("orders_b").join(
            spark.table("lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        p = _plan(j)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p
        assert "Bucketed: true" in p
        # and it computes the right thing
        n = j.count()
        plain = read_table(spark, SF_DIR, "orders").join(
            read_table(spark, SF_DIR, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        assert n == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    """Aggregation on the bucket key also skips its shuffle."""
    agg = spark.table("lineitem_b").groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    assert "Exchange" not in _plan(agg)


def test_cobucketed_detector(spark, bucketed_pair):
    assert cobucketed(spark, "orders_b", "lineitem_b")


def test_ensure_bucketed_pair_builds_once_and_join_is_exchange_free(
    spark, tmp_path
):
    """The bench variant's build-once seam: first call writes the
    layout, second call returns the same catalog tables without
    touching data; the big-big join over them plans no Exchange on
    the fact sides (only the final small-group agg shuffles)."""
    from opentimes_spark.io.bucketed import ensure_bucketed_pair
    from opentimes_spark.plans.queries import BENCH_ONLY, QUERIES

    o = read_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    key = f"test::{tmp_path}"
    args = (spark, o, li, "orders_b", "lineitem_b", "o_orderkey", "l_orderkey")
    ot, lt = ensure_bucketed_pair(
        *args, cache_key=key, base_dir=str(tmp_path)
    )
    import os

    mtime = os.path.getmtime(str(tmp_path / ot))
    ot2, lt2 = ensure_bucketed_pair(
        *args, cache_key=key, base_dir=str(tmp_path)
    )
    assert (ot, lt) == (ot2, lt2)
    assert os.path.getmtime(str(tmp_path / ot)) == mtime  # untouched
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table(ot).join(
                spark.table(lt), F.col("o_orderkey") == F.col("l_orderkey")
            )
            p = _plan(j)
            assert "SortMergeJoin" in p and "Exchange" not in p
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        # the bench variant over this layout matches the registry twin
        got = {
            (r["region"], r["nation"]): (r["revenue"], r["n_items"])
            for r in BENCH_ONLY["join_region_revenue_bucketed"](
                spark, SF_DIR
            ).collect()
        }
        want = {
            (r["region"], r["nation"]): (r["revenue"], r["n_items"])
            for r in QUERIES["join_region_revenue"](spark, SF_DIR).collect()
        }
        assert got == want
    finally:
        for t in spark.catalog.listTables():
            if t.name.startswith(("orders_b_", "lineitem_b_")):
                spark.sql(f"DROP TABLE IF EXISTS {t.name}")


def test_ensure_bucketed_pair_honors_n_buckets(spark, tmp_path):
    """A changed bucket count must build a NEW layout, not silently
    return the stale cache hit (n_buckets is part of the digest and
    verified against the catalog on reuse)."""
    from opentimes_spark.io.bucketed import bucket_spec, ensure_bucketed_pair

    left = spark.range(100).selectExpr("id as k", "id * 2 as a")
    right = spark.range(100).selectExpr("id as k", "id * 3 as b")
    lt4, rt4 = ensure_bucketed_pair(
        spark, left, right, "tl", "tr", "k", "k",
        cache_key="nb-test", n_buckets=4, base_dir=str(tmp_path),
    )
    lt8, rt8 = ensure_bucketed_pair(
        spark, left, right, "tl", "tr", "k", "k",
        cache_key="nb-test", n_buckets=8, base_dir=str(tmp_path),
    )
    assert (lt4, rt4) != (lt8, rt8)
    assert bucket_spec(spark, lt4)[0] == "4"
    assert bucket_spec(spark, lt8)[0] == "8"
    # same params again: cache hit returns the existing tables
    assert ensure_bucketed_pair(
        spark, left, right, "tl", "tr", "k", "k",
        cache_key="nb-test", n_buckets=4, base_dir=str(tmp_path),
    ) == (lt4, rt4)


def test_ensure_bucketed_pair_rekeys_on_different_join_keys(spark, tmp_path):
    """Same cache_key, different join keys: the digest must change, so
    the second call builds a layout bucketed on the NEW keys instead of
    returning one bucketed on the old (which would silently reintroduce
    the shuffle the helper promises to remove)."""
    from opentimes_spark.io.bucketed import bucket_spec, ensure_bucketed_pair

    left = spark.range(100).selectExpr("id AS k1", "id AS k2", "id AS v")
    right = spark.range(100).selectExpr("id AS k1", "id AS k2", "id AS w")
    lt1, rt1 = ensure_bucketed_pair(
        spark, left, right, "reb_l", "reb_r", "k1", "k1",
        cache_key="rekey-test", n_buckets=4,
        base_dir=str(tmp_path / "b1"),
    )
    lt2, rt2 = ensure_bucketed_pair(
        spark, left, right, "reb_l", "reb_r", "k2", "k2",
        cache_key="rekey-test", n_buckets=4,
        base_dir=str(tmp_path / "b2"),
    )
    assert lt1 != lt2  # distinct digests, not a stale-layout reuse
    assert "k1" in (bucket_spec(spark, lt1)[1] or "")
    assert "k2" in (bucket_spec(spark, lt2)[1] or "")
