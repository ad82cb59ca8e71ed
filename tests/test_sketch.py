"""KMV distinct-count sketch: the mergeability property that makes it
work distributed (sketch per partition/day, union keep-lists, re-rank —
same estimate as sketching the full data in one pass)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

K = 8  # 15 distinct users at sf0.001 — k=8 makes the cut bite


def _rank_k(h, k=K):
    """keep the k smallest distinct hashes of column ``h``."""
    w = Window.orderBy("h")
    return (
        h.distinct()
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .drop("r")
    )


def _keep(df, k=K):
    """k smallest distinct md5 hashes of user_id — the KMV keep-list."""
    return _rank_k(
        df.select(F.md5(F.col("user_id").cast("string")).alias("h")), k
    )


def test_linear_counting_tracks_exact_and_hll(spark):
    """approx_distinct_users (linear counting, m=4096): with n ≪ m the
    estimate must land within 5% of the exact distinct count, and the
    engine-native HLL (approx_count_distinct) must agree with it to the
    same tolerance — the query is the portable oracle-checkable stand-in
    for the HLL scale path, so the two must track."""
    from opentimes_spark.plans.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    lc = {
        r["event_type"]: r["est_users"]
        for r in QUERIES["approx_distinct_users"](spark, sf).collect()
    }
    from opentimes_spark.io.read import read_table

    ev = read_table(spark, sf, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    hll = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("n"))
        .collect()
    }
    assert set(lc) == set(exact)
    for t, n in exact.items():
        assert abs(lc[t] - n) / n <= 0.05, (t, lc[t], n)
        assert abs(hll[t] - n) / n <= 0.05, (t, hll[t], n)


def test_kmv_merge_equals_full_sketch(spark):
    """min-k(A ∪ B) == min-k(keep(A) ∪ keep(B)): merging per-split
    sketches must reproduce the full-data sketch exactly, so per-state /
    per-day sketches roll up without touching raw data again."""
    from opentimes_spark.io.read import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    full = sorted(r["h"] for r in _keep(ev).collect())

    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    merged = sorted(
        r["h"] for r in _rank_k(_keep(a).unionByName(_keep(b))).collect()
    )
    assert merged == full and len(full) == K
