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
