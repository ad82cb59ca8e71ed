"""Interval-overlap range join WITHOUT an equi key — the second classic
custom operator Spark lacks natively (SURVEY.md §2 J-Ext family; the
reference's only range predicates ride an equi join, this is the
general case).

A naive overlap join ``l.end >= r.start AND l.start <= r.end`` has no
equi component, so Spark plans BroadcastNestedLoopJoin — O(|L|·|R|)
comparisons, catastrophic at scale. The grid-bucket rewrite restores an
equi key:

1. quantize the axis into fixed-width buckets;
2. explode every interval into the buckets it covers;
3. equi-join on the bucket id (hash shuffle, uniformly distributed when
   ``bucket_width`` ≈ typical interval length);
4. keep exact overlaps, and emit each pair ONCE by keeping only the
   FIRST shared bucket — ``bucket == max(floor(l_start/w),
   floor(r_start/w))`` — which avoids a distinct() dedup shuffle
   entirely.

Cost: O(intervals × buckets-per-interval) exploded rows and one
shuffle. ``bucket_width`` is the fan-out dial: too small explodes rows,
too large degrades the equi key's selectivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: float,
) -> DataFrame:
    """Inner join of every (left, right) pair whose CLOSED intervals
    [l_start, l_end] and [r_start, r_end] overlap. Interval bounds are
    numeric (cast timestamps to unix seconds first). Column names must
    be disjoint between the two inputs."""
    w = float(bucket_width)
    lb = left.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(l_start) / w), F.floor(F.col(l_end) / w)
            )
        ),
    )
    rb = right.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(r_start) / w), F.floor(F.col(r_end) / w)
            )
        ),
    )
    joined = lb.join(rb, "__bkt")
    overlap = (F.col(l_end) >= F.col(r_start)) & (
        F.col(l_start) <= F.col(r_end)
    )
    first_shared = F.col("__bkt") == F.greatest(
        F.floor(F.col(l_start) / w), F.floor(F.col(r_start) / w)
    )
    return joined.filter(overlap & first_shared).drop("__bkt")
