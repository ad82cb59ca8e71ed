"""Interval-overlap range join: equivalence to the naive theta join,
no duplicate pairs, and the bucketed equi-join plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentimes_spark.operators.ranges import interval_overlap_join


def _intervals(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    left = spark.createDataFrame(
        [
            (int(i), float(s), float(s + rng.randint(1, 50)))
            for i, s in enumerate(rng.randint(0, 500, 80))
        ],
        "lid long, ls double, le double",
    )
    right = spark.createDataFrame(
        [
            (int(i), float(s), float(s + rng.randint(1, 80)))
            for i, s in enumerate(rng.randint(0, 500, 40))
        ],
        "rid long, rs double, re double",
    )
    return left, right


def test_interval_join_matches_theta_and_no_dupes(spark):
    left, right = _intervals(spark)
    got = interval_overlap_join(left, right, "ls", "le", "rs", "re", 25.0)
    pairs = [(r["lid"], r["rid"]) for r in got.collect()]
    assert len(pairs) == len(set(pairs))  # first-shared-bucket dedup works
    expect = {
        (r["lid"], r["rid"])
        for r in left.crossJoin(right)
        .filter((F.col("le") >= F.col("rs")) & (F.col("ls") <= F.col("re")))
        .collect()
    }
    assert set(pairs) == expect
    # bucket width robustness: same result at extreme widths
    for w in (3.0, 500.0):
        alt = interval_overlap_join(left, right, "ls", "le", "rs", "re", w)
        assert {(r["lid"], r["rid"]) for r in alt.collect()} == expect


def test_interval_join_plan_is_equi(spark):
    """The rewrite must plan a hash/sort-merge equi join on the bucket,
    never a nested-loop theta join."""
    import contextlib
    import io

    left, right = _intervals(spark)
    res = interval_overlap_join(left, right, "ls", "le", "rs", "re", 25.0)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        res.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan
