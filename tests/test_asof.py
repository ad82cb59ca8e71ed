"""As-of join operator: <= semantics, ties, no-match NULLs, and the
one-shuffle union-window plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentimes_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [("a", 10, "l1"), ("a", 20, "l2"), ("a", 5, "l0"), ("b", 7, "l3")],
        "k string, t long, lbl string",
    ).select("k", F.col("t").alias("ts"), "lbl")
    right = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 15, 2.0), ("b", 9, 3.0)],
        "k string, t long, v double",
    ).select("k", F.col("t").alias("ts"), "v")
    return left, right


def test_asof_semantics(spark):
    left, right = _frames(spark)
    got = {
        r["lbl"]: r["asof_v"]
        for r in asof_join(left, right, "k", "ts", ["v"]).collect()
    }
    assert got == {
        "l1": 1.0,  # tie: right at ts=10 matches (<= semantics)
        "l2": 2.0,  # latest prior (15), not first (10)
        "l0": None,  # no right row at or before ts=5
        "l3": None,  # right at 9 is AFTER left at 7
    }


def test_asof_one_shuffle(spark):
    """The plan must contain exactly one Exchange (the window's) beyond
    any scan-side shuffles — no join, no row expansion."""
    left, right = _frames(spark)
    res = asof_join(left, right, "k", "ts", ["v"])
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        res.explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan  # no join operator at all
    assert plan.count("Exchange") - plan.count("ReusedExchange") <= 2
    assert "Window" in plan


def test_asof_row_count_preserved(spark):
    left, right = _frames(spark)
    assert asof_join(left, right, "k", "ts", ["v"]).count() == left.count()
