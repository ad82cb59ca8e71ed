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


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized differential check against pandas.merge_asof
    (direction='backward', allow_exact_matches=True — the same <=
    semantics), three seeded datasets."""
    import numpy as np
    import pandas as pd

    for seed in (0, 1, 2):
        rng = np.random.RandomState(seed)
        keys = ["u1", "u2", "u3"]
        left_pd = pd.DataFrame(
            {
                "k": rng.choice(keys, 40),
                "ts": rng.randint(0, 100, 40),
                "lid": np.arange(40),
            }
        )
        right_pd = (
            pd.DataFrame(
                {
                    "k": rng.choice(keys, 25),
                    "ts": rng.randint(0, 100, 25),
                    "v": rng.uniform(0, 1, 25).round(6),
                }
            )
            .groupby(["k", "ts"], as_index=False)
            .agg(v=("v", "max"))  # unique per (k, ts), as the operator requires
        )
        expect = pd.merge_asof(
            left_pd.sort_values("ts", kind="mergesort"),
            right_pd.sort_values("ts", kind="mergesort"),
            on="ts",
            by="k",
            direction="backward",
            allow_exact_matches=True,
        ).set_index("lid")["v"]

        got_rows = asof_join(
            spark.createDataFrame(left_pd),
            spark.createDataFrame(right_pd),
            "k",
            "ts",
            ["v"],
        ).collect()
        got = {r["lid"]: r["asof_v"] for r in got_rows}
        for lid in left_pd["lid"]:
            e = expect.loc[lid]
            g = got[lid]
            if pd.isna(e):
                assert g is None, (seed, lid)
            else:
                assert g == e, (seed, lid)


def test_null_payload_not_forward_filled(spark):
    """A matched right row whose payload field is NULL must yield NULL —
    not an older row's value — and multi-payload output must come from
    ONE right row (no per-column stitching across rows)."""
    from opentimes_spark.operators.asof import asof_join

    right = spark.createDataFrame(
        [
            ("k", 1, 10, "a"),
            ("k", 2, None, "b"),   # price NULL at ts=2
            ("k", 3, 30, None),    # tag NULL at ts=3
        ],
        "key string, ts int, price int, tag string",
    )
    left = spark.createDataFrame(
        [("k", 2), ("k", 3)], "key string, ts int"
    )
    out = {
        r["ts"]: (r["asof_price"], r["asof_tag"])
        for r in asof_join(left, right, "key", "ts", ["price", "tag"]).collect()
    }
    # ts=2 matches the ts=2 right row wholesale: price stays NULL
    assert out[2] == (None, "b")
    # ts=3 matches the ts=3 right row wholesale: tag stays NULL (a
    # per-column fill would stitch price=30 with tag='b' from ts=2)
    assert out[3] == (30, None)


def test_asof_ignores_null_timestamp_right_rows(spark):
    """ASOF semantics (DuckDB, merge_asof) never match NULL keys: a
    NULL-ts right row must not become anyone's 'prior' match via
    NULLS FIRST ordering."""
    from opentimes_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 5)], "k int, ts int")
    right = spark.createDataFrame(
        [(1, None, 99.0), (1, 3, 42.0)], "k int, ts int, price double"
    )
    out = asof_join(left, right, "k", "ts", ["price"]).collect()
    assert out[0]["asof_price"] == 42.0
    # with ONLY a NULL-ts right row: no match at all
    right2 = spark.createDataFrame([(1, None, 99.0)], "k int, ts int, price double")
    out2 = asof_join(left, right2, "k", "ts", ["price"]).collect()
    assert out2[0]["asof_price"] is None
