"""A1 grouped weighted mean — reference semantics from opentimes
data/src/utils/census.py:9-47, incl. the zero-total-weight fallback."""

from __future__ import annotations

import pytest

from opentimes_spark.operators.weighted_mean import (
    grouped_weighted_mean,
    weighted_centroids,
)
from tests.conftest import rows


@pytest.fixture()
def df(spark):
    # group a: weights 1,3 → wmean = (10*1 + 20*3)/4 = 17.5
    # group b: all-zero weights → falls back to plain mean (= 5.0)
    return spark.createDataFrame(
        [
            ("a", 10.0, 1.0),
            ("a", 20.0, 3.0),
            ("b", 4.0, 0.0),
            ("b", 6.0, 0.0),
        ],
        "g string, v double, w double",
    )


def test_weighted_mean(df):
    out = rows(grouped_weighted_mean(df, ["g"], "v", "w", "wm"))
    assert out == [("a", 17.5, 2), ("b", 5.0, 2)]


def test_weighted_centroids(spark):
    df = spark.createDataFrame(
        [("g1", 0.0, 0.0, 10.0), ("g1", 10.0, 20.0, 30.0)],
        "geoid string, x double, y double, pop double",
    )
    out = weighted_centroids(df, "geoid", ["x", "y"], "pop").collect()[0]
    assert out["x_wt"] == pytest.approx((0 * 10 + 10 * 30) / 40)
    assert out["y_wt"] == pytest.approx((0 * 10 + 20 * 30) / 40)
    assert out["x"] == pytest.approx(5.0)  # unweighted mean
