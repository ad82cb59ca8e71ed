"""Mergeable aggregate state: merge-of-parts == aggregate-of-whole."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from opentimes_spark.operators.aggstate import (
    finalize_agg,
    merge_agg_states,
    partial_agg_state,
)

MEASURES = {"v": ["cnt", "sum", "min", "max"]}


@pytest.fixture(scope="module")
def rows():
    rng = random.Random(11)
    return [(i, f"g{i % 4}", rng.randint(-50, 50)) for i in range(200)]


def _norm(df):
    return sorted(map(tuple, df.collect()))


def test_merge_of_random_split_equals_whole(spark, rows):
    full = spark.createDataFrame(rows, "id long, g string, v long")
    rng = random.Random(7)
    parts = [[], [], []]
    for r in rows:
        parts[rng.randrange(3)].append(r)
    states = [
        partial_agg_state(
            spark.createDataFrame(p, "id long, g string, v long"), ["g"], MEASURES
        )
        for p in parts
    ]
    merged = merge_agg_states(states, ["g"], MEASURES)
    direct = partial_agg_state(full, ["g"], MEASURES)
    assert _norm(merged) == _norm(direct)


def test_merge_is_commutative_and_handles_absent_groups(spark):
    a = spark.createDataFrame([(0, "x", 5), (1, "y", 7)], "id long, g string, v long")
    b = spark.createDataFrame([(2, "x", -1)], "id long, g string, v long")  # no 'y'
    sa = partial_agg_state(a, ["g"], MEASURES)
    sb = partial_agg_state(b, ["g"], MEASURES)
    ab = merge_agg_states([sa, sb], ["g"], MEASURES)
    ba = merge_agg_states([sb, sa], ["g"], MEASURES)
    assert _norm(ab) == _norm(ba)
    got = {r.g: r for r in ab.collect()}
    assert got["x"].v__cnt == 2 and got["x"].v__sum == 4
    assert got["y"].v__cnt == 1 and got["y"].v__min == 7


def test_finalize_avg_rides_sum_count_not_avg_of_avgs(spark):
    # unequal batch sizes: avg of batch-avgs would be (5 + 2)/2 = 3.5;
    # the correct pooled avg is (5 + 1 + 3)/3 = 3.
    a = spark.createDataFrame([(0, "g", 5)], "id long, g string, v long")
    b = spark.createDataFrame([(1, "g", 1), (2, "g", 3)], "id long, g string, v long")
    merged = merge_agg_states(
        [partial_agg_state(x, ["g"], MEASURES) for x in (a, b)], ["g"], MEASURES
    )
    fin = finalize_agg(merged, MEASURES, avg_of=["v"])
    assert fin.collect()[0]["v__avg"] == 3.0


def test_unsupported_stat_raises(spark):
    df = spark.createDataFrame([(0, "g", 1)], "id long, g string, v long")
    with pytest.raises(ValueError, match="not mergeable"):
        partial_agg_state(df, ["g"], {"v": ["median"]})


def test_merge_shuffles_state_not_rows(spark, rows):
    """The merge plan re-aggregates STATE rows (one per group per batch),
    never the raw rows — its exchange is on the key over the unioned
    states only."""
    full = spark.createDataFrame(rows, "id long, g string, v long")
    s = partial_agg_state(full, ["g"], MEASURES)
    merged = merge_agg_states([s, s], ["g"], MEASURES)
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan
    assert merged.count() == 4
