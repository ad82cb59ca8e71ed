"""CDC snapshot-merge operator (operators/merge.py): MERGE INTO
semantics via union + latest-wins window."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentimes_spark.operators.merge import merge_changeset


def _snap(spark):
    return spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 0)],
        "k long, v string, version long",
    )


def test_merge_update_insert_delete(spark):
    snap = _snap(spark)
    changes = spark.createDataFrame(
        [
            (2, "b2", 1, "U"),  # update
            (3, None, 1, "D"),  # delete
            (4, "d", 1, "U"),   # insert
        ],
        "k long, v string, version long, op string",
    )
    got = {
        r["k"]: r["v"]
        for r in merge_changeset(snap, changes, ["k"], "version").collect()
    }
    assert got == {1: "a", 2: "b2", 4: "d"}


def test_merge_latest_version_wins_and_tie_prefers_change(spark):
    snap = _snap(spark)
    changes = spark.createDataFrame(
        [
            (1, "v1", 1, "U"),
            (1, "v2", 2, "U"),   # later version beats earlier change
            (2, "tie", 0, "U"),  # same version as snapshot: change wins
            (3, "stale", 0, "D"),  # tombstone at tie also wins (later intent)
        ],
        "k long, v string, version long, op string",
    )
    got = {
        r["k"]: r["v"]
        for r in merge_changeset(snap, changes, ["k"], "version").collect()
    }
    assert got == {1: "v2", 2: "tie"}


def test_merge_requires_op_column(spark):
    snap = _snap(spark)
    with pytest.raises(ValueError, match="op"):
        merge_changeset(snap, snap, ["k"], "version")


def test_merge_single_exchange_plan(spark):
    """One hash shuffle on the key, no join in the plan: the merge must
    stay union + window, not degrade into an outer join."""
    snap = _snap(spark)
    changes = spark.createDataFrame(
        [(2, "b2", 1, "U")], "k long, v string, version long, op string"
    )
    plan = merge_changeset(snap, changes, ["k"], "version")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning(k") == 1
