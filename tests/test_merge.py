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


def test_merge_matches_dict_model_random(spark):
    """Randomized differential check against a plain dict-replay model:
    seeded random changesets (dup keys in one batch, version collisions
    with the snapshot, tombstones, inserts) applied key-by-key in
    (version, change-beats-snapshot) order must equal the Spark merge."""
    import random

    for seed in (0, 1, 2):
        rnd = random.Random(seed)
        snap_rows = [(k, f"s{k}", rnd.randrange(3)) for k in range(20)]
        chg_rows = [
            (
                rnd.randrange(30),  # keys beyond 19 are inserts
                f"c{i}",
                rnd.randrange(5),
                "D" if rnd.random() < 0.25 else "U",
            )
            for i in range(40)
        ]
        # dict model: per key pick max (version, is_change, arrival) row
        best = {}
        for k, v, ver in snap_rows:
            best[k] = (ver, 0, 0, v, "U")
        for i, (k, v, ver, op) in enumerate(chg_rows):
            cand = (ver, 1, i, v, op)
            if k not in best or cand[:3] > best[k][:3]:
                best[k] = cand
        expected = {
            k: t[3] for k, t in best.items() if t[4] != "D"
        }

        snap = spark.createDataFrame(snap_rows, "k long, v string, version long")
        chg = spark.createDataFrame(
            chg_rows, "k long, v string, version long, op string"
        )
        # the random batches intentionally contain same-(key, version)
        # duplicates, which the default uniqueness check rejects —
        # check=False exercises the documented escape hatch
        got = {
            r["k"]: r["v"]
            for r in merge_changeset(
                snap, chg, ["k"], "version", check=False
            ).collect()
        }
        # same-version duplicate CHANGES for one key tie arbitrarily in
        # the window (no arrival order on a distributed changeset), so
        # compare only keys whose winner is unambiguous
        ambiguous = set()
        for i, (k, _, ver, _) in enumerate(chg_rows):
            for j, (k2, _, ver2, _) in enumerate(chg_rows):
                if i < j and k == k2 and ver == ver2 and best[k][:2] == (ver, 1):
                    ambiguous.add(k)
        for k in set(expected) | set(got):
            if k in ambiguous:
                continue
            assert got.get(k) == expected.get(k), (seed, k)


def test_merge_null_op_is_upsert_not_delete(spark):
    """A NULL op from a sloppy upstream must be treated as an upsert —
    a bare != 'D' filter would NULL out and silently delete the key."""
    snap = _snap(spark)
    changes = spark.createDataFrame(
        [(2, "nullop", 1, None)], "k long, v string, version long, op string"
    )
    got = {
        r["k"]: r["v"]
        for r in merge_changeset(snap, changes, ["k"], "version").collect()
    }
    assert got[2] == "nullop"


def test_merge_rejects_ambiguous_changeset(spark):
    """Two change rows with the same (key, version) exhaust the window
    ordering — the default check refuses to pick a nondeterministic
    winner and names an offending key."""
    snap = _snap(spark)
    changes = spark.createDataFrame(
        [(2, "x", 1, "U"), (2, "y", 1, "U")],
        "k long, v string, version long, op string",
    )
    with pytest.raises(ValueError, match="nondeterministic"):
        merge_changeset(snap, changes, ["k"], "version")
    # same rows sail through with the escape hatch
    assert merge_changeset(snap, changes, ["k"], "version", check=False).count() == 3
