"""Fuzzy record-linkage operator: blocking, distance bound, and the
hot-block star degradation (same contract as the LSH hot-band cap)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentimes_spark.operators.linkage import first_token_block, fuzzy_pairs


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


def test_finds_near_matches_within_block(spark):
    df = _df(
        spark,
        [
            (1, "acme widgets"),
            (2, "acme widgetz"),   # dist 1 from id 1
            (3, "acme gizmoss"),   # dist 6 from id 1 — out at max_dist=2
            (4, "zenith widgets"), # different block, never compared
        ],
    )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(df, "id", "name", max_dist=2).collect()
    }
    assert got == {(1, 2, 1)}


def test_identical_names_distance_zero(spark):
    df = _df(spark, [(1, "red bolt"), (2, "red bolt"), (3, "red bolts")])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(df, "id", "name", max_dist=1).collect()
    }
    assert got == {(1, 2, 0), (1, 3, 1), (2, 3, 1)}


def test_hot_block_degrades_to_star(spark):
    """An over-cap block must emit only representative pairs (k-1), and
    an under-cap block must be unaffected."""
    hot = [(i, f"dup item {i % 2}") for i in range(1, 11)]  # one 10-row block
    cool = [(100, "rare thing"), (101, "rare thing")]
    df = _df(spark, hot + cool)

    capped = fuzzy_pairs(df, "id", "name", max_dist=2, max_block_size=4).collect()
    pairs = {(r.id_a, r.id_b) for r in capped}
    # star: every hot pair involves the block's min id (1)
    hot_pairs = {p for p in pairs if p[1] <= 11}
    assert all(p[0] == 1 for p in hot_pairs)
    assert len(hot_pairs) == 9  # k-1 star edges
    assert (100, 101) in pairs  # cool block untouched

    uncapped = fuzzy_pairs(df, "id", "name", max_dist=2).collect()
    assert len({(r.id_a, r.id_b) for r in uncapped}) == 45 + 1  # C(10,2) + cool


def test_star_pairs_carry_real_distance(spark):
    df = _df(
        spark,
        [(1, "aaa x"), (2, "aaa y"), (3, "aaa z"), (4, "aaa x")],
    )
    got = {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy_pairs(df, "id", "name", max_dist=2, max_block_size=2).collect()
    }
    # star against id 1: distances computed against the representative's name
    assert got[(1, 4)] == 0 and got[(1, 2)] == 1 and got[(1, 3)] == 1


def test_custom_block_key(spark):
    df = _df(spark, [(1, "abc one"), (2, "abd one")])
    # first-token blocking separates them; a 2-char-prefix key co-blocks
    assert fuzzy_pairs(df, "id", "name", max_dist=1).count() == 0
    got = fuzzy_pairs(
        df, "id", "name", max_dist=1, block_key=F.substring("name", 1, 2)
    ).collect()
    assert {(r.id_a, r.id_b, r.dist) for r in got} == {(1, 2, 1)}


def test_first_token_block_lowercases(spark):
    df = spark.createDataFrame([("Red Widget",), ("red bolt",)], "name string")
    keys = {r.k for r in df.select(first_token_block(F.col("name")).alias("k")).collect()}
    assert keys == {"red"}
