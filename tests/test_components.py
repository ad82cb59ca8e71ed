"""Connected components: known graphs, convergence, and the dedup-group
contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentimes_spark.operators.components import connected_components, dedup_groups


def _comp_map(df):
    return {r["node"]: r["component_id"] for r in df.collect()}


def test_two_components_and_chain(spark):
    # component {1,2,3} (triangle), chain {10-11-12-13}, pair {20,21}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (12, 13), (20, 21)],
        "id_a long, id_b long",
    )
    got = _comp_map(connected_components(edges))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}


def test_long_chain_converges(spark):
    n = 30
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    got = _comp_map(connected_components(edges, max_iter=40))
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def test_dedup_groups_sizes(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    rows = dedup_groups(edges).collect()
    sizes = {r["component_id"]: r["n_members"] for r in rows}
    assert sizes == {1: 3, 10: 2}
    # canonical representative is a member of its own group
    assert all(
        any(r["node"] == r["component_id"] for r in rows if r["component_id"] == c)
        for c in sizes
    )


def test_nonconvergence_raises(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError):
        # force the contraction loop: the driver union-find cutover
        # answers small graphs without iterating at all
        connected_components(edges, max_iter=2, force_distributed=True)


def test_components_match_union_find_random(spark):
    """Randomized differential check against a plain union-find,
    three seeded random graphs (incl. duplicate + self edges)."""
    import random

    for seed in (0, 1, 2):
        rnd = random.Random(seed)
        n = 40
        edges = [
            (rnd.randrange(n), rnd.randrange(n)) for _ in range(60)
        ]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # expected: min node id per component, only for nodes with edges
        touched = sorted({x for e in edges for x in e})
        roots = {}
        for x in touched:
            r = find(x)
            roots.setdefault(r, []).append(x)
        expect = {}
        for members in roots.values():
            m = min(members)
            for x in members:
                expect[x] = m

        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = _comp_map(connected_components(df))
        assert got == expect, seed


def test_driver_union_find_matches_distributed(spark):
    """The driver union-find cutover and the forced star-contraction
    path must return the IDENTICAL (node, component_id) set — the
    output is pure min-id set semantics, so exact equality, not
    tolerance."""
    from pyspark.sql import functions as SF

    from opentimes_spark.operators.components import connected_components

    # mixed graph: a chain, a star, two isolated-ish pairs, a self-loop
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 50)]
        + [(100, 100 + i) for i in range(1, 20)]
        + [(200, 201), (300, 301), (400, 400)],
        "id_a long, id_b long",
    )
    fast = {
        (r["node"], r["component_id"])
        for r in connected_components(edges).collect()
    }
    dist = {
        (r["node"], r["component_id"])
        for r in connected_components(
            edges, force_distributed=True
        ).collect()
    }
    assert fast == dist and len(fast) > 0
    # string ids take the lexicographic min, identically in both paths
    sedges = spark.createDataFrame(
        [("b", "c"), ("c", "a"), ("x", "y")], "id_a string, id_b string"
    )
    f2 = {
        (r["node"], r["component_id"])
        for r in connected_components(sedges).collect()
    }
    d2 = {
        (r["node"], r["component_id"])
        for r in connected_components(
            sedges, force_distributed=True
        ).collect()
    }
    assert f2 == d2
    assert ("c", "a") in f2 and ("y", "x") in f2


def test_driver_path_empty_and_selfloop(spark):
    """The shuffle-free driver path handles degenerate inputs: an empty
    edge set yields an empty typed frame; a pure self-loop keeps its
    node as its own component (union-find skips u==v trivially)."""
    from pyspark.sql import functions as F

    empty = spark.range(0).select(
        F.col("id").alias("id_a"), F.col("id").alias("id_b")
    )
    out = connected_components(empty)
    assert out.count() == 0
    assert out.schema.simpleString() == (
        "struct<node:bigint,component_id:bigint>"
    )
    loop = spark.createDataFrame([(7, 7)], "id_a long, id_b long")
    assert connected_components(loop).collect() == [
        __import__("pyspark").sql.Row(node=7, component_id=7)
    ]


def test_driver_path_widens_mixed_int_types(spark):
    """int-u / bigint-v edges: the driver path must type its output
    from the UNION-widened node type (like the distributed path), not
    from u alone — pinned with a v-side id beyond int32 range."""
    big = 5_000_000_000  # > int32
    edges = spark.createDataFrame(
        [(1, big), (2, 3)], "id_a int, id_b long"
    )
    fast = connected_components(edges)
    assert fast.schema["node"].dataType.simpleString() == "bigint"
    got = {(r["node"], r["component_id"]) for r in fast.collect()}
    dist = {
        (r["node"], r["component_id"])
        for r in connected_components(
            edges, force_distributed=True
        ).collect()
    }
    assert got == dist and (big, 1) in got
