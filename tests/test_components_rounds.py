"""r16 round-fusion pins: the fused 2-Exchange star steps emit exactly
the r15 edge SETS per round (duplicates allowed, set equality required),
and a full round of the fused form applied to a star forest is a
fixpoint with multiplicity 1 (the multiset-fingerprint convergence
argument in operators/components.py)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from opentimes_spark.operators.components import (
    _canonical,
    _large_star,
    _small_star,
)


def _ref_large_star(edges: set[tuple[int, int]]) -> set[tuple[int, int]]:
    """r15 reference: for each u, m = min(Γ(u) ∪ {u}); emit (v, m) for
    every neighbor v > u."""
    nbrs: dict[int, set[int]] = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    out = set()
    for u, g in nbrs.items():
        m = min(g | {u})
        for v in g:
            if v > u:
                out.add((v, m))
    return out


def _ref_small_star(edges: set[tuple[int, int]]) -> set[tuple[int, int]]:
    """r15 reference: edges oriented large→small; per u,
    m = min(Γ⁻(u)); emit (v, m) for v != m and (u, m)."""
    inn: dict[int, set[int]] = {}
    for u, v in edges:
        inn.setdefault(u, set()).add(v)
    out = set()
    for u, g in inn.items():
        m = min(g)
        out.add((u, m))
        for v in g:
            if v != m:
                out.add((v, m))
    return out


def _edge_df(spark, pairs):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in pairs], "u long, v long"
    )


def test_star_steps_match_reference_sets(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 30
        raw = {
            (rng.randrange(n), rng.randrange(n)) for _ in range(40)
        }
        canon = {
            (max(u, v), min(u, v)) for u, v in raw if u != v
        }
        e = _canonical(_edge_df(spark, raw))
        ls = _large_star(e)
        got_ls = {tuple(r) for r in ls.collect()}
        assert got_ls == _ref_large_star(canon), f"large-star trial {trial}"
        ss = _small_star(ls)
        got_ss = {tuple(r) for r in ss.collect()}
        assert got_ss == _ref_small_star(got_ls), f"small-star trial {trial}"


def test_round_on_star_forest_is_clean_fixpoint(spark):
    """On a star forest — even one carrying duplicate edges — a fused
    round returns exactly the same SET with multiplicity 1, which is
    what makes the multiset fingerprint stabilize."""
    forest = [(5, 1), (3, 1), (7, 1), (12, 9), (15, 9)]
    with_dupes = forest + [(5, 1), (15, 9)]
    out = _small_star(_large_star(_edge_df(spark, with_dupes)))
    rows = [tuple(r) for r in out.collect()]
    assert sorted(rows) == sorted(set(forest))  # set equal AND no dupes
