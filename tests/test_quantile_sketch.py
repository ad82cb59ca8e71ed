"""Mergeable quantile sketch (operators/quantile_sketch.py): rank-error
bounds vs exact percentiles on uniform and heavy-tail data, fixed-layout
reproducibility, merge-across-ingests ≈ whole-corpus sketch, and the
persisted daily-sketch path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from opentimes_spark.operators.quantile_sketch import (
    _Compactors,
    build_sketch,
    merge_sketch_rows,
    merged_quantiles,
    quantiles_from_rows,
    sketch_quantiles,
    write_sketch,
)

QS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _rank_error(values: np.ndarray, q: float, est: float) -> float:
    """|true rank of the estimate - q| as a fraction of n."""
    n = len(values)
    return abs(np.searchsorted(np.sort(values), est, side="left") / n - q)


def _check_bounds(values, est_by_q, eps):
    for q, est in est_by_q.items():
        err = _rank_error(values, q, est)
        assert err <= eps, (q, est, err, eps)


def test_rank_error_uniform_and_heavy_tail(spark):
    rng = np.random.RandomState(42)
    for dist in ("uniform", "lognormal"):
        vals = (
            rng.rand(20000) if dist == "uniform" else rng.lognormal(0, 2, 20000)
        )
        df = spark.createDataFrame(
            [(float(v),) for v in vals], "x double"
        ).repartition(8)
        est = sketch_quantiles(df, "x", QS, k=128)
        # MRL eps ~ log2(n/k)/k ~ 0.06 at these sizes; assert a
        # conservative 2x envelope across layouts/distributions
        _check_bounds(vals, est, eps=0.12)


def test_fixed_layout_reproducible(spark):
    rng = np.random.RandomState(7)
    df = spark.createDataFrame(
        [(float(v),) for v in rng.rand(5000)], "x double"
    ).repartition(4)
    df = df.persist()
    a = sketch_quantiles(df, "x", QS, k=64)
    b = sketch_quantiles(df, "x", QS, k=64)
    assert a == b  # no RNG anywhere — bit-identical on a fixed layout


def test_merge_matches_union(spark, tmp_path):
    """Daily-ingest contract: merging per-day sketches answers within
    bound for the union — without rescanning the days."""
    rng = np.random.RandomState(3)
    days = [rng.lognormal(0, 1, 6000) + shift for shift in (0.0, 2.0, 5.0)]
    paths = []
    for i, vals in enumerate(days):
        df = spark.createDataFrame([(float(v),) for v in vals], "x double")
        p = str(tmp_path / f"day{i}")
        write_sketch(df, "x", p, k=128)
        paths.append(p)
    union = np.concatenate(days)
    est = merged_quantiles(spark, paths, QS, k=128)
    _check_bounds(union, est, eps=0.12)


def test_sketch_size_bounded(spark):
    rng = np.random.RandomState(9)
    df = spark.createDataFrame(
        [(float(v),) for v in rng.rand(50000)], "x double"
    ).coalesce(1)
    rows = build_sketch(df, "x", k=128).collect()
    # one partition: <= k per level, ~log2(n/k) levels
    assert len(rows) <= 128 * 12
    by_level = {}
    for r in rows:
        by_level[r["level"]] = by_level.get(r["level"], 0) + 1
    assert all(n <= 128 for n in by_level.values())


def test_compactor_weights_conserve_count():
    c = _Compactors(8)
    for v in range(1000):
        c.add(float(v))
    total = sum(1 << lvl for lvl, _ in c.rows())
    assert total == 1000  # every promotion doubles weight, halves count


def test_merge_rows_is_bounded_and_weighted(spark):
    rng = np.random.RandomState(1)
    df = spark.createDataFrame(
        [(float(v),) for v in rng.rand(8000)], "x double"
    ).repartition(16)
    sk = build_sketch(df, "x", k=64)
    merged = merge_sketch_rows(sk, k=64)
    total = sum(1 << lvl for lvl, _ in merged)
    assert total == 8000
    est = quantiles_from_rows(merged, [0.5])
    assert 0.35 < est[0.5] < 0.65


def test_rejects_bad_capacity():
    with pytest.raises(ValueError, match="even"):
        _Compactors(7)


def test_null_values_skipped(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (3.0,), (None,), (2.0,)], "x double"
    )
    merged = merge_sketch_rows(build_sketch(df, "x", k=8), k=8)
    assert sum(1 << lvl for lvl, _ in merged) == 3
    assert quantiles_from_rows(merged, [0.5])[0.5] == 2.0
