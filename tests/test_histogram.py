"""Equi-depth histogram via percentile_approx cutpoints: the at-scale
path must (a) reproduce the NTILE contract within sketch tolerance and
(b) contain NO single-partition sort in its physical plan — that plan
shape is exactly what it exists to remove."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentimes_spark.io.read import read_table
from opentimes_spark.operators.histogram import equidepth_histogram

SF = "/root/testdata/sf0.001"


def test_equidepth_counts_and_bounds(spark):
    o = read_table(spark, SF, "orders")
    n = o.count()
    rows = {
        r["bucket"]: r
        for r in equidepth_histogram(o, "o_totalprice", 10).collect()
    }
    assert sorted(rows) == list(range(1, 11))
    assert sum(r["n_rows"] for r in rows.values()) == n
    # sketch accuracy 1/10000 on ~1.5k rows → essentially exact deciles;
    # allow a loose 10% band so the assert is about the algorithm, not
    # the sketch's exact tie handling
    for b, r in rows.items():
        assert abs(r["n_rows"] - n / 10) <= max(2, 0.1 * n / 10), (b, r)
    # data-driven boundaries must be monotone across buckets
    for b in range(1, 10):
        assert rows[b]["hi"] <= rows[b + 1]["lo"], (b, rows[b], rows[b + 1])


def test_equidepth_plan_has_no_global_sort(spark):
    """The NTILE twin plans a global Sort into a single partition + a
    Window over the FULL ROW STREAM (the 100 TB bottleneck); the approx
    path must plan neither.  Its only SinglePartition exchange is the
    final merge of partial_percentile_approx — one fixed-size sketch
    buffer per upstream partition, not data rows — which is exactly the
    mergeable-partials shape this operator exists to reach."""
    o = read_table(spark, SF, "orders")
    approx_plan = (
        equidepth_histogram(o, "o_totalprice", 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Sort " not in approx_plan and "Sort[" not in approx_plan
    assert "Window" not in approx_plan
    # the one single-partition exchange carries sketch partials, proven
    # by it feeding from the partial percentile aggregate
    assert "partial_percentile_approx" in approx_plan

    from pyspark.sql import Window

    w = Window.orderBy("o_totalprice", "o_orderkey")
    ntile_plan = (
        o.select(F.ntile(10).over(w).alias("b"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the contrast this test pins: full-stream global sort + window
    assert "SinglePartition" in ntile_plan
    assert "Sort [" in ntile_plan and "Window" in ntile_plan


def test_equidepth_rejects_degenerate_bucket_count(spark):
    import pytest

    o = read_table(spark, SF, "orders")
    with pytest.raises(ValueError):
        equidepth_histogram(o, "o_totalprice", 1)


def test_equidepth_degenerate_columns(spark):
    """The documented contract deviations: a constant column collapses
    to ONE bucket (equal values are never split), and NULLs are
    excluded rather than skewing bucket 1."""
    from pyspark.sql import functions as F

    from opentimes_spark.operators.histogram import equidepth_histogram

    const = spark.range(100).select(F.lit(7.0).alias("v"))
    out = equidepth_histogram(const, "v", n_buckets=4).collect()
    assert len(out) == 1
    assert out[0]["n_rows"] == 100 and out[0]["lo"] == out[0]["hi"] == 7.0

    with_nulls = spark.createDataFrame(
        [(float(i),) for i in range(1, 9)] + [(None,)] * 4, "v double"
    )
    rows = equidepth_histogram(with_nulls, "v", n_buckets=2).collect()
    assert sum(r["n_rows"] for r in rows) == 8  # the 4 NULLs are out
    assert all(r["lo"] is not None and r["hi"] is not None for r in rows)


def test_bucket_assign_contract_and_cutpoint_injection(spark):
    """bucket_assign labels every non-null row 1..n, populations are
    near-equal on a distinct-valued column, ties never split, and
    caller-supplied cutpoints (the persisted-sketch path) override the
    inline percentile_approx aggregate."""
    from opentimes_spark.operators.histogram import bucket_assign

    o = read_table(spark, SF, "orders")
    d = bucket_assign(o, "o_totalprice", n_buckets=10, bucket_col="decile")
    n = o.filter(F.col("o_totalprice").isNotNull()).count()
    assert d.count() == n  # every row labelled, none dropped
    assert set(d.columns) == set(o.columns) | {"decile"}
    stats = d.groupBy("decile").count().collect()
    assert {r["decile"] for r in stats} == set(range(1, 11))
    for r in stats:
        assert abs(r["count"] - n / 10) <= max(5, 0.02 * n), r
    # buckets are value-monotone: max(value) in decile k <= min in k+1
    bounds = {
        r["decile"]: (r["lo"], r["hi"])
        for r in d.groupBy("decile")
        .agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
        .collect()
    }
    for k in range(1, 10):
        assert bounds[k][1] <= bounds[k + 1][0]

    # explicit cutpoints: 3 buckets on a known column
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 10)], "id long, v double"
    )
    got = {
        r["id"]: r["b"]
        for r in bucket_assign(
            df, "v", n_buckets=3, cutpoints=[3.0, 6.0], bucket_col="b"
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 2, 7: 3, 8: 3, 9: 3}

    import pytest

    with pytest.raises(ValueError, match="cutpoints"):
        bucket_assign(df, "v", n_buckets=3, cutpoints=[3.0])


def test_decile_mix_approx_plan_is_sort_and_window_free(spark):
    """The production orders_decile_mix twin must plan neither a global
    Sort nor a Window — its only single-partition exchange is the
    percentile_approx sketch merge (VERDICT r9 Next #4)."""
    from opentimes_spark.plans.queries import BENCH_ONLY

    plan = (
        BENCH_ONLY["orders_decile_mix_approx"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Sort " not in plan and "Sort[" not in plan
    assert "Window" not in plan
    assert "partial_percentile_approx" in plan


def test_bucket_assign_consumes_persisted_sketch_cutpoints(spark, tmp_path):
    """The daily-ingest labelling path the bucket_assign docstring
    promises: per-day sketches persist once, merged_quantiles over the
    sketch rows (history never rescanned) yields decile cutpoints, and
    bucket_assign labels a NEW batch against the corpus-lifetime
    distribution.  Populations land near n/10 and the boundary
    invariant (every bucket-k value <= every bucket-k+1 value) holds."""
    from opentimes_spark.operators.histogram import bucket_assign
    from opentimes_spark.operators.quantile_sketch import (
        merged_quantiles,
        write_sketch,
    )

    o = read_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    # two "ingest days" sketched independently
    d1 = o.filter(F.col("o_orderkey") % 2 == 0)
    d2 = o.filter(F.col("o_orderkey") % 2 == 1)
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_sketch(d1, "o_totalprice", p1)
    write_sketch(d2, "o_totalprice", p2)

    probs = [i / 10 for i in range(1, 10)]
    qs = merged_quantiles(spark, [p1, p2], probs)
    cuts = [qs[p] for p in probs]
    assert cuts == sorted(cuts)

    labelled = bucket_assign(
        o, "o_totalprice", n_buckets=10, cutpoints=cuts, bucket_col="decile"
    )
    n = o.count()
    stats = labelled.groupBy("decile").count().collect()
    assert {r["decile"] for r in stats} <= set(range(1, 11))
    for r in stats:
        # sketch error tolerance: populations within 10% of n/10 + slack
        assert abs(r["count"] - n / 10) <= max(10, 0.1 * n), r
    bounds = {
        r["decile"]: (r["lo"], r["hi"])
        for r in labelled.groupBy("decile")
        .agg(F.min("o_totalprice").alias("lo"),
             F.max("o_totalprice").alias("hi"))
        .collect()
    }
    ks = sorted(bounds)
    for a, b in zip(ks, ks[1:]):
        assert bounds[a][1] <= bounds[b][0]
