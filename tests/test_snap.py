"""X4 snap operator: batched nearest-node snapping, coalesce semantics,
is_snapped derivation (reference utils/times.py:645-683)."""

from __future__ import annotations

import pytest

from opentimes_spark.operators.snap import GridSnapService, snap_points


@pytest.fixture()
def pts(spark):
    return spark.createDataFrame(
        [
            ("on_node", -87.65, 41.85),      # exactly on the grid
            ("near", -87.6542, 41.8533),     # snaps to (-87.65, 41.85)
            ("offgrid_far", 10.123, 0.456),  # beyond max_dist → unsnapped
        ],
        "id string, lon double, lat double",
    )


def test_snap_semantics(spark, pts):
    out = {
        r["id"]: r
        for r in snap_points(
            pts, lambda: GridSnapService(grid_deg=0.01, max_dist_deg=0.008)
        ).collect()
    }
    # exactly on a node: snapped coords == raw, is_snapped False
    r = out["on_node"]
    assert r["lon_snapped"] == r["lon"] and not r["is_snapped"]
    # near a node: snapped to grid, flagged
    r = out["near"]
    assert r["lon_snapped"] == pytest.approx(-87.65) and r["is_snapped"]
    assert r["lat_snapped"] == pytest.approx(41.85)
    # raw coords always preserved
    assert r["lon"] == -87.6542
    # too far: coalesced back to raw, not flagged
    r = out["offgrid_far"]
    assert r["lon_snapped"] == r["lon"] and not r["is_snapped"]


def test_snap_batch_scales(spark):
    from pyspark.sql import functions as F

    pts = (
        spark.range(5000)
        .select(
            F.col("id").cast("string"),
            (F.lit(-100.0) + (F.col("id") % 777) * 0.0123).alias("lon"),
            (F.lit(35.0) + (F.col("id") % 555) * 0.0071).alias("lat"),
        )
        .repartition(8)
    )
    out = snap_points(pts)
    assert out.count() == 5000
    # every snapped coordinate is on the 0.01 grid
    from pyspark.sql import functions as F2

    bad = out.filter(
        F2.col("is_snapped")
        & (
            (F2.abs(F2.col("lon_snapped") * 100 - F2.round(F2.col("lon_snapped") * 100, 0)) > 1e-9)
        )
    ).count()
    assert bad == 0
