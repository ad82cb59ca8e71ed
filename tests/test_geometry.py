"""Geometry kernel: Albers 5071 round-trip + known values, ray casting,
spatial join, projection UDF."""

from __future__ import annotations

import numpy as np
import pytest

from opentimes_spark.functions.geometry import (
    haversine_m,
    points_in_polygon,
    project_5071,
    unproject_5071,
)
from opentimes_spark.operators.spatial import (
    project_points,
    spatial_join_contains,
    within_buffer_of_point,
)


def test_albers_projection_origin():
    # projection origin maps to (0, 0) by construction
    x, y = project_5071(np.array([-96.0]), np.array([23.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6


def test_albers_equal_area_property():
    """The defining invariant: the Jacobian determinant of (x,y) w.r.t.
    (λ,φ) must equal the GRS80 area element a²(1−e²)cosφ/(1−e²sin²φ)²
    at every point — this pins the projection as THE Albers equal-area,
    not just some conic."""
    a, f = 6378137.0, 1 / 298.257222101
    e2 = f * (2 - f)
    rng = np.random.RandomState(11)
    lon = rng.uniform(-124, -67, 50)
    lat = rng.uniform(25, 49, 50)
    eps = 1e-6  # degrees
    x0, y0 = project_5071(lon, lat)
    xl, yl = project_5071(lon + eps, lat)
    xp, yp = project_5071(lon, lat + eps)
    d = np.radians(eps)
    jac = ((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0)) / (d * d)
    s = np.sin(np.radians(lat))
    expect = a * a * (1 - e2) * np.cos(np.radians(lat)) / (1 - e2 * s * s) ** 2
    np.testing.assert_allclose(jac, expect, rtol=1e-4)


def test_albers_standard_parallel_scale():
    """Along a standard parallel the scale is true: projected distance of
    a small east-west step equals the ellipsoidal parallel arc length."""
    a, f = 6378137.0, 1 / 298.257222101
    e2 = f * (2 - f)
    lat = 29.5
    step = 0.01  # degrees of longitude
    x0, y0 = project_5071(np.array([-96.0]), np.array([lat]))
    x1, y1 = project_5071(np.array([-96.0 + step]), np.array([lat]))
    proj_d = float(np.hypot(x1 - x0, y1 - y0))
    s = np.sin(np.radians(lat))
    arc = a * np.cos(np.radians(lat)) / np.sqrt(1 - e2 * s * s) * np.radians(step)
    assert proj_d == pytest.approx(arc, rel=1e-6)


def test_albers_roundtrip():
    rng = np.random.RandomState(3)
    lon = rng.uniform(-124, -67, 200)
    lat = rng.uniform(25, 49, 200)
    x, y = project_5071(lon, lat)
    lon2, lat2 = unproject_5071(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-7)
    np.testing.assert_allclose(lat2, lat, atol=1e-7)


def test_ray_casting():
    square = np.array([(0, 0), (10, 0), (10, 10), (0, 10)])
    px = np.array([5.0, 15.0, -1.0, 9.999])
    py = np.array([5.0, 5.0, 5.0, 9.999])
    np.testing.assert_array_equal(
        points_in_polygon(px, py, square), [True, False, False, True]
    )


def test_ray_casting_concave():
    # L-shape: (5..10, 5..10) notch removed
    poly = np.array([(0, 0), (10, 0), (10, 5), (5, 5), (5, 10), (0, 10)])
    inside = points_in_polygon(np.array([2.0, 7.0, 7.0]), np.array([7.0, 7.0, 2.0]), poly)
    np.testing.assert_array_equal(inside, [True, False, True])


def test_haversine_equator_degree():
    # 1° of longitude at the equator ≈ 111.195 km (spherical)
    d = haversine_m(np.array([0.0]), np.array([0.0]), np.array([1.0]), np.array([0.0]))
    assert d[0] == pytest.approx(111195, rel=1e-3)


def test_spatial_join_contains(spark):
    pts = spark.createDataFrame(
        [("p1", 2.0, 2.0), ("p2", 7.0, 2.0), ("p3", 50.0, 50.0)],
        "id string, x double, y double",
    )
    polys = [
        ("east", [(5.0, 0.0), (10.0, 0.0), (10.0, 5.0), (5.0, 5.0)]),
        ("west", [(0.0, 0.0), (5.0, 0.0), (5.0, 5.0), (0.0, 5.0)]),
    ]
    got = {r["id"]: r["polygon_id"] for r in spatial_join_contains(pts, polys).collect()}
    assert got == {"p1": "west", "p2": "east", "p3": None}


def test_within_buffer(spark):
    pts = spark.createDataFrame(
        [("near", -87.7, 41.9), ("far", -80.0, 35.0)],
        "id string, lon double, lat double",
    )
    got = within_buffer_of_point(pts, -87.6298, 41.8781, 300_000).collect()
    assert [r["id"] for r in got] == ["near"]


def test_project_points_udf(spark):
    pts = spark.createDataFrame(
        [("a", -96.0, 23.0), ("b", -87.6298, 41.8781)],
        "id string, lon double, lat double",
    )
    got = {r["id"]: (r["x_5071"], r["y_5071"]) for r in project_points(pts).collect()}
    assert got["a"][0] == pytest.approx(0.0, abs=1e-6)
    assert 500_000 < got["b"][0] < 900_000 and 2_000_000 < got["b"][1] < 2_300_000


def test_dist_to_ring():
    from opentimes_spark.functions.geometry import dist_to_ring

    square = np.array([(0, 0), (10, 0), (10, 10), (0, 10)])
    px = np.array([5.0, 15.0, 5.0, -3.0, 13.0])
    py = np.array([5.0, 5.0, -2.0, -4.0, 14.0])
    d = dist_to_ring(px, py, square)
    # center → 5 to each edge; outside → perpendicular or corner distance
    np.testing.assert_allclose(d, [5.0, 5.0, 2.0, 5.0, 5.0])


def test_points_within_buffer_concave():
    """U-shape with a deep notch: the dilation must reach INTO the notch
    from both prongs, and erosion must survive only in thick parts —
    exactly what a center+radius approximation gets wrong."""
    from opentimes_spark.functions.geometry import points_within_buffer

    # U: outer 0..30 x 0..30, notch (10..20, 10..30) removed
    u = np.array(
        [(0, 0), (30, 0), (30, 30), (20, 30), (20, 10), (10, 10), (10, 30), (0, 30)]
    )
    px = np.array([15.0, 15.0, 15.0, 5.0, 40.0, 15.0])
    py = np.array([12.0, 20.0, 5.0, 15.0, 15.0, 35.0])
    # notch point 2m above the notch floor: within buffer 3, not 1
    assert points_within_buffer(px, py, u, 3.0).tolist() == [
        True,   # (15,12): in notch, 2 from the notch floor → dilated in
        False,  # (15,20): deep in notch, 5 from either prong
        True,   # (15,5): genuinely inside
        True,   # (5,15): inside left prong
        False,  # (40,15): 10 right of the outer wall
        False,  # (15,35): above the notch mouth, √50≈7.07 from corners
    ]
    assert points_within_buffer(px, py, u, 6.0).tolist() == [
        True, True, True, True, False, False
    ]
    # buffer 8 reaches past the prong corners to the mouth point
    assert points_within_buffer(px, py, u, 8.0).tolist() == [
        True, True, True, True, False, True
    ]
    # erosion: only points ≥2 inside the boundary survive
    assert points_within_buffer(px, py, u, -2.0).tolist() == [
        False, False, True, True, False, False
    ]


def test_clip_ring_bbox():
    from opentimes_spark.functions.geometry import clip_ring_bbox, points_in_polygon

    tri = np.array([(0, 0), (20, 0), (0, 20)])
    clipped = clip_ring_bbox(tri, (-5.0, -5.0, 10.0, 10.0))
    # clipped region = triangle ∩ box: pentagon containing (1,1),(9,9)
    # excluded: (12,1) (outside box), (1,12) (outside box), (9.9, 9.9)
    # (outside hypotenuse x+y<=20? 19.8<20 → inside both, included)
    inside = points_in_polygon(
        np.array([1.0, 9.0, 12.0, 1.0]), np.array([1.0, 9.0, 1.0, 12.0]), clipped
    )
    np.testing.assert_array_equal(inside, [True, True, False, False])
    # all clipped vertices are inside (or on) the bbox
    assert (clipped[:, 0] >= -5 - 1e-9).all() and (clipped[:, 0] <= 10 + 1e-9).all()
    assert (clipped[:, 1] >= -5 - 1e-9).all() and (clipped[:, 1] <= 10 + 1e-9).all()


def test_buffer_ring_matches_predicate():
    """The exported outline must agree with the exact predicate: points
    strictly inside/outside the dilation (by a margin ≫ arc-sampling
    error) are classified identically by PIP on the outline ring."""
    from opentimes_spark.functions.geometry import (
        buffer_ring,
        points_in_polygon,
        points_within_buffer,
    )

    square = np.array([(0, 0), (10, 0), (10, 10), (0, 10)])
    ring = buffer_ring(square, 5.0, arc_steps=32)
    rng = np.random.RandomState(7)
    px = rng.uniform(-10, 20, 500)
    py = rng.uniform(-10, 20, 500)
    exact = points_within_buffer(px, py, square, 5.0)
    margin = np.abs(
        np.where(exact, 1.0, -1.0) * 5.0
        - np.where(
            points_in_polygon(px, py, square),
            -np.inf,  # interior points: always in the dilation, skip margin
            0.0,
        )
    )
    from opentimes_spark.functions.geometry import dist_to_ring

    d = dist_to_ring(px, py, square)
    clear = np.abs(d - 5.0) > 0.1  # off the arc-approximation band
    got = points_in_polygon(px, py, ring)
    np.testing.assert_array_equal(got[clear], exact[clear])


def test_build_osmclip_shape():
    """osmclip stage: buffered Illinois-ish rectangle, clipped, returns
    a 4326 ring whose dilation contains near-boundary points and whose
    extent respects the guard bbox."""
    from opentimes_spark.functions.geometry import points_in_polygon
    from opentimes_spark.plans.pipeline import build_osmclip

    il = [(-91.5, 37.0), (-87.5, 37.0), (-87.5, 42.5), (-91.5, 42.5)]
    ring = build_osmclip(il, buffer_m=100_000.0)
    assert len(ring) > 50  # densified + arcs
    # a point ~0.5° outside the raw boundary is inside the 100km buffer
    inside = points_in_polygon(
        np.array([-92.3, -89.5, -95.0]), np.array([40.0, 40.0, 40.0]), ring
    )
    np.testing.assert_array_equal(inside, [True, True, False])
    # guard bbox respected
    assert ring[:, 0].min() >= -177.0 and ring[:, 0].max() <= -16.0


def test_points_within_buffer_multi_holes_islands():
    """MultiPolygon with a lake (hole) and an island: even-odd
    containment + boundary-union distance. Michigan-shaped problems."""
    from opentimes_spark.functions.geometry import points_within_buffer_multi

    outer = np.array([(0, 0), (100, 0), (100, 100), (0, 100)])
    lake = np.array([(40, 40), (60, 40), (60, 60), (40, 60)])
    island = np.array([(45, 45), (55, 45), (55, 55), (45, 55)])
    rings = [outer, lake, island]
    px = np.array([10.0, 50.0, 42.0, 50.0, 120.0, 41.0])
    py = np.array([10.0, 50.0, 42.0, 41.0, 50.0, 50.0])
    # d=0: mainland in; island center in; lake-water points out
    assert points_within_buffer_multi(px, py, rings, 0.0).tolist() == [
        True,   # (10,10) mainland
        True,   # (50,50) island center
        False,  # (42,42) lake water (inside outer+lake, even)
        False,  # (50,41) lake water between shore and island
        False,  # (120,50) offshore
        False,  # (41,50) lake water, 1 from lake shore
    ]
    # dilate by 2: near-shore lake water and water near island come in
    # ((42,42) is exactly 2.0 from the lake shore → included)
    assert points_within_buffer_multi(px, py, rings, 2.0).tolist() == [
        True, True, True, True, False, True
    ]
    # erode by 3: island (5 half-width) shrinks but center survives;
    # mainland point 10 in from the corner survives
    assert points_within_buffer_multi(px, py, rings, -3.0).tolist() == [
        True, True, False, False, False, False
    ]


def test_within_buffered_polygon_multi_operator(spark):
    from opentimes_spark.operators.spatial import within_buffered_polygon

    pts = spark.createDataFrame(
        [("mainland", 10.0, 10.0), ("lake", 50.0, 50.5), ("off", 200.0, 50.0)],
        "id string, x_5071 double, y_5071 double",
    )
    outer = [(0.0, 0.0), (100.0, 0.0), (100.0, 100.0), (0.0, 100.0)]
    lake = [(40.0, 40.0), (60.0, 40.0), (60.0, 60.0), (40.0, 60.0)]
    got = {
        r["id"]
        for r in within_buffered_polygon(pts, [outer, lake], 0.0).collect()
    }
    assert got == {"mainland"}
    # single-ring call still works (no lake → lake point is inside)
    got1 = {
        r["id"] for r in within_buffered_polygon(pts, outer, 0.0).collect()
    }
    assert got1 == {"mainland", "lake"}


def test_spatial_grid_join_matches_broadcast(spark):
    """Grid-partitioned join (no broadcast) must agree with the
    broadcast PIP join on random points over overlapping polygons,
    across cell sizes smaller and larger than the polygons."""
    import random

    from opentimes_spark.operators.spatial import spatial_grid_join

    rng = random.Random(3)
    pts_rows = [
        (f"p{i}", rng.uniform(-2.0, 14.0), rng.uniform(-2.0, 8.0))
        for i in range(300)
    ]
    pts = spark.createDataFrame(pts_rows, "id string, x double, y double")
    rings = {
        "east": [(5.0, 0.0), (10.0, 0.0), (10.0, 5.0), (5.0, 5.0)],
        "west": [(0.0, 0.0), (5.0, 0.0), (5.0, 5.0), (0.0, 5.0)],
        # concave C-shape spanning both grid rows
        "cee": [(11.0, 0.0), (13.0, 0.0), (13.0, 1.0), (12.0, 1.0),
                (12.0, 4.0), (13.0, 4.0), (13.0, 5.0), (11.0, 5.0)],
    }
    want = {
        r["id"]: r["polygon_id"]
        for r in spatial_join_contains(pts, list(rings.items())).collect()
        if r["polygon_id"] is not None
    }
    polys = spark.createDataFrame(
        [(k, [[x, y] for x, y in v]) for k, v in rings.items()],
        "poly_id string, ring array<array<double>>",
    )
    for cell in (1.7, 4.0, 20.0):
        got = {
            r["id"]: r["poly_id"]
            for r in spatial_grid_join(
                pts, polys, cell, point_id_col="id"
            ).collect()
        }
        assert got == want, f"cell={cell}"


def test_spatial_grid_join_keep_all_and_bad_mode(spark):
    from opentimes_spark.operators.spatial import spatial_grid_join

    pts = spark.createDataFrame([("p", 1.0, 1.0)], "id string, x double, y double")
    sq = [[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]]
    polys = spark.createDataFrame(
        [("a", sq), ("b", sq)], "poly_id string, ring array<array<double>>"
    )
    both = spatial_grid_join(pts, polys, 1.0, point_id_col="id", keep="all")
    assert sorted(r.poly_id for r in both.collect()) == ["a", "b"]
    first = spatial_grid_join(pts, polys, 1.0, point_id_col="id", keep="first")
    assert [r.poly_id for r in first.collect()] == ["a"]
    with pytest.raises(ValueError, match="keep mode"):
        spatial_grid_join(pts, polys, 1.0, point_id_col="id", keep="nope")
