"""Geometry kernel (SURVEY.md F14): CRS projection and point-in-polygon,
implemented in vectorized numpy for use inside Arrow-batched pandas UDFs.

The reference wraps pyproj/shapely (opentimes data/src/utils/census.py:
50-71,100-107,159-169); neither library ships in this container, so the
two kernels it actually needs are implemented directly from the public
formulas:

- **EPSG:5071** (NAD83 / Conus Albers): Albers equal-area conic on the
  GRS80 ellipsoid, standard parallels 29.5°/45.5°, origin (23°N, 96°W).
  Formulas: Snyder, *Map Projections — A Working Manual* (USGS PP 1395),
  eqs. 14-1..14-24. Exact forward + iterative-free inverse (series-free
  via Newton on the authalic latitude is avoided by the closed-form
  asin from Snyder 3-18).
- **Point-in-polygon**: vectorized ray casting (even-odd rule) — exact
  for the rectilinear synthetic fixtures and standard for real polygons.

Everything is ndarray-in/ndarray-out so a pandas UDF processes whole
Arrow batches per call.
"""

from __future__ import annotations

import numpy as np

# GRS80 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257222101
_E2 = _F * (2 - _F)
_E = np.sqrt(_E2)

# EPSG:5071 parameters
_LAT0, _LON0 = np.radians(23.0), np.radians(-96.0)
_SP1, _SP2 = np.radians(29.5), np.radians(45.5)


def _q(lat: np.ndarray) -> np.ndarray:
    """Snyder eq. 3-12: authalic-latitude helper q."""
    s = np.sin(lat)
    return (1 - _E2) * (
        s / (1 - _E2 * s * s)
        - (1 / (2 * _E)) * np.log((1 - _E * s) / (1 + _E * s))
    )


def _m(lat: np.ndarray) -> np.ndarray:
    """Snyder eq. 14-15: m = cosφ / sqrt(1 − e²sin²φ)."""
    s = np.sin(lat)
    return np.cos(lat) / np.sqrt(1 - _E2 * s * s)


_M1, _M2 = _m(_SP1), _m(_SP2)
_Q0, _Q1, _Q2 = _q(_LAT0), _q(_SP1), _q(_SP2)
_N = (_M1 * _M1 - _M2 * _M2) / (_Q2 - _Q1)  # Snyder 14-14
_C = _M1 * _M1 + _N * _Q1  # Snyder 14-13
_RHO0 = _A * np.sqrt(_C - _N * _Q0) / _N  # Snyder 14-12a


def project_5071(lon_deg: np.ndarray, lat_deg: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 lon/lat degrees → EPSG:5071 x/y meters (Snyder 14-1..4)."""
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    q = _q(lat)
    rho = _A * np.sqrt(_C - _N * q) / _N
    theta = _N * (lon - _LON0)
    return rho * np.sin(theta), _RHO0 - rho * np.cos(theta)


def unproject_5071(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:5071 meters → lon/lat degrees (Snyder 14-19..21, 3-18)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    rho = np.sqrt(x * x + (_RHO0 - y) ** 2)
    theta = np.arctan2(x, _RHO0 - y)
    q = (_C - (rho * _N / _A) ** 2) / _N
    # authalic → geodetic latitude, Snyder 3-18 series
    beta = np.arcsin(q / (1 - ((1 - _E2) / (2 * _E)) * np.log((1 - _E) / (1 + _E))))
    lat = (
        beta
        + (_E2 / 3 + 31 * _E2**2 / 180 + 517 * _E2**3 / 5040) * np.sin(2 * beta)
        + (23 * _E2**2 / 360 + 251 * _E2**3 / 3780) * np.sin(4 * beta)
        + (761 * _E2**3 / 45360) * np.sin(6 * beta)
    )
    lon = _LON0 + theta / _N
    return np.degrees(lon), np.degrees(lat)


def points_in_polygon(
    px: np.ndarray, py: np.ndarray, poly: np.ndarray
) -> np.ndarray:
    """Even-odd ray casting: bool mask of points inside ``poly``
    (closed or open ring of shape (k, 2)). Boundary points follow the
    half-open convention (consistent, not symmetric)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    poly = np.asarray(poly, dtype=np.float64)
    if len(poly) > 1 and np.array_equal(poly[0], poly[-1]):
        poly = poly[:-1]
    inside = np.zeros(px.shape, dtype=bool)
    x1, y1 = poly[:, 0], poly[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    for xa, ya, xb, yb in zip(x1, y1, x2, y2):
        crosses = (ya > py) != (yb > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = xa + (py - ya) * (xb - xa) / (yb - ya)
        inside ^= crosses & (px < xint)
    return inside


def dist_to_ring(px: np.ndarray, py: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Vectorized min distance from each point to the polygon BOUNDARY
    (every edge of the closed ring). Standard point–segment projection:
    t = clamp(((p−a)·(b−a)) / |b−a|², 0, 1), dist = |p − (a + t(b−a))|.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    poly = np.asarray(poly, dtype=np.float64)
    if len(poly) > 1 and np.array_equal(poly[0], poly[-1]):
        poly = poly[:-1]
    best = np.full(px.shape, np.inf)
    x1, y1 = poly[:, 0], poly[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    for xa, ya, xb, yb in zip(x1, y1, x2, y2):
        dx, dy = xb - xa, yb - ya
        len2 = dx * dx + dy * dy
        if len2 == 0.0:
            d2 = (px - xa) ** 2 + (py - ya) ** 2
        else:
            t = np.clip(((px - xa) * dx + (py - ya) * dy) / len2, 0.0, 1.0)
            d2 = (px - (xa + t * dx)) ** 2 + (py - (ya + t * dy)) ** 2
        best = np.minimum(best, d2)
    return np.sqrt(best)


def points_within_buffer(
    px: np.ndarray, py: np.ndarray, poly: np.ndarray, distance: float
) -> np.ndarray:
    """EXACT point-in-buffered-polygon predicate, concave-safe, no
    geometry library: Minkowski dilation of a polygon P by a disc of
    radius d is {p : p ∈ P or dist(p, ∂P) ≤ d}, and erosion (d < 0) is
    {p ∈ P : dist(p, ∂P) ≥ |d|}. Computing the predicate directly
    sidesteps the self-intersection pathologies of constructing a
    buffered ring for concave polygons (the reference gets the same
    semantics from shapely's ``buffer`` + containment,
    create_osmclip.py:45-48 / create_destpoint.py:57-59)."""
    inside = points_in_polygon(px, py, poly)
    if distance == 0.0:
        return inside
    d = dist_to_ring(px, py, poly)
    if distance > 0:
        return inside | (d <= distance)
    return inside & (d >= -distance)


def points_within_buffer_multi(
    px: np.ndarray, py: np.ndarray, rings: list[np.ndarray], distance: float
) -> np.ndarray:
    """:func:`points_within_buffer` for MULTI-ring geometries — real
    TIGER state boundaries are MultiPolygons with holes (islands,
    lakes). Even-odd over all rings gives containment (a point inside
    an odd number of rings is land); the boundary ∂P is the union of
    every ring, so dist(p, ∂P) = min over rings. The dilation/erosion
    identities then hold unchanged:
    dilate = inside | (dist ≤ d); erode = inside & (dist ≥ |d|)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    dist = np.full(px.shape, np.inf)
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        inside ^= points_in_polygon(px, py, ring)
        dist = np.minimum(dist, dist_to_ring(px, py, ring))
    if distance == 0.0:
        return inside
    if distance > 0:
        return inside | (dist <= distance)
    return inside & (dist >= -distance)


def clip_ring_bbox(
    poly: np.ndarray, bbox: tuple[float, float, float, float]
) -> np.ndarray:
    """Sutherland–Hodgman clip of a (possibly concave) ring against an
    axis-aligned bbox (xmin, ymin, xmax, ymax) — the reference's
    dateline-guard intersection with a CONUS box
    (create_osmclip.py:50-55). Returns the clipped open ring (may be
    empty)."""
    poly = np.asarray(poly, dtype=np.float64)
    if len(poly) > 1 and np.array_equal(poly[0], poly[-1]):
        poly = poly[:-1]
    xmin, ymin, xmax, ymax = bbox
    # (inside-test, intersection-solver) per bbox edge
    def clip_edge(pts, inside, intersect):
        out = []
        n = len(pts)
        for i in range(n):
            cur, nxt = pts[i], pts[(i + 1) % n]
            cin, nin = inside(cur), inside(nxt)
            if cin:
                out.append(cur)
                if not nin:
                    out.append(intersect(cur, nxt))
            elif nin:
                out.append(intersect(cur, nxt))
        return out

    def x_cross(a, b, x):
        t = (x - a[0]) / (b[0] - a[0])
        return (x, a[1] + t * (b[1] - a[1]))

    def y_cross(a, b, y):
        t = (y - a[1]) / (b[1] - a[1])
        return (a[0] + t * (b[0] - a[0]), y)

    pts = [tuple(p) for p in poly]
    for inside, intersect in (
        (lambda p: p[0] >= xmin, lambda a, b: x_cross(a, b, xmin)),
        (lambda p: p[0] <= xmax, lambda a, b: x_cross(a, b, xmax)),
        (lambda p: p[1] >= ymin, lambda a, b: y_cross(a, b, ymin)),
        (lambda p: p[1] <= ymax, lambda a, b: y_cross(a, b, ymax)),
    ):
        if not pts:
            break
        pts = clip_edge(pts, inside, intersect)
    return np.asarray(pts, dtype=np.float64).reshape(-1, 2)


def buffer_ring(
    poly: np.ndarray, distance: float, arc_steps: int = 8
) -> np.ndarray:
    """Densified OUTLINE of the dilated polygon, for export (the osmclip
    GeoJSON boundary): offset each edge outward by ``distance`` along
    its normal, join consecutive edges with ``arc_steps``-sampled arcs,
    then prune candidates that fall strictly interior to the dilation
    (closer than ``distance`` to a non-adjacent part of the boundary —
    what shapely's buffer resolves via self-intersection removal).
    Exact for convex rings; for concave rings it is the correct outer
    outline as long as the buffer does not merge disjoint lobes.
    CONTAINMENT TESTS must use :func:`points_within_buffer` (exact),
    never point-in-this-ring."""
    if distance <= 0:
        raise ValueError("buffer_ring handles dilation only (distance > 0)")
    poly = np.asarray(poly, dtype=np.float64)
    if len(poly) > 1 and np.array_equal(poly[0], poly[-1]):
        poly = poly[:-1]
    # ensure counter-clockwise orientation so outward = left-rotated normal
    area2 = np.sum(
        poly[:, 0] * np.roll(poly[:, 1], -1) - np.roll(poly[:, 0], -1) * poly[:, 1]
    )
    if area2 < 0:
        poly = poly[::-1]
    n = len(poly)
    cand: list[tuple[float, float]] = []
    for i in range(n):
        a, b = poly[i], poly[(i + 1) % n]
        e = b - a
        ln = float(np.hypot(e[0], e[1]))
        if ln == 0:
            continue
        nx, ny = e[1] / ln, -e[0] / ln  # outward normal for CCW ring
        cand.append((a[0] + nx * distance, a[1] + ny * distance))
        cand.append((b[0] + nx * distance, b[1] + ny * distance))
        # arc around vertex b: from this edge's normal to the next edge's
        c = poly[(i + 2) % n]
        e2 = c - b
        ln2 = float(np.hypot(e2[0], e2[1]))
        if ln2 == 0:
            continue
        ang1 = float(np.arctan2(ny, nx))
        nx2, ny2 = e2[1] / ln2, -e2[0] / ln2
        ang2 = float(np.arctan2(ny2, nx2))
        sweep = (ang2 - ang1) % (2 * np.pi)
        if sweep > 0 and sweep < np.pi:  # convex corner → outer arc
            for k in range(1, arc_steps):
                ang = ang1 + sweep * k / arc_steps
                cand.append(
                    (b[0] + np.cos(ang) * distance, b[1] + np.sin(ang) * distance)
                )
    pts = np.asarray(cand, dtype=np.float64)
    # prune interior candidates: true boundary points sit at exactly
    # `distance` from ∂P; anything measurably closer is swallowed by a
    # concave neck
    d = dist_to_ring(pts[:, 0], pts[:, 1], poly)
    keep = d >= distance * (1 - 1e-9)
    return pts[keep]


def haversine_m(
    lon1: np.ndarray, lat1: np.ndarray, lon2: np.ndarray, lat2: np.ndarray
) -> np.ndarray:
    """Great-circle distance in meters (spherical, R=6371.0088 km)."""
    la1, la2 = np.radians(lat1), np.radians(lat2)
    dla = la2 - la1
    dlo = np.radians(lon2) - np.radians(lon1)
    h = np.sin(dla / 2) ** 2 + np.cos(la1) * np.cos(la2) * np.sin(dlo / 2) ** 2
    return 2 * 6371008.8 * np.arcsin(np.sqrt(h))
