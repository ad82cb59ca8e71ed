"""Spatial joins (SURVEY.md J4/J5) — broadcast polygons + Arrow-batched
pandas UDF containment, the Spark-native shape of the reference's
``gpd.sjoin(predicate='contains')`` (opentimes create_cenloc.py:91) and
buffered-within (create_destpoint.py:57-71).

Scale design: polygons are dimension-sized (a state's TIGER polygons are
kilobytes—megabytes), points are the fact side. Broadcasting the polygon
set and streaming points through ``mapInPandas`` keeps the join
shuffle-free; at national scale the fact side is first partitioned by
state (as the reference's per-state file layout does), so each task only
tests its state's polygons. Polygons are plain coordinate rings
(array<struct<x,y>>-like nested lists), no geometry library required.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from opentimes_spark.functions.geometry import points_in_polygon


def spatial_join_contains(
    points: DataFrame,
    polygons: list[tuple[str, list[tuple[float, float]]]],
    x_col: str = "x",
    y_col: str = "y",
    out_col: str = "polygon_id",
) -> DataFrame:
    """Tag each point with the id of the (first, by id order) polygon
    containing it; points in no polygon get NULL. ``polygons`` is a
    driver-side list of (id, ring) — broadcast to executors."""
    from opentimes_spark.session import ship_package

    spark = points.sparkSession
    ship_package(spark)
    polys = sorted(polygons, key=lambda p: p[0])
    rings = [(pid, np.asarray(ring, dtype=np.float64)) for pid, ring in polys]
    bc = spark.sparkContext.broadcast(rings)
    schema = StructType(
        points.schema.fields + [StructField(out_col, StringType(), True)]
    )

    def tag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = bc.value
        for batch in batches:
            px = batch[x_col].to_numpy(dtype=np.float64)
            py = batch[y_col].to_numpy(dtype=np.float64)
            out = np.full(len(batch), None, dtype=object)
            unassigned = np.ones(len(batch), dtype=bool)
            for pid, ring in local:
                if not unassigned.any():
                    break
                hit = unassigned & points_in_polygon(px, py, ring)
                out[hit] = pid
                unassigned &= ~hit
            batch = batch.copy()
            batch[out_col] = out
            yield batch

    return points.mapInPandas(tag, schema)


def within_buffered_polygon(
    points: DataFrame,
    ring: list[tuple[float, float]] | list[list[tuple[float, float]]],
    buffer_m: float,
    x_col: str = "x_5071",
    y_col: str = "y_5071",
) -> DataFrame:
    """J5 buffered-within, POLYGON form (reference create_destpoint.py:
    57-59 buffers the state polygon with shapely in EPSG:5071 and keeps
    contained centroids): keep points inside the polygon dilated by
    ``buffer_m`` meters. Coordinates must be planar meters (EPSG:5071 —
    buffering in a projected CRS, like the reference). Concave rings are
    handled exactly: the dilation predicate is inside-or-within-distance
    (functions/geometry.py points_within_buffer), no buffered ring is
    ever constructed. ``ring`` may also be a LIST of rings (MultiPolygon
    with islands/holes, even-odd semantics — real TIGER states need
    this). The geometry is broadcast; points stream through
    mapInPandas — zero shuffles."""
    from opentimes_spark.session import ship_package

    spark = points.sparkSession
    ship_package(spark)
    # a ring's first element is an (x, y) pair (ndim 1); a multi
    # geometry's first element is itself a ring (ndim 2)
    multi = np.ndim(ring[0]) == 2
    rings = (
        [np.asarray(r, dtype=np.float64) for r in ring]
        if multi
        else [np.asarray(ring, dtype=np.float64)]
    )
    bc = spark.sparkContext.broadcast(rings)

    def keep(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from opentimes_spark.functions.geometry import points_within_buffer_multi

        local = bc.value
        for batch in batches:
            px = batch[x_col].to_numpy(dtype=np.float64)
            py = batch[y_col].to_numpy(dtype=np.float64)
            yield batch[points_within_buffer_multi(px, py, local, buffer_m)]

    return points.mapInPandas(keep, points.schema)


def within_buffer_of_point(
    points: DataFrame,
    center_lon: float,
    center_lat: float,
    buffer_m: float,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """J5 buffered-within, distance form: keep points within ``buffer_m``
    meters of a center (the reference buffers a state polygon by 300 km;
    for convex/near-convex state use a distance-to-boundary test — here
    the simpler center+radius form used by tests; polygon-buffer variant
    composes spatial_join_contains on a dilated ring)."""
    from pyspark.sql import functions as F  # noqa: F811

    dist = _haversine_col(
        F.col(lon_col), F.col(lat_col), F.lit(center_lon), F.lit(center_lat)
    )
    return points.filter(dist <= buffer_m)


def _haversine_col(lon1, lat1, lon2, lat2):
    """Column-expression haversine (meters) — JVM-side, codegen."""
    dla = F.radians(lat2) - F.radians(lat1)
    dlo = F.radians(lon2) - F.radians(lon1)
    h = F.pow(F.sin(dla / 2), 2) + F.cos(F.radians(lat1)) * F.cos(
        F.radians(lat2)
    ) * F.pow(F.sin(dlo / 2), 2)
    return 2 * F.lit(6371008.8) * F.asin(F.sqrt(h))


def project_points(
    df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    x_col: str = "x_5071",
    y_col: str = "y_5071",
) -> DataFrame:
    """Append EPSG:5071 projected coordinates via an Arrow-batched pandas
    UDF over the numpy Albers kernel (functions/geometry.py)."""
    from opentimes_spark.session import ship_package

    ship_package(df.sparkSession)
    import pandas as pd  # noqa: F811
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("x double, y double")
    def _proj(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        from opentimes_spark.functions.geometry import project_5071

        x, y = project_5071(lon.to_numpy(), lat.to_numpy())
        return pd.DataFrame({"x": x, "y": y})

    proj = _proj(F.col(lon_col), F.col(lat_col))
    return df.withColumn("_xy", proj).select(
        "*", F.col("_xy.x").alias(x_col), F.col("_xy.y").alias(y_col)
    ).drop("_xy")


POINT_CELL = "_cx", "_cy"


def spatial_grid_join(
    points: DataFrame,
    polygons: DataFrame,
    cell_size: float,
    point_id_col: str,
    x_col: str = "x",
    y_col: str = "y",
    poly_id_col: str = "poly_id",
    ring_col: str = "ring",
    keep: str = "first",
) -> DataFrame:
    """Points-in-polygons when the polygon side is TOO BIG TO BROADCAST
    (country-scale parcel/tract sets): both sides hash into a planar
    grid and meet in an equi join on the cell key — the same
    grid-bucket rewrite ranges.py applies to interval joins, in 2-D.

    - polygon side: bbox per ring (JVM `transform`/`array_min` — no
      UDF), exploded to every covered cell; a polygon appears once per
      cell it overlaps (bounded fan-out: ~(w/cell+1)·(h/cell+1));
    - point side: one cell per point (`floor(x/cs)`), so each
      (point, polygon) candidate pair arises in EXACTLY one cell — no
      post-join dedup of pairs is needed;
    - exact ray-casting verify runs per candidate batch, vectorized per
      polygon group (Arrow batch → numpy, functions/geometry.py).

    ``keep="first"`` ties multi-polygon hits to the smallest polygon id
    (same contract as spatial_join_contains); ``keep="all"`` emits every
    containing polygon. Cell size tunes shuffle width vs fan-out: aim
    for cells ~the median polygon bbox, so most polygons explode to
    O(1) cells and a cell's candidate list stays executor-sized.
    """
    if keep not in ("first", "all"):
        raise ValueError(f"unknown keep mode: {keep}")
    reserved = {*POINT_CELL, "_pid", "_ring", "_rn"}
    clash = sorted(reserved & ({*points.columns} | {*polygons.columns}))
    if clash:
        raise ValueError(
            f"spatial_grid_join: input columns {clash} collide with reserved "
            "helper names; rename them before the join"
        )
    from opentimes_spark.session import ship_package

    ship_package(points.sparkSession)
    cs = float(cell_size)
    cx, cy = POINT_CELL

    xs = F.transform(F.col(ring_col), lambda p: p[0])
    ys = F.transform(F.col(ring_col), lambda p: p[1])
    poly_cells = (
        polygons.select(
            F.col(poly_id_col).alias("_pid"),
            F.col(ring_col).alias("_ring"),
            F.explode(
                F.sequence(
                    F.floor(F.array_min(xs) / cs), F.floor(F.array_max(xs) / cs)
                )
            ).alias(cx),
            F.sequence(
                F.floor(F.array_min(ys) / cs), F.floor(F.array_max(ys) / cs)
            ).alias("_cys"),
        )
        .select("_pid", "_ring", cx, F.explode(F.col("_cys")).alias(cy))
    )
    pts = points.withColumn(cx, F.floor(F.col(x_col) / cs)).withColumn(
        cy, F.floor(F.col(y_col) / cs)
    )
    cand = pts.join(poly_cells, [cx, cy]).drop(cx, cy)

    out_fields = [f for f in cand.schema.fields if f.name != "_ring"]
    schema = StructType(out_fields)

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not len(batch):
                continue
            px = batch[x_col].to_numpy(dtype=np.float64)
            py = batch[y_col].to_numpy(dtype=np.float64)
            keep_mask = np.zeros(len(batch), dtype=bool)
            pos = {c: i for i, c in enumerate(batch.columns)}
            arr_ring = batch.iloc[:, pos["_ring"]]
            for _, idx in batch.groupby("_pid", sort=False).indices.items():
                ring = np.asarray(
                    [list(p) for p in arr_ring.iloc[idx[0]]], dtype=np.float64
                )
                keep_mask[idx] = points_in_polygon(px[idx], py[idx], ring)
            yield batch.loc[keep_mask, [f.name for f in out_fields]]

    hits = cand.mapInPandas(verify, schema).withColumnRenamed("_pid", poly_id_col)
    if keep == "all":
        return hits
    from pyspark.sql import Window

    w = Window.partitionBy(point_id_col).orderBy(poly_id_col)
    return (
        hits.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
