"""Point snapping (SURVEY.md X4): snap each point to the nearest
road-network node before routing.

Reference: opentimes calls OSRM ``/nearest`` once per point in a Python
loop (data/src/utils/times.py:645-683) — explicitly the slow path. The
Spark-native shape batches whole Arrow frames per request set inside
``mapInPandas``: one service client per task, vectorized nearest-neighbor
per batch. The mock network here is a deterministic coordinate grid
(nearest node = rounded lon/lat); a real OSRM client drops into the same
``snap_batch`` seam with an HTTP session.

Output mirrors the reference's points schema: lon/lat, snapped coords
coalesced to raw where the service returns nothing, ``is_snapped``
derived (utils/times.py:680-682).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

SNAP_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("lon", DoubleType(), False),
        StructField("lat", DoubleType(), False),
        StructField("lon_snapped", DoubleType(), False),
        StructField("lat_snapped", DoubleType(), False),
        StructField("is_snapped", BooleanType(), False),
    ]
)


class GridSnapService:
    """Mock nearest-node service: the road network is a 0.01° grid over a
    bounded extent (CONUS by default); points outside the extent or
    farther than ``max_dist_deg`` from a node stay unsnapped (service
    returns nothing — coalesce keeps the raw coords)."""

    def __init__(
        self,
        grid_deg: float = 0.01,
        max_dist_deg: float = 1.0,
        extent: tuple[float, float, float, float] = (-130.0, 20.0, -60.0, 55.0),
    ):
        self.grid_deg = grid_deg
        self.max_dist_deg = max_dist_deg
        self.extent = extent

    def nearest(self, lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        g = self.grid_deg
        sl = np.round(lon / g) * g
        sa = np.round(lat / g) * g
        x0, y0, x1, y1 = self.extent
        in_extent = (lon >= x0) & (lon <= x1) & (lat >= y0) & (lat <= y1)
        ok = in_extent & (np.hypot(sl - lon, sa - lat) <= self.max_dist_deg)
        return sl, sa, ok


def snap_points(
    points: DataFrame,
    service_factory: Callable[[], object] = GridSnapService,
) -> DataFrame:
    """(id, lon, lat) → points-table rows with snapped coords. One
    service client per task; whole-batch vectorized calls."""
    from opentimes_spark.session import ship_package

    ship_package(points.sparkSession)

    def snap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        svc = service_factory()
        for batch in batches:
            lon = batch["lon"].to_numpy(dtype=np.float64)
            lat = batch["lat"].to_numpy(dtype=np.float64)
            sl, sa, ok = svc.nearest(lon, lat)
            lon_snapped = np.where(ok, sl, lon)
            lat_snapped = np.where(ok, sa, lat)
            yield pd.DataFrame(
                {
                    "id": batch["id"],
                    "lon": lon,
                    "lat": lat,
                    "lon_snapped": lon_snapped,
                    "lat_snapped": lat_snapped,
                    "is_snapped": (lon_snapped != lon) | (lat_snapped != lat),
                }
            )

    # NULL id / coordinates cannot be snapped and would violate the
    # non-nullable output schema — malformed points are excluded up
    # front (same policy as travel_time_matrix).
    return points.select(
        F.col("id").cast("string"), F.col("lon").cast("double"), F.col("lat").cast("double")
    ).filter(
        F.col("id").isNotNull()
        & F.col("lon").isNotNull()
        & F.col("lat").isNotNull()
    ).mapInPandas(snap, SNAP_SCHEMA)
