"""External sources/sinks (SURVEY.md §2.1 S5/S6/S7/S11) with injected
deterministic fetchers — the network/geo gates stay closed, the Spark
plumbing is exercised for real."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from opentimes_spark.io.external import (
    fetch_files,
    fetch_json_table,
    load_zipped_shapefile,
    normalize_shapefile_columns,
    write_geojson,
)


def test_fetch_json_table_census_shape(spark):
    payload = [
        ["P1_001N", "state", "county", "tract", "block"],
        ["42", "17", "031", "010100", "1000"],
        ["0", "17", "031", "010100", "1001"],
    ]

    schema = T.StructType(
        [
            T.StructField("state", T.StringType()),
            T.StructField("county", T.StringType()),
            T.StructField("block", T.StringType()),
            T.StructField("P1_001N", T.IntegerType()),
        ]
    )
    df = fetch_json_table(
        spark, "http://fake/census", schema,
        fetcher=lambda url: json.dumps(payload).encode(),
    )
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [("17", "031", "1000", 42), ("17", "031", "1001", 0)]
    assert dict(df.dtypes)["P1_001N"] == "int"


def test_fetch_files_parallel(tmp_path):
    got = fetch_files(
        ["http://x/a.zip", "http://x/b.zip"],
        str(tmp_path),
        fetcher=lambda url: url.encode(),
    )
    assert sorted(p.rsplit("/", 1)[1] for p in got) == ["a.zip", "b.zip"]
    assert open(got[0], "rb").read().startswith(b"http://x/")


def test_normalize_shapefile_columns():
    assert normalize_shapefile_columns(["GEOID20", "ALAND20", "name"]) == [
        "geoid",
        "aland",
        "name",
    ]


def test_zipped_shapefile_gate(spark):
    try:
        import geopandas  # noqa: F401

        pytest.skip("geopandas present; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        load_zipped_shapefile(spark, "/tmp/none.zip")


def test_write_geojson_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", -87.6, 41.9), ("b", -95.4, 29.8)], ["id", "lon", "lat"]
    )
    out = str(tmp_path / "pts.geojson")
    n = write_geojson(df, out)
    fc = json.load(open(out))
    assert n == 2 and fc["type"] == "FeatureCollection"
    assert sorted(f["properties"]["id"] for f in fc["features"]) == ["a", "b"]
    assert fc["features"][0]["geometry"]["type"] == "Point"


def test_write_geojson_polygon(tmp_path):
    """S11 polygon sink: closed ring, valid GeoJSON structure."""
    import json

    from opentimes_spark.io.external import write_geojson_polygon

    ring = [(-91.5, 37.0), (-87.5, 37.0), (-87.5, 42.5), (-91.5, 42.5)]
    path = str(tmp_path / "clip.geojson")
    n = write_geojson_polygon(ring, path, {"state": "17", "buffer_m": 100000})
    assert n == 5  # closed: first vertex repeated
    with open(path) as f:
        fc = json.load(f)
    feat = fc["features"][0]
    assert feat["geometry"]["type"] == "Polygon"
    coords = feat["geometry"]["coordinates"][0]
    assert coords[0] == coords[-1]
    assert feat["properties"]["state"] == "17"


def test_osmclip_to_geojson_roundtrip(tmp_path):
    """osmclip stage end-to-end: buffered boundary → GeoJSON file the
    way create_osmclip.py ships its clip boundary."""
    import json

    from opentimes_spark.io.external import write_geojson_polygon
    from opentimes_spark.plans.pipeline import build_osmclip

    il = [(-91.5, 37.0), (-87.5, 37.0), (-87.5, 42.5), (-91.5, 42.5)]
    ring = build_osmclip(il, buffer_m=50_000.0)
    path = str(tmp_path / "osmclip_17.geojson")
    write_geojson_polygon(ring, path, {"state": "17"})
    with open(path) as f:
        fc = json.load(f)
    coords = fc["features"][0]["geometry"]["coordinates"][0]
    assert len(coords) > 50
    lons = [c[0] for c in coords]
    lats = [c[1] for c in coords]
    # buffered box extends beyond the raw bounds in every direction
    assert min(lons) < -91.5 and max(lons) > -87.5
    assert min(lats) < 37.0 and max(lats) > 42.5
