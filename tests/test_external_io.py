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


def test_zipped_shapefile_missing_file_errors(spark):
    # S5 is pure-Python now (no geopandas gate); a missing archive
    # surfaces as a normal file error
    with pytest.raises(OSError):
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


def _build_shapefile_zip(path, features, deleted=()):
    """Minimal ESRI shapefile writer for tests: polygon features with
    (geoid, name, pop) attributes. features = [(geoid, name, pop,
    rings)] with rings = [[(x, y), ...] outer CW, holes CCW].
    pop=None writes a blank numeric field; indices in ``deleted`` get
    the dBase soft-delete flag (shape stays in .shp, per the spec)."""
    import struct
    import zipfile

    shp_records = []
    for i, (_, _, _, rings) in enumerate(features, start=1):
        pts = [p for r in rings for p in r]
        parts, acc = [], 0
        for r in rings:
            parts.append(acc)
            acc += len(r)
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        content = struct.pack("<i", 5)
        content += struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
        content += struct.pack("<2i", len(rings), len(pts))
        content += struct.pack(f"<{len(parts)}i", *parts)
        for x, y in pts:
            content += struct.pack("<2d", x, y)
        shp_records.append(
            struct.pack(">2i", i, len(content) // 2) + content
        )
    body = b"".join(shp_records)
    file_len_words = (100 + len(body)) // 2
    header = struct.pack(">i", 9994) + b"\0" * 20 + struct.pack(">i", file_len_words)
    header += struct.pack("<2i", 1000, 5) + struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
    shp = header + body

    # dBase III: GEOID20 C(15), NAME C(10), POP N(9)
    fields = [(b"GEOID20", b"C", 15), (b"NAME", b"C", 10), (b"POP", b"N", 9)]
    descs = b""
    for name, t, ln in fields:
        descs += name.ljust(11, b"\0") + t + b"\0" * 4 + bytes([ln]) + b"\0" * 15
    rec_size = 1 + sum(ln for _, _, ln in fields)
    header_size = 32 + len(descs) + 1
    dbf = (
        bytes([3, 26, 8, 13])
        + struct.pack("<i", len(features))
        + struct.pack("<2H", header_size, rec_size)
        + b"\0" * 20
        + descs
        + b"\x0d"
    )
    for i, (geoid, name, pop, _) in enumerate(features):
        dbf += (
            (b"*" if i in deleted else b" ")
            + geoid.encode().ljust(15)
            + name.encode().ljust(10)
            + ("" if pop is None else str(pop)).encode().rjust(9)
        )
    dbf += b"\x1a"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("state.shp", shp)
        z.writestr("state.dbf", dbf)


def test_load_zipped_shapefile_pure_python(spark, tmp_path):
    """S5 un-gated: zipped TIGER-style shapefile parsed with the pure
    .shp/.dbf reader — normalized attribute names, numeric field types,
    polygon-with-hole and multipolygon WKT."""
    square_cw = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)]
    hole_ccw = [(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)]
    island_cw = [(20.0, 0.0), (20.0, 2.0), (22.0, 2.0), (22.0, 0.0), (20.0, 0.0)]
    zp = str(tmp_path / "tiger_state.zip")
    _build_shapefile_zip(
        zp,
        [
            ("17", "Illinois", 12812508, [square_cw, hole_ccw]),
            ("18", "Indiana", 6785528, [island_cw]),
        ],
    )
    df = load_zipped_shapefile(spark, zp)
    assert df.columns == ["geoid", "name", "pop", "wkt"]  # GEOID20 → geoid
    rows = {r["geoid"]: r for r in df.collect()}
    assert rows["17"]["pop"] == 12812508 and rows["18"]["name"] == "Indiana"
    assert rows["17"]["wkt"].startswith("POLYGON ((0 0, 0 10, 10 10")
    assert "(4 4, 6 4, 6 6, 4 6, 4 4)" in rows["17"]["wkt"]  # the hole
    assert rows["18"]["wkt"].startswith("POLYGON ((20 0")

    # parsed rings drive the real containment operator end-to-end
    import re

    outer = [
        tuple(map(float, p.split()))
        for p in re.findall(r"[-\d.]+ [-\d.]+", rows["17"]["wkt"])[:5]
    ]
    from opentimes_spark.functions.geometry import points_in_polygon

    import numpy as np

    assert points_in_polygon(
        np.array([5.0, 15.0]), np.array([2.0, 2.0]), np.array(outer)
    ).tolist() == [True, False]


def test_shapefile_mixed_case_sidecar_pairing(spark, tmp_path):
    """8.3-era archives mix member-name cases (ROADS.SHP + roads.dbf);
    stems must pair case-insensitively, like the extension match —
    the pairing is still unambiguous."""
    import zipfile

    square = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0), (0.0, 0.0)]
    zp = str(tmp_path / "mixed.zip")
    _build_shapefile_zip(zp, [("17", "Illinois", 7, [square])])
    with zipfile.ZipFile(zp) as z:
        shp, dbf = z.read("state.shp"), z.read("state.dbf")
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("STATE.SHP", shp)
        z.writestr("state.dbf", dbf)
    rows = load_zipped_shapefile(spark, zp).collect()
    assert len(rows) == 1 and rows[0]["pop"] == 7


def test_shapefile_to_destpoint_flow(spark, tmp_path):
    """S5 → J5 integration, the reference's shapefile→buffer→destpoint
    flow: parse the zipped state boundary, take its rings (outer +
    hole, even-odd), keep centroids within the buffered polygon."""
    from opentimes_spark.io.shapefile import wkt_rings
    from opentimes_spark.operators.spatial import within_buffered_polygon

    square_cw = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)]
    hole_ccw = [(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)]
    zp = str(tmp_path / "state.zip")
    _build_shapefile_zip(zp, [("17", "Illinois", 1, [square_cw, hole_ccw])])
    wkt = load_zipped_shapefile(spark, zp).collect()[0]["wkt"]
    rings = wkt_rings(wkt)
    assert len(rings) == 2

    pts = spark.createDataFrame(
        [("in", 2.0, 2.0), ("in_hole", 5.0, 5.0), ("near", 10.5, 5.0),
         ("far", 20.0, 5.0)],
        "id string, x_5071 double, y_5071 double",
    )
    got = {r["id"] for r in within_buffered_polygon(pts, rings, 1.0).collect()}
    # hole center is 1.0 from the hole boundary → included at buffer 1
    assert got == {"in", "in_hole", "near"}
    got0 = {r["id"] for r in within_buffered_polygon(pts, rings, 0.0).collect()}
    assert got0 == {"in"}


def test_shapefile_spec_edge_cases(spark, tmp_path):
    """Spec-legal inputs value-sniffing mishandles: a blank numeric field
    in record 1 (schema must come from the DBF descriptor, not the first
    value), a soft-deleted record (its positionally-paired shape must be
    dropped too), and ring order [outerA, outerB, holeOfA] (the hole
    belongs to the CONTAINING outer, not the most recent one)."""
    sq = lambda x0, y0, s: [  # noqa: E731 — CW outer ring helper
        (x0, y0), (x0, y0 + s), (x0 + s, y0 + s), (x0 + s, y0), (x0, y0)
    ]
    hole_in_a = [(2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0), (2.0, 2.0)]  # CCW
    zp = str(tmp_path / "edge.zip")
    _build_shapefile_zip(
        zp,
        [
            # record 1: blank POP — must still type the column as long
            ("17", "Illinois", None, [sq(0.0, 0.0, 10.0)]),
            # record 2: soft-deleted, shape stays in .shp
            ("99", "Ghost", 1, [sq(100.0, 100.0, 1.0)]),
            # record 3: parts ordered [outerA, outerB, hole-of-A]
            ("18", "Indiana", 123, [sq(0.0, 0.0, 10.0), sq(20.0, 0.0, 5.0), hole_in_a]),
        ],
        deleted={1},
    )
    df = load_zipped_shapefile(spark, zp)
    assert dict(df.dtypes)["pop"] == "bigint"
    rows = {r["geoid"]: r for r in df.collect()}
    assert set(rows) == {"17", "18"}  # deleted record and its shape gone
    assert rows["17"]["pop"] is None
    assert rows["18"]["pop"] == 123
    wkt = rows["18"]["wkt"]
    assert wkt.startswith("MULTIPOLYGON")
    # the hole must sit in outerA's group (the polygon starting at 0 0)
    group_a = wkt[: wkt.index("((20")]
    assert "(2 2, 4 2, 4 4, 2 4, 2 2)" in group_a

def _dbf_bytes(fields, records):
    """fields = [(name bytes, type bytes, length, decimals)]; records =
    list of lists of pre-padded ASCII strings."""
    import struct

    descs = b""
    for name, t, ln, dec in fields:
        descs += (
            name.ljust(11, b"\0") + t + b"\0" * 4 + bytes([ln, dec]) + b"\0" * 14
        )
    rec_size = 1 + sum(f[2] for f in fields)
    header_size = 32 + len(descs) + 1
    dbf = (
        bytes([3, 26, 8, 13])
        + struct.pack("<i", len(records))
        + struct.pack("<2H", header_size, rec_size)
        + b"\0" * 20
        + descs
        + b"\x0d"
    )
    for rec in records:
        dbf += b" " + b"".join(rec)
    return dbf + b"\x1a"


def test_dbf_date_logical_memo_and_sloppy_numeric(spark, tmp_path):
    """TIGER-style extended field types: 'D' dates, 'L' logicals, 'M'
    memo pointers resolved through the sidecar .dbt, and a spec-sloppy
    value ('123.0' in a 0-decimal N field) that must follow the DECLARED
    type (LongType) instead of failing createDataFrame."""
    import datetime
    import zipfile

    from opentimes_spark.io.shapefile import parse_dbf, read_memo

    fields = [
        (b"POP", b"N", 9, 0),
        (b"EFFDATE", b"D", 8, 0),
        (b"ACTIVE", b"L", 1, 0),
        (b"NOTES", b"M", 10, 0),
    ]
    records = [
        [b"    123.0", b"20240131", b"T", b"         1"],
        [b"      456", b"        ", b"?", b"          "],
    ]
    specs, rows, _ = parse_dbf(_dbf_bytes(fields, records))
    assert [f[1] for f in specs] == ["N", "D", "L", "M"]
    assert rows[0][0] == 123 and isinstance(rows[0][0], int)  # declared type wins
    assert rows[0][1] == datetime.date(2024, 1, 31) and rows[1][1] is None
    assert rows[0][2] is True and rows[1][2] is None
    assert rows[0][3] == 1 and rows[1][3] is None  # raw block pointers

    # memo block 1 of a dBase III .dbt: 512-byte blocks, 0x1A terminator
    dbt = b"\0" * 512 + b"state boundary revised\x1a" + b"\0" * 100
    assert read_memo(dbt, 1) == "state boundary revised"
    assert read_memo(dbt, None) is None and read_memo(b"", 1) is None

    # end-to-end through the zip loader: memo text + Date/Boolean schema
    square = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0), (0.0, 0.0)]
    zp = str(tmp_path / "dates.zip")
    _build_shapefile_zip(zp, [("17", "Illinois", 1, [square]), ("18", "Indiana", 2, [square])])
    with zipfile.ZipFile(zp, "a") as z:
        z.writestr("state2.dbf", b"")  # ignored: first .dbf wins
    # rebuild with extended dbf replacing the default one
    with zipfile.ZipFile(zp, "w") as z:
        import struct as _s

        content = _s.pack("<i", 5) + _s.pack("<4d", 0, 0, 1, 1) + _s.pack("<2i", 1, 5)
        content += _s.pack("<1i", 0)
        for x, y in square:
            content += _s.pack("<2d", x, y)
        body = _s.pack(">2i", 1, len(content) // 2) + content
        body += _s.pack(">2i", 2, len(content) // 2) + content
        hdr = _s.pack(">i", 9994) + b"\0" * 20 + _s.pack(">i", (100 + len(body)) // 2)
        hdr += _s.pack("<2i", 1000, 5) + _s.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
        z.writestr("s.shp", hdr + body)
        z.writestr("s.dbf", _dbf_bytes(fields, records))
        z.writestr("s.dbt", dbt)
    df = load_zipped_shapefile(spark, zp)
    assert dict(df.dtypes)["effdate"] == "date" and dict(df.dtypes)["active"] == "boolean"
    got = sorted(df.collect(), key=lambda r: r["pop"])
    assert got[0]["notes"] == "state boundary revised"
    assert got[1]["notes"] is None and got[0]["effdate"] == datetime.date(2024, 1, 31)


def test_dbf_blank_logical_is_null():
    """A space-filled logical field must load as NULL — the bare
    substring test ('' in 'YyTt') would call it True."""
    from opentimes_spark.io.shapefile import parse_dbf

    # minimal dbf: header + one 'L' field, three records: Y, N, blank
    import struct

    fields = [("FLAG", "L", 1)]
    n_rec = 3
    header_len = 32 + 32 * len(fields) + 1
    rec_len = 1 + sum(f[2] for f in fields)
    out = struct.pack(
        "<BBBBIHH20x", 3, 24, 1, 1, n_rec, header_len, rec_len
    )
    for name, ftype, ln in fields:
        out += name.encode().ljust(11, b"\x00") + ftype.encode()
        out += b"\x00" * 4 + bytes([ln]) + b"\x00" * 15
    out += b"\x0d"
    for v in (b"Y", b"N", b" "):
        out += b" " + v
    out += b"\x1a"
    _, rows, _ = parse_dbf(out)
    assert [r[0] for r in rows] == [True, False, None]


def test_fetch_files_disambiguates_colliding_basenames(tmp_path):
    """Two urls sharing a basename must both survive (hash-prefixed),
    not silently clobber each other."""
    from opentimes_spark.io.external import fetch_files

    urls = [
        "http://x/state01/tract.zip",
        "http://x/state02/tract.zip",
        "http://x/unique/other.zip",
    ]
    out = fetch_files(urls, str(tmp_path), fetcher=lambda u: u.encode())
    assert len(set(out)) == 3
    contents = sorted(open(p, "rb").read() for p in out)
    assert contents == sorted(u.encode() for u in urls)
    # the non-colliding name stays clean
    assert any(p.endswith("/other.zip") for p in out)


def test_normalize_collision_dedupes():
    """A .dbf carrying two vintages of the same attribute (GEOID +
    GEOID20) must not produce duplicate columns; all-digit names keep
    their original lowercase instead of normalizing to ''."""
    assert normalize_shapefile_columns(["GEOID", "GEOID20", "WKT2"]) == [
        "geoid", "geoid_", "wkt",
    ]
    assert normalize_shapefile_columns(["123", "456"]) == ["c123_", "c456_"]


def test_fetch_files_no_zero_byte_artifact_on_failure(tmp_path):
    """A failed fetch must not strand an empty file a retry would
    mistake for a completed download."""
    import pytest

    from opentimes_spark.io.external import fetch_files

    def fetcher(url):
        if "bad" in url:
            raise OSError("simulated 404")
        return b"payload"

    with pytest.raises(OSError):
        fetch_files(
            ["http://x/a.zip", "http://x/bad.zip"],
            str(tmp_path),
            fetcher=fetcher,
            max_workers=1,
        )
    leftover = sorted(p.name for p in tmp_path.iterdir())
    assert "bad.zip" not in leftover
    assert all(not n.endswith(".part") for n in leftover)
