"""Vector-tile sink (S14): protobuf wire primitives, MVT layer bytes,
PMTiles v3 Hilbert ids + container round-trip, and the Spark tiling
end-to-end — all against the PUBLIC specs (Mapbox Vector Tile 2.1,
PMTiles v3), verified by an independent mini protobuf decoder here."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from opentimes_spark.operators.tiles import (
    MVT_EXTENT,
    encode_mvt_point_layer,
    encode_tiles,
    hilbert_tile_id,
    read_pmtiles_tile,
    tile_xy,
    varint,
    write_pmtiles,
    write_vector_tiles,
    zigzag,
)


def test_varint_and_zigzag_known_values():
    assert varint(0) == b"\x00"
    assert varint(1) == b"\x01"
    assert varint(127) == b"\x7f"
    assert varint(128) == b"\x80\x01"
    assert varint(300) == b"\xac\x02"  # protobuf docs example
    assert [zigzag(n) for n in (0, -1, 1, -2, 2)] == [0, 1, 2, 3, 4]


def test_hilbert_tile_ids_match_pmtiles_spec_examples():
    assert hilbert_tile_id(0, 0, 0) == 0
    assert hilbert_tile_id(1, 0, 0) == 1
    assert hilbert_tile_id(1, 0, 1) == 2
    assert hilbert_tile_id(1, 1, 1) == 3
    assert hilbert_tile_id(1, 1, 0) == 4
    assert hilbert_tile_id(2, 0, 0) == 5
    # bijective within a zoom
    ids = {hilbert_tile_id(3, x, y) for x in range(8) for y in range(8)}
    assert len(ids) == 64 and min(ids) == (4**3 - 1) // 3


def _decode_pb(buf: bytes):
    """Minimal independent protobuf walker: [(field, wire, value)]."""
    out, pos = [], 0

    def rv():
        nonlocal pos
        shift = val = 0
        while True:
            b = buf[pos]
            pos += 1
            val |= (b & 0x7F) << shift
            if not b & 0x80:
                return val
            shift += 7

    while pos < len(buf):
        tag = rv()
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            out.append((field, 0, rv()))
        elif wire == 2:
            ln = rv()
            out.append((field, 2, buf[pos : pos + ln]))
            pos += ln
        else:
            raise AssertionError(f"unexpected wire type {wire}")
    return out


def test_mvt_layer_decodes_per_spec():
    tile = encode_mvt_point_layer("geometry", [(1, 100, 200, "c1"), (2, 5, 6, "c2")])
    (layers,) = _decode_pb(tile)
    assert layers[0] == 3  # Tile.layers
    fields = _decode_pb(layers[2])
    by_field = {}
    for f, _, v in fields:
        by_field.setdefault(f, []).append(v)
    assert by_field[15] == [2]  # version
    assert by_field[1] == [b"geometry"]  # name
    assert by_field[5] == [MVT_EXTENT]
    assert by_field[3] == [b"id"]  # keys
    assert len(by_field[2]) == 2  # two features
    feat = _decode_pb(by_field[2][0])
    fmap = {f: v for f, _, v in feat}
    assert fmap[1] == 1 and fmap[3] == 1  # id, GeomType POINT
    # geometry: MoveTo(1) + zigzag(100), zigzag(200)
    geom = _decode_pb(b"\x22" + varint(len(fmap[4])) + fmap[4])
    assert fmap[4] == varint((1 << 3) | 1) + varint(200) + varint(400)
    assert geom  # packed bytes decoded as one length-delimited field


def test_pmtiles_round_trip_and_missing_tile(tmp_path):
    t1 = encode_mvt_point_layer("geometry", [(1, 10, 20, "a")])
    t2 = encode_mvt_point_layer("geometry", [(1, 30, 40, "b")])
    path = str(tmp_path / "t.pmtiles")
    stats = write_pmtiles(path, [(4, 3, 5, t1), (4, 3, 6, t2)])
    assert stats["n_tiles"] == 2 and stats["minzoom"] == stats["maxzoom"] == 4
    with open(path, "rb") as f:
        assert f.read(8) == b"PMTiles\x03"
    assert read_pmtiles_tile(path, 4, 3, 5) == t1
    assert read_pmtiles_tile(path, 4, 3, 6) == t2
    assert read_pmtiles_tile(path, 4, 0, 0) is None


def test_pmtiles_output_is_deterministic(tmp_path):
    t1 = encode_mvt_point_layer("geometry", [(1, 10, 20, "a")])
    p1, p2 = str(tmp_path / "a.pmtiles"), str(tmp_path / "b.pmtiles")
    write_pmtiles(p1, [(2, 1, 1, t1)])
    write_pmtiles(p2, [(2, 1, 1, t1)])
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_tile_xy_known_points(spark):
    df = spark.createDataFrame(
        [("gw", -0.0005, 51.4773), ("eq", 0.0005, -0.0005)],
        "id string, lon double, lat double",
    )
    tx, ty, px, py = tile_xy(F.col("lon"), F.col("lat"), 1)
    rows = {
        r["id"]: r
        for r in df.select("id", tx.alias("x"), ty.alias("y")).collect()
    }
    # Greenwich, northern hemisphere → west-north tile (0, 0) at z=1;
    # just-east-of-meridian southern point → east-south tile (1, 1)
    assert (rows["gw"]["x"], rows["gw"]["y"]) == (0, 0)
    assert (rows["eq"]["x"], rows["eq"]["y"]) == (1, 1)


def test_spark_tiling_end_to_end(spark, tmp_path):
    from opentimes_spark.io.read import read_table

    c = read_table(spark, "/root/testdata/sf0.001", "customer")
    pts = c.select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("id"),
        (F.lit(-100.0) + (F.col("c_custkey") % 200) * 0.1).alias("lon"),
        (F.lit(30.0) + (F.col("c_custkey") % 150) * 0.1).alias("lat"),
    )
    zoom = 4
    enc = encode_tiles(pts, zoom).collect()
    # every point lands in exactly one tile
    assert sum(r["n_features"] for r in enc) == pts.count()
    # the grouped counts must equal an independent JVM-side bin count
    tx, ty, _, _ = tile_xy(F.col("lon"), F.col("lat"), zoom)
    want = {
        (zoom, r["tx"], r["ty"]): r["n"]
        for r in pts.select(tx.alias("tx"), ty.alias("ty"))
        .groupBy("tx", "ty")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {(r["z"], r["x"], r["y"]): r["n_features"] for r in enc}
    assert got == want

    out = str(tmp_path / "tiles")
    stats = write_vector_tiles(pts, out, zoom)
    assert stats["n_tiles"] == len(want)
    assert stats["n_features"] == pts.count()
    import json

    index = json.load(open(f"{out}/tiles-index.json"))
    assert sum(index.values()) == pts.count()
    # a tile read back from the archive decodes to its feature count
    (z, x, y), n = next(iter(sorted(want.items())))
    blob = read_pmtiles_tile(f"{out}/tiles.pmtiles", z, x, y)
    (layers,) = _decode_pb(blob)
    n_feats = sum(1 for f, _, _ in _decode_pb(layers[2]) if f == 2)
    assert n_feats == n


def test_pmtiles_leaf_tier_round_trip(tmp_path):
    """Past max_root_entries the spec's leaf-directory tier engages:
    every tile must still resolve through the root->leaf->data path,
    misses must return None, and the header must carve a leaf section."""
    z = 7
    tiles = [(z, x, y, f"tile-{x}-{y}".encode()) for x in range(10) for y in range(5)]
    path = str(tmp_path / "leaf.pmtiles")
    stats = write_pmtiles(path, tiles, max_root_entries=8, leaf_entries=4)
    assert stats["n_tiles"] == 50
    assert stats["leaf_len"] > 0
    for zz, x, y, blob in tiles:
        assert read_pmtiles_tile(path, zz, x, y) == blob
    assert read_pmtiles_tile(path, z, 99, 99) is None
    assert read_pmtiles_tile(path, z, 10, 0) is None


def test_pmtiles_small_archive_keeps_single_root(tmp_path):
    t1 = b"only-tile"
    path = str(tmp_path / "root.pmtiles")
    stats = write_pmtiles(path, [(3, 1, 2, t1)])
    assert stats["leaf_len"] == 0
    assert read_pmtiles_tile(path, 3, 1, 2) == t1


def test_pmtiles_leaf_boundary_ids(tmp_path):
    """First and last ids of each leaf chunk are the floor-search edge
    cases; a miss BELOW the first root id must return None."""
    z = 6
    tiles = [(z, x, 0, bytes([x])) for x in range(1, 33)]  # x=0 absent
    path = str(tmp_path / "edge.pmtiles")
    write_pmtiles(path, tiles, max_root_entries=4, leaf_entries=4)
    for zz, x, y, blob in tiles:
        assert read_pmtiles_tile(path, zz, x, y) == blob
    assert read_pmtiles_tile(path, z, 0, 0) is None


def test_tile_xy_clamps_domain_edges(spark):
    """Points AT the projection boundary (lon=180, |lat| past the
    Mercator edge, the poles) must land in the last tile row/column at
    its edge — never at tile index 2^zoom, which hilbert_tile_id
    rejects and which would abort the whole sink."""
    from pyspark.sql import functions as F

    from opentimes_spark.operators.tiles import tile_xy

    z = 4
    rows = [
        (0, 180.0, 0.0), (1, -180.0, 0.0), (2, 0.0, 90.0),
        (3, 0.0, -90.0), (4, 179.9999, 85.3), (5, 200.0, -86.0),
    ]
    df = spark.createDataFrame(rows, "id int, lon double, lat double")
    tx, ty, px, py = tile_xy(F.col("lon"), F.col("lat"), z)
    out = df.select("id", tx.alias("tx"), ty.alias("ty"),
                    px.alias("px"), py.alias("py")).collect()
    n = 2 ** z
    for r in out:
        assert 0 <= r["tx"] < n and 0 <= r["ty"] < n, dict(r.asDict())
        assert 0 <= r["px"] < 4096 and 0 <= r["py"] < 4096
    by = {r["id"]: r for r in out}
    assert by[0]["tx"] == n - 1 and by[0]["px"] == 4095  # east edge
    assert by[1]["tx"] == 0
    assert by[2]["ty"] == 0          # north pole -> top row
    assert by[3]["ty"] == n - 1      # south pole -> bottom row


def test_pmtiles_default_params_realistic_tile_count(tmp_path):
    """~10⁴ tiles with the DEFAULT archive parameters — past
    max_root_entries=4096 the leaf tier engages for real (not via the
    shrunken test knobs above): the root holds ceil(n/2048) pointer
    entries, and every one of the 10,000 tile ids must resolve through
    the root→leaf→data path with its exact payload (VERDICT r5 item 7)."""
    import gzip as _gzip
    import struct as _struct

    z = 7  # 128×128 grid holds 16,384 ids
    n = 10_000
    tiles = [
        (z, i % 128, i // 128, b"payload-%d" % i) for i in range(n)
    ]
    path = str(tmp_path / "big.pmtiles")
    stats = write_pmtiles(path, tiles)  # default root/leaf sizing
    assert stats["n_tiles"] == n
    assert stats["leaf_len"] > 0, "leaf tier must engage at 10k tiles"
    # root really is pointer entries: decode it and count
    from opentimes_spark.operators.tiles import _decode_directory

    with open(path, "rb") as f:
        blob = f.read()
    root_off, root_len = _struct.unpack("<QQ", blob[8:24])
    root = _decode_directory(_gzip.decompress(blob[root_off:root_off + root_len]))
    assert len(root) == (n + 2048 - 1) // 2048
    assert all(run == 0 for _, run, _, _ in root), "root must be all leaf pointers"
    for zz, x, y, payload in tiles:
        assert read_pmtiles_tile(path, zz, x, y) == payload
    # misses on both sides of the id range and inside a leaf's id gap
    assert read_pmtiles_tile(path, z, 127, 127) is None
    assert read_pmtiles_tile(path, 3, 0, 0) is None
