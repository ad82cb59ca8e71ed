"""Vector-tile sink: Web-Mercator tiling in Spark + a pure-Python
Mapbox Vector Tile (MVT) encoder and PMTiles v3 container writer.

Reference parity: ``data/src/create_tiles.sh:19-63`` shells out to
tippecanoe to turn GeoJSON into a ``.pmtiles`` archive (layer name
"geometry", one ``id`` string attribute) plus a file-count index JSON.
SURVEY.md §2.1 S14 marked the sink out-of-engine-scope for the shell
step; this module closes the row Spark-first instead:

- **tile assignment is column math** (`tile_xy`): lon/lat → (x, y,
  in-tile px/py) at a zoom level, pure JVM expressions — the whole
  corpus is binned with zero Python and one groupBy((z,x,y)) shuffle,
  exactly how a 100 TB point table must be tiled;
- **per-tile encoding is an Arrow-batched grouped map**
  (`write_vector_tiles` → ``applyInPandas``): each (x, y) group
  serializes to one MVT blob — protobuf wire format hand-rolled from
  the public Mapbox Vector Tile 2.1 spec (varint + zigzag + packed
  fields; no protobuf library needed);
- **PMTiles v3 assembly is a driver-side packaging step**
  (`write_pmtiles`): header + gzip'd varint directory + tile data,
  per the public PMTiles v3 spec (Hilbert-curve tile ids) — the same
  single-process finish the reference delegates to tippecanoe, fed by
  the distributed encode instead of a local GeoJSON.

Determinism: gzip streams are written with mtime=0 and features sort
by id inside each tile, so re-runs produce byte-identical archives
(the content-addressed publish contract everything else follows).
"""

from __future__ import annotations

import gzip
import os
import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MVT_EXTENT = 4096


# --------------------------------------------------------------------------
# Web-Mercator tile math (column expressions — the distributed half)
# --------------------------------------------------------------------------


MERCATOR_MAX_LAT = 85.0511287798066  # atan(sinh(pi)) — the Web-Mercator edge


def tile_xy(lon: Column, lat: Column, zoom: int) -> tuple[Column, Column, Column, Column]:
    """(tile_x, tile_y, pixel_x, pixel_y) at ``zoom`` — the standard
    Web-Mercator tiling formulas as pure JVM column math.  ``pixel``
    coords are tile-local in the MVT extent grid [0, 4096).

    Inputs are CLAMPED to the projection's domain (lon ±180, lat
    ±85.0511) before tiling, the same boundary handling tippecanoe
    applies: a legal point AT lon=180 or beyond the Mercator latitude
    edge lands in the last tile row/column instead of producing a tile
    index outside [0, 2^zoom) that aborts the whole sink at archive
    time (hilbert_tile_id range check)."""
    n = float(2**zoom)
    lon_c = F.least(F.greatest(lon, F.lit(-180.0)), F.lit(180.0))
    lat_c = F.least(
        F.greatest(lat, F.lit(-MERCATOR_MAX_LAT)), F.lit(MERCATOR_MAX_LAT)
    )
    # clamp the PROJECTED plane to [0, n): the lon=180 / lat-edge point
    # then lands in the last tile at its edge pixel, not at tile n.
    # The epsilon is a FIXED sub-tile offset (2^-20 of one tile, ~4e-3
    # of an MVT pixel): a zoom-scaled epsilon (1e-9 * n) exceeds a whole
    # tile at zoom >= 30 and would drop edge points into tile n-2.
    eps = 2.0**-20
    xf = F.least(
        F.greatest((lon_c + 180.0) / 360.0 * n, F.lit(0.0)), F.lit(n - eps)
    )
    lat_r = F.radians(lat_c)
    yf_raw = (
        (1.0 - F.log(F.tan(lat_r) + 1.0 / F.cos(lat_r)) / 3.141592653589793)
        / 2.0
        * n
    )
    yf = F.least(F.greatest(yf_raw, F.lit(0.0)), F.lit(n - eps))
    tx = F.floor(xf).cast("int")
    ty = F.floor(yf).cast("int")
    px = F.floor((xf - F.floor(xf)) * MVT_EXTENT).cast("int")
    py = F.floor((yf - F.floor(yf)) * MVT_EXTENT).cast("int")
    return tx, ty, px, py


# --------------------------------------------------------------------------
# Protobuf wire-format primitives (public spec; no library)
# --------------------------------------------------------------------------


def varint(n: int) -> bytes:
    if n < 0:
        raise ValueError("varint is unsigned; zigzag first")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _field(num: int, wire: int) -> bytes:
    return varint((num << 3) | wire)


def _len_delim(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + varint(len(payload)) + payload


def _packed(num: int, values: list[int]) -> bytes:
    return _len_delim(num, b"".join(varint(v) for v in values))


# --------------------------------------------------------------------------
# MVT layer encoding (Mapbox Vector Tile spec 2.1)
# --------------------------------------------------------------------------


def encode_mvt_point_layer(
    name: str, features: list[tuple[int, int, int, str]]
) -> bytes:
    """One-layer MVT tile of POINT features.

    ``features`` = [(feature_id, px, py, id_attr)] with tile-local
    coords in [0, extent).  Mirrors the reference's tippecanoe config:
    layer carries a single string attribute ``id`` (``-y id -T
    id:string``, create_tiles.sh:22)."""
    keys = [b"id"]
    values: list[bytes] = []
    value_ix: dict[str, int] = {}
    feats = b""
    for fid, px, py, id_attr in sorted(features):
        if id_attr not in value_ix:
            value_ix[id_attr] = len(values)
            values.append(_len_delim(1, id_attr.encode("utf-8")))
        # geometry: MoveTo(count=1) + zigzag deltas from (0, 0)
        geom = [(1 << 3) | 1, zigzag(px), zigzag(py)]
        body = (
            _field(1, 0)
            + varint(fid)
            + _packed(2, [0, value_ix[id_attr]])  # tags: key 0 -> value ix
            + _field(3, 0)
            + varint(1)  # GeomType POINT
            + _packed(4, geom)
        )
        feats += _len_delim(2, body)
    layer = (
        _field(15, 0)
        + varint(2)  # version (required, field 15)
        + _len_delim(1, name.encode("utf-8"))
        + feats
        + b"".join(_len_delim(3, k) for k in keys)
        + b"".join(_len_delim(4, v) for v in values)
        + _field(5, 0)
        + varint(MVT_EXTENT)
    )
    return _len_delim(3, layer)  # Tile.layers


# --------------------------------------------------------------------------
# PMTiles v3 (public spec): Hilbert tile ids, varint directory, header
# --------------------------------------------------------------------------


def hilbert_tile_id(z: int, x: int, y: int) -> int:
    """PMTiles v3 tile id: tiles ordered z-major, Hilbert-curve within
    each zoom (spec examples: (0,0,0)=0, (1,0,0)=1, (1,0,1)=2,
    (1,1,1)=3, (1,1,0)=4, (2,0,0)=5)."""
    if not (0 <= x < 2**z and 0 <= y < 2**z):
        raise ValueError(f"tile ({x},{y}) outside zoom {z}")
    acc = (4**z - 1) // 3  # tiles in all lower zooms
    # xy -> hilbert d (standard iterative algorithm)
    rx = ry = 0
    d = 0
    s = 2 ** (z - 1) if z else 0
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        # rotate
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return acc + d


def _gz(data: bytes) -> bytes:
    return gzip.compress(data, mtime=0)


def _encode_directory(
    entries: list[tuple[int, int, int]], runs: list[int] | None = None
) -> bytes:
    """PMTiles v3 directory: [(tile_id, offset, length)] sorted by id →
    varint columns (count, delta ids, run lengths, lengths, offsets+1).
    ``runs`` defaults to all-1 (tile entries); leaf-pointer entries in a
    root directory pass run_length 0 per the spec."""
    order = sorted(range(len(entries)), key=lambda i: entries[i])
    entries = [entries[i] for i in order]
    runs = [1] * len(entries) if runs is None else [runs[i] for i in order]
    out = varint(len(entries))
    last = 0
    for tid, _, _ in entries:
        out += varint(tid - last)
        last = tid
    for r in runs:
        out += varint(r)  # 0 marks a leaf-directory pointer
    for _, _, length in entries:
        out += varint(length)
    for _, offset, _ in entries:
        out += varint(offset + 1)  # 0 means "contiguous"; spec stores +1
    return out


def _build_directories(
    entries: list[tuple[int, int, int]],
    max_root_entries: int,
    leaf_entries: int,
) -> tuple[bytes, bytes]:
    """(gzip'd root directory, leaf-directory section bytes).

    Small archives keep the single-root fast path (empty leaf section).
    Past ``max_root_entries`` tile entries, the spec's leaf tier kicks
    in: tile entries are chunked id-ordered into leaves of
    ``leaf_entries``, each gzip'd into the leaf section; the root then
    holds one POINTER entry per leaf — tile_id = first id in the leaf,
    offset/length = the leaf's slice of the leaf section, run_length = 0
    (the spec's leaf marker).  Root size is n/leaf_entries, so a
    100M-tile planet archive keeps its root inside the first fetch
    while lookups touch exactly one leaf."""
    entries = sorted(entries)
    if len(entries) <= max_root_entries:
        return _gz(_encode_directory(entries)), b""
    leaf_section = b""
    root_entries: list[tuple[int, int, int]] = []
    for i in range(0, len(entries), leaf_entries):
        chunk = entries[i : i + leaf_entries]
        leaf = _gz(_encode_directory(chunk))
        root_entries.append((chunk[0][0], len(leaf_section), len(leaf)))
        leaf_section += leaf
    root = _gz(_encode_directory(root_entries, runs=[0] * len(root_entries)))
    return root, leaf_section


def write_pmtiles(
    path: str,
    tiles: list[tuple[int, int, int, bytes]],
    metadata: bytes = b"{}",
    max_root_entries: int = 4096,
    leaf_entries: int = 2048,
) -> dict:
    """Assemble a PMTiles v3 archive from [(z, x, y, mvt_bytes)].
    Returns the header fields for inspection.  Up to
    ``max_root_entries`` tiles the directory is a single root; beyond
    that the spec's LEAF tier engages (``_build_directories``): the
    root becomes run_length-0 pointer entries into gzip'd leaves of
    ``leaf_entries`` each, so archive size no longer bounds root size —
    the >10k-tiles-per-publish case from SCALE.md.  Tile DATA is
    gzip'd per tile, directories+metadata gzip'd, all mtime=0."""
    if not tiles:
        raise ValueError("no tiles to write")
    zs = [t[0] for t in tiles]
    data = b""
    entries = []
    for z, x, y, blob in sorted(
        tiles, key=lambda t: hilbert_tile_id(t[0], t[1], t[2])
    ):
        gz_blob = _gz(blob)
        entries.append((hilbert_tile_id(z, x, y), len(data), len(gz_blob)))
        data += gz_blob
    root, leaf_section = _build_directories(
        entries, max_root_entries, leaf_entries
    )
    meta = _gz(metadata)

    header_len = 127
    root_off = header_len
    meta_off = root_off + len(root)
    leaf_off = meta_off + len(meta)
    data_off = leaf_off + len(leaf_section)
    header = b"PMTiles" + bytes([3])
    header += struct.pack(
        "<QQQQQQQQQQQ",
        root_off,
        len(root),
        meta_off,
        len(meta),
        leaf_off,
        len(leaf_section),
        data_off,
        len(data),
        len(entries),  # addressed tiles
        len(entries),  # tile entries
        len(entries),  # tile contents
    )
    header += bytes([1])  # clustered: true
    header += bytes([2, 2])  # internal + tile compression: gzip
    header += bytes([1])  # tile type: MVT
    header += bytes([min(zs), max(zs)])
    # bounds/center e7 (computed from tile coverage is overkill here;
    # world bounds keep readers happy)
    header += struct.pack("<iiii", -180 * 10**7, -85 * 10**7, 180 * 10**7, 85 * 10**7)
    header += bytes([min(zs)]) + struct.pack("<ii", 0, 0)
    header = header.ljust(header_len, b"\x00")
    assert len(header) == header_len

    with open(path, "wb") as f:
        f.write(header + root + meta + leaf_section + data)
    return {
        "n_tiles": len(entries),
        "root_len": len(root),
        "leaf_len": len(leaf_section),
        "data_len": len(data),
        "minzoom": min(zs),
        "maxzoom": max(zs),
    }


def _decode_directory(dir_bytes: bytes) -> list[tuple[int, int, int, int]]:
    """[(tile_id, run_length, offset, length)] from a gunzip'd v3
    directory."""
    pos = 0

    def rv() -> int:
        nonlocal pos
        shift = val = 0
        while True:
            b = dir_bytes[pos]
            pos += 1
            val |= (b & 0x7F) << shift
            if not b & 0x80:
                return val
            shift += 7

    n = rv()
    ids = []
    last = 0
    for _ in range(n):
        last += rv()
        ids.append(last)
    runs = [rv() for _ in range(n)]
    lengths = [rv() for _ in range(n)]
    offsets = [rv() - 1 for _ in range(n)]
    return list(zip(ids, runs, offsets, lengths))


def read_pmtiles_tile(path: str, z: int, x: int, y: int) -> bytes | None:
    """Minimal PMTiles v3 reader (round-trip check + the browser-side
    lookup contract): header → gunzip root directory → resolve the tile
    id, following at most ONE run_length-0 leaf pointer (gunzip that
    leaf, search inside) → gunzip tile bytes.  Exactly the spec's
    two-level lookup: a remote client pays one ranged read for the leaf
    and one for the tile, never the whole directory."""
    want = hilbert_tile_id(z, x, y)
    with open(path, "rb") as f:
        blob = f.read()
    if blob[:7] != b"PMTiles" or blob[7] != 3:
        raise ValueError("not a PMTiles v3 archive")
    fields = struct.unpack("<QQQQQQQQQQQ", blob[8:96])
    root_off, root_len, _, _, leaf_off, _, data_off, _ = fields[:8]
    entries = _decode_directory(
        gzip.decompress(blob[root_off : root_off + root_len])
    )
    # Floor search (bisect — directory entries are id-ascending by
    # construction): the governing entry is the last one with
    # id <= want (exact-match for tile entries, range containment for
    # leaves).  A planet-scale root holds ~n/leaf_entries pointer
    # entries; binary search keeps the lookup sublinear like the spec
    # implementations.
    import bisect

    i = bisect.bisect_right([e[0] for e in entries], want) - 1
    if i < 0:
        return None
    floor = entries[i]
    if floor[1] == 0:  # leaf pointer — descend once
        _, _, off, ln = floor
        leaf = _decode_directory(
            gzip.decompress(blob[leaf_off + off : leaf_off + off + ln])
        )
        match = [e for e in leaf if e[0] == want]
        if not match:
            return None
        _, _, off, ln = match[0]
        return gzip.decompress(blob[data_off + off : data_off + off + ln])
    if floor[0] != want:
        return None
    _, _, off, ln = floor
    return gzip.decompress(blob[data_off + off : data_off + off + ln])


# --------------------------------------------------------------------------
# The Spark sink
# --------------------------------------------------------------------------


def encode_tiles(
    points: DataFrame,
    zoom: int,
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    layer: str = "geometry",
) -> DataFrame:
    """points → one row per (z, x, y) tile with the encoded MVT blob.

    Tile binning is JVM column math; each tile group encodes in one
    Arrow batch (`applyInPandas`).  Feature ids are dense per tile
    (sorted by the id attribute) so output bytes are deterministic."""
    import pandas as pd

    from opentimes_spark.session import ship_package

    ship_package(points.sparkSession)
    tx, ty, px, py = tile_xy(F.col(lon_col), F.col(lat_col), zoom)
    binned = points.select(
        F.col(id_col).cast("string").alias("fid"),
        tx.alias("tx"),
        ty.alias("ty"),
        px.alias("px"),
        py.alias("py"),
    )

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        from opentimes_spark.operators.tiles import encode_mvt_point_layer

        feats = [
            (i, int(r.px), int(r.py), str(r.fid))
            for i, r in enumerate(
                pdf.sort_values("fid").itertuples(index=False), start=1
            )
        ]
        blob = encode_mvt_point_layer(layer, feats)
        return pd.DataFrame(
            {
                "z": [zoom],
                "x": [int(pdf.tx.iloc[0])],
                "y": [int(pdf.ty.iloc[0])],
                "n_features": [len(feats)],
                "mvt": [blob],
            }
        )

    return binned.groupBy("tx", "ty").applyInPandas(
        encode, "z int, x int, y int, n_features long, mvt binary"
    )


def write_vector_tiles(
    points: DataFrame,
    out_dir: str,
    zoom: int,
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> dict:
    """The full S14 sink: encode tiles distributed, then package a
    ``tiles.pmtiles`` archive plus a per-tile count index JSON (the
    reference's tiles-*.json consumed by the map JS) on the driver.
    Tile blobs are tile-sized (KBs) and tile COUNTS are bounded by
    4^zoom — collecting them is a catalog-sized driver action, the
    same boundary where the reference runs tippecanoe."""
    import json

    rows = encode_tiles(points, zoom, id_col, lon_col, lat_col).collect()
    os.makedirs(out_dir, exist_ok=True)
    stats = write_pmtiles(
        os.path.join(out_dir, "tiles.pmtiles"),
        [(r["z"], r["x"], r["y"], bytes(r["mvt"])) for r in rows],
        metadata=json.dumps({"layer": "geometry", "zoom": zoom}).encode(),
    )
    index = {
        f"{r['z']}/{r['x']}/{r['y']}": r["n_features"]
        for r in sorted(rows, key=lambda r: (r["z"], r["x"], r["y"]))
    }
    with open(os.path.join(out_dir, "tiles-index.json"), "w", encoding="utf-8") as f:
        json.dump(index, f, sort_keys=True)
    return {**stats, "n_features": sum(r["n_features"] for r in rows)}
