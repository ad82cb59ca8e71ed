"""Pure-Python ESRI Shapefile reader (S5) — no geopandas/fiona needed.

Parses the two members that matter from a zipped shapefile (the
reference's TIGER/Line input, utils/census.py load_shapefile):

- ``.shp`` (geometry): 100-byte main header, then records of
  [record header (big-endian rec#, content words)] + [shape]. Shape
  types supported: 0 null, 1 point, 3 polyline, 5 polygon (the types
  TIGER ships). Polygon parts are split into rings; ring orientation
  (signed area) distinguishes outer rings (CW per the spec) from holes
  (CCW), yielding POLYGON/MULTIPOLYGON WKT.
- ``.dbf`` (attributes): dBase III layout — 32-byte field descriptors
  until 0x0D, fixed-width latin-1 records, 'N'/'F' fields parsed to
  numbers.

Both formats are public specifications (ESRI Shapefile Technical
Description, 1998; dBase III). Output mirrors the geopandas path:
one row per feature, normalized attribute names + a ``wkt`` column —
so the Spark-side consumers (spatial operators take coordinate rings)
are identical either way.
"""

from __future__ import annotations

import struct
import zipfile


def _rings_from_parts(pts, parts):
    n = len(pts)
    bounds = list(parts) + [n]
    return [pts[bounds[i] : bounds[i + 1]] for i in range(len(parts))]


def _signed_area2(ring) -> float:
    s = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:] + ring[:1]):
        s += x1 * y2 - x2 * y1
    return s


def _wkt_ring(ring) -> str:
    return "(" + ", ".join(f"{x:.10g} {y:.10g}" for x, y in ring) + ")"


def _point_in_ring(x: float, y: float, ring) -> bool:
    inside = False
    for (x1, y1), (x2, y2) in zip(ring, ring[1:] + ring[:1]):
        if (y1 > y) != (y2 > y) and x < (x2 - x1) * (y - y1) / (y2 - y1) + x1:
            inside = not inside
    return inside


def _polygon_wkt(rings) -> str:
    """Group shapefile rings into polygons: CW rings (negative signed
    area) are outers, CCW rings are holes. The spec says ring ORDER is
    not significant, so each hole is attached to the smallest outer
    ring containing its first vertex (handles islands-in-lakes), not
    simply the most recently seen outer."""
    outers = [r for r in rings if _signed_area2(r) <= 0]
    holes = [r for r in rings if _signed_area2(r) > 0]
    if not outers:  # degenerate all-CCW record: treat each as its own outer
        polys: list[list[list[tuple[float, float]]]] = [[r] for r in rings]
    else:
        polys = [[o] for o in outers]
        for h in holes:
            x, y = h[0]
            containing = [
                p for p in polys if _point_in_ring(x, y, p[0])
            ]
            if containing:
                min(containing, key=lambda p: abs(_signed_area2(p[0]))).append(h)
            else:  # touching/degenerate: fall back to last outer
                polys[-1].append(h)
    if len(polys) == 1:
        return "POLYGON (" + ", ".join(_wkt_ring(r) for r in polys[0]) + ")"
    return "MULTIPOLYGON (" + ", ".join(
        "(" + ", ".join(_wkt_ring(r) for r in p) + ")" for p in polys
    ) + ")"


def parse_shp(b: bytes) -> list[str | None]:
    """.shp bytes → WKT per record (None for null shapes)."""
    if struct.unpack(">i", b[0:4])[0] != 9994:
        raise ValueError("not a shapefile (.shp magic mismatch)")
    file_len = struct.unpack(">i", b[24:28])[0] * 2  # words → bytes
    out: list[str | None] = []
    off = 100
    while off < file_len:
        content_words = struct.unpack(">i", b[off + 4 : off + 8])[0]
        rec = b[off + 8 : off + 8 + content_words * 2]
        off += 8 + content_words * 2
        shape_type = struct.unpack("<i", rec[0:4])[0]
        if shape_type == 0:
            out.append(None)
        elif shape_type == 1:
            x, y = struct.unpack("<2d", rec[4:20])
            out.append(f"POINT ({x:.10g} {y:.10g})")
        elif shape_type in (3, 5):
            num_parts, num_points = struct.unpack("<2i", rec[36:44])
            parts = struct.unpack(f"<{num_parts}i", rec[44 : 44 + 4 * num_parts])
            coords = struct.unpack(
                f"<{2 * num_points}d",
                rec[44 + 4 * num_parts : 44 + 4 * num_parts + 16 * num_points],
            )
            pts = list(zip(coords[0::2], coords[1::2]))
            rings = _rings_from_parts(pts, parts)
            if shape_type == 3:
                if len(rings) == 1:
                    out.append("LINESTRING " + _wkt_ring(rings[0]))
                else:
                    out.append(
                        "MULTILINESTRING ("
                        + ", ".join(_wkt_ring(r) for r in rings)
                        + ")"
                    )
            else:
                out.append(_polygon_wkt(rings))
        else:
            raise ValueError(f"unsupported shape type {shape_type}")
    return out


def parse_dbf(b: bytes) -> tuple[list[tuple[str, str, int, int]], list[list], list[int]]:
    """.dbf bytes → (field specs, rows, deleted record indices).

    Field specs are ``(name, type, length, decimals)`` straight from the
    descriptor block — the declared type drives parsing AND the Spark
    schema downstream ('N' with decimals / 'F' → float, 'N' without →
    int, 'D' → date, 'L' → bool, 'M' → memo block pointer resolved by
    the zip reader, everything else stripped strings), so a blank value
    in the first record cannot mistype a column. Parsing follows the
    DECLARED type even for spec-sloppy values: a '123.0' or '1.2e2' in
    an integer ('N', 0 decimals) field truncates via int(float(...)) —
    real-world TIGER .dbf files contain these, and the alternative is a
    createDataFrame type error three calls later. Records flagged
    deleted ('*') are excluded from ``rows``; their 0-based positions
    are returned so the caller can drop the positionally-paired
    shapes."""
    import datetime
    n_rec = struct.unpack("<i", b[4:8])[0]
    header_size, record_size = struct.unpack("<2H", b[8:12])
    fields = []
    off = 32
    while b[off] != 0x0D:
        desc = b[off : off + 32]
        name = desc[0:11].split(b"\0")[0].decode("latin-1")
        ftype = desc[11:12].decode("latin-1")
        length = desc[16]
        decimals = desc[17]
        fields.append((name, ftype, length, decimals))
        off += 32
    rows: list[list] = []
    deleted: list[int] = []
    off = header_size
    for i in range(n_rec):
        rec = b[off : off + record_size]
        off += record_size
        if rec[0:1] == b"*":  # soft-deleted: skip, remember the slot
            deleted.append(i)
            continue
        vals, pos = [], 1
        for name, ftype, length, decimals in fields:
            raw = rec[pos : pos + length].decode("latin-1").strip()
            pos += length
            if ftype in ("N", "F") and raw:
                if ftype == "F" or decimals > 0:
                    vals.append(float(raw))
                elif "." in raw or "e" in raw.lower():
                    vals.append(int(float(raw)))  # sloppy-but-real DBFs
                else:
                    vals.append(int(raw))
            elif ftype in ("N", "F"):
                vals.append(None)
            elif ftype == "D":
                vals.append(
                    datetime.date(int(raw[0:4]), int(raw[4:6]), int(raw[6:8]))
                    if len(raw) == 8 and raw.isdigit() and raw != "00000000"
                    else None
                )
            elif ftype == "L":
                # len check matters: a blank (uninitialized) field strips
                # to "" and the bare substring test `"" in "YyTt"` is
                # True — blanks must load as NULL, not True
                vals.append(
                    True if len(raw) == 1 and raw in "YyTt"
                    else False if len(raw) == 1 and raw in "NnFf"
                    else None
                )
            elif ftype == "M":
                # memo fields store a block pointer into the sidecar .dbt;
                # read_zipped_shapefile resolves it to text when present
                vals.append(int(raw) if raw.isdigit() else None)
            else:
                vals.append(raw)
        rows.append(vals)
    return fields, rows, deleted


def read_memo(dbt: bytes, block: int | None) -> str | None:
    """dBase III .dbt memo: text begins at ``block``·512 and runs to the
    0x1A terminator (or end of file)."""
    if block is None or block <= 0 or block * 512 >= len(dbt):
        return None
    chunk = dbt[block * 512 :]
    end = chunk.find(b"\x1a")
    return chunk[: end if end >= 0 else len(chunk)].decode("latin-1").strip()


def read_zipped_shapefile(
    zip_path: str,
) -> tuple[list[str], list[list], list[tuple[str, str, int, int]]]:
    """Zipped shapefile → (column names incl. trailing 'wkt', rows,
    dbf field specs). Sidecars are paired by STEM (roads.shp ↔
    roads.dbf ↔ roads.dbt), never by independent first-match — a zip
    carrying two layers would otherwise pair one layer's geometry with
    the other's attributes (silently, whenever their record counts
    happen to agree).  A multi-layer zip raises with the layer names.
    Shapes paired with deleted .dbf records are dropped with them.
    Memo ('M') block pointers resolve to text through the sidecar .dbt
    member when present, NULL otherwise."""
    with zipfile.ZipFile(zip_path) as z:
        def stem(n: str) -> str:
            return n.rsplit(".", 1)[0]

        shp_names = [n for n in z.namelist() if n.lower().endswith(".shp")]
        if not shp_names:
            raise ValueError(f"{zip_path}: no .shp member")
        if len(shp_names) > 1:
            raise ValueError(
                f"{zip_path}: multiple shapefile layers "
                f"{sorted(stem(n) for n in shp_names)} — extract one"
            )
        shp_name = shp_names[0]
        # Stems compare case-insensitively to match the extension rule:
        # 8.3-era archives routinely mix ROADS.SHP with roads.dbf, and
        # the pairing is still unambiguous.
        dbf_name = next(
            (
                n for n in z.namelist()
                if n.lower().endswith(".dbf")
                and stem(n).lower() == stem(shp_name).lower()
            ),
            None,
        )
        if dbf_name is None:
            raise ValueError(
                f"{zip_path}: no .dbf sidecar named {stem(shp_name)}.dbf"
            )
        wkts = parse_shp(z.read(shp_name))
        fields, rows, deleted = parse_dbf(z.read(dbf_name))
        dbt_name = next(
            (
                n for n in z.namelist()
                if n.lower().endswith(".dbt")
                and stem(n).lower() == stem(shp_name).lower()
            ),
            None,
        )
        memo_idx = [i for i, f in enumerate(fields) if f[1] == "M"]
        if memo_idx:
            dbt = z.read(dbt_name) if dbt_name else b""
            for r in rows:
                for i in memo_idx:
                    r[i] = read_memo(dbt, r[i]) if dbt else None
    if deleted and len(wkts) == len(rows) + len(deleted):
        drop = set(deleted)
        wkts = [w for i, w in enumerate(wkts) if i not in drop]
    if len(rows) != len(wkts):
        raise ValueError(
            f".dbf has {len(rows)} records but .shp has {len(wkts)} shapes"
        )
    names = [f[0] for f in fields]
    return names + ["wkt"], [r + [w] for r, w in zip(rows, wkts)], fields


def wkt_rings(wkt: str) -> list[list[tuple[float, float]]]:
    """POLYGON/MULTIPOLYGON WKT → list of coordinate rings (outer +
    holes, flat) — the input shape the spatial operators take
    (within_buffered_polygon consumes multi-ring geometries with
    even-odd semantics, so flattening loses nothing)."""
    import re

    rings = []
    for grp in re.findall(r"\(([^()]+)\)", wkt):
        pts = []
        for pair in grp.split(","):
            x, y = pair.split()
            pts.append((float(x), float(y)))
        rings.append(pts)
    return rings
