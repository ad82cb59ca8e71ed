"""External-world sources/sinks (SURVEY.md §2.1 S5/S6/S7/S11).

These are the reference's driver-side ingest steps (Census API JSON,
TIGER/cartographic zip downloads, zipped shapefiles, GeoJSON boundary
outputs — fetch_blockpop.py:30-50, fetch_tiger.py:24-67,
utils/census.py:74-97, create_osmclip.py:58). They are inherently
driver-side: small metadata-scale inputs fetched once, then broadcast or
parallelized as DataFrames. The network/geo libraries are optional —
every function either takes an injectable ``fetcher`` (tests pass a
deterministic fake) or raises ``NotImplementedError`` with the gate
explained, while the Spark-side plumbing (schemas, DataFrame
construction, file layout) is real and tested.
"""

from __future__ import annotations

import json
import os
import re
from collections.abc import Callable, Sequence
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _default_fetcher(url: str) -> bytes:
    try:
        from urllib.request import urlopen
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("no HTTP stack available") from e
    with urlopen(url, timeout=60) as r:  # noqa: S310 — caller controls URL
        return r.read()


def fetch_json_table(
    spark: SparkSession,
    url: str,
    schema: T.StructType,
    fetcher: Callable[[str], bytes] = _default_fetcher,
) -> DataFrame:
    """S6: REST JSON source in the Census PL 94-171 shape — a JSON array
    whose first row is the header and the rest are data rows
    (reference fetch_blockpop.py:30-50). Columns are matched to
    ``schema`` by header name and cast via the schema's types. The
    response is driver-side (metadata scale); at volume, stage responses
    to files and use ``spark.read.json`` instead."""
    payload = json.loads(fetcher(url).decode("utf-8"))
    header, rows = payload[0], payload[1:]
    idx = [header.index(f.name) for f in schema.fields]
    data = [tuple(r[i] for i in idx) for r in rows]
    df = spark.createDataFrame(data, T.StructType([
        T.StructField(f.name, T.StringType(), True) for f in schema.fields
    ]))
    from pyspark.sql import functions as F

    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def fetch_files(
    urls: Sequence[str],
    dest_dir: str,
    fetcher: Callable[[str], bytes] = _default_fetcher,
    max_workers: int = 8,
) -> list[str]:
    """S7: parallel file fetch to a local/staging directory (reference
    thread-pools its cartographic downloads, fetch_cb.py:86-100). Returns
    the written paths, one per url, named by the url basename — except
    when two urls share a basename (``.../state01/tract.zip`` and
    ``.../state02/tract.zip``), where each colliding name gains a short
    url-hash prefix so concurrent writers cannot silently clobber each
    other and drop a file."""
    import hashlib
    from collections import Counter

    os.makedirs(dest_dir, exist_ok=True)
    base_counts = Counter(os.path.basename(u) for u in urls)

    def one(url: str) -> str:
        base = os.path.basename(url)
        if base_counts[base] > 1:
            base = f"{hashlib.md5(url.encode()).hexdigest()[:8]}_{base}"
        out = os.path.join(dest_dir, base)
        # fetch BEFORE creating the file: a failed fetch must not strand
        # a zero-byte artifact a retry/glob would mistake for a download
        body = fetcher(url)
        tmp = out + ".part"
        with open(tmp, "wb") as f:
            f.write(body)
        os.replace(tmp, out)  # atomic: out exists only complete
        return out

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        return list(ex.map(one, urls))


def normalize_shapefile_columns(names: Sequence[str]) -> list[str]:
    """S5 column hygiene (pure, always available): lowercase and strip
    trailing vintage digits from shapefile attribute names the way the
    reference does (utils/census.py:94-96: ``geoid20`` → ``geoid``).

    Collisions keep the FIRST name and de-duplicate later ones with
    appended underscores (``geoid``+``geoid20`` → ``geoid``,
    ``geoid_``): a .dbf carrying both vintages would otherwise produce
    a frame with duplicate columns and AMBIGUOUS_REFERENCE on every
    select.  An all-digit name (stripping would leave '') becomes
    ``c<digits>_``.  Both schemes preserve the function's contract
    (property-tested): idempotent, non-digit-terminal, never empty."""
    out: list[str] = []
    seen: set[str] = set()
    for n in names:
        base = re.sub(r"\d+$", "", n.lower()) or f"c{n.lower()}_"
        while base in seen:
            base += "_"
        seen.add(base)
        out.append(base)
    return out


def load_zipped_shapefile(spark: SparkSession, zip_path: str) -> DataFrame:
    """S5: zipped-shapefile source → DataFrame of normalized attributes
    + WKT geometry, via the pure-Python ESRI parser
    (io/shapefile.py — .shp/.dbf are public fixed formats, no
    geopandas needed). One driver-side parse per file: boundary
    shapefiles are dimension-sized (the reference loads them with a
    single geopandas call per state, utils/census.py); bulk geometry
    belongs in parquet."""
    from opentimes_spark.io.shapefile import read_zipped_shapefile

    names, rows, fields = read_zipped_shapefile(zip_path)
    names = normalize_shapefile_columns(names)
    from pyspark.sql.types import (
        BooleanType,
        DateType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    def _typ(ftype: str, decimals: int):
        # declared DBF type decides — a blank value in record 1 can't
        # mistype a numeric column the way value-sniffing would
        if ftype == "F" or (ftype == "N" and decimals > 0):
            return DoubleType()
        if ftype == "N":
            return LongType()
        if ftype == "D":
            return DateType()
        if ftype == "L":
            return BooleanType()
        # 'M' memo pointers are resolved to text by the zip reader
        return StringType()

    schema = StructType(
        [
            StructField(n, _typ(f[1], f[3]), True)
            for n, f in zip(names, fields)
        ]
        + [StructField(names[-1], StringType(), True)]
    )
    return spark.createDataFrame(rows, schema)


def write_geojson(
    df: DataFrame, path: str, id_col: str = "id",
    lon_col: str = "lon", lat_col: str = "lat",
) -> int:
    """S11: GeoJSON point-collection sink (reference writes boundary
    GeoJSON driver-side, create_osmclip.py:58). Pure-Python writer — no
    geo libs needed for point features. Driver-side by design: GeoJSON
    is for small outputs (clip boundaries, debug layers); big geometry
    goes to parquet. Returns the feature count."""
    rows = df.select(id_col, lon_col, lat_col).collect()
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"id": r[id_col]},
                "geometry": {
                    "type": "Point",
                    "coordinates": [r[lon_col], r[lat_col]],
                },
            }
            for r in rows
        ],
    }
    with open(path, "w") as f:
        json.dump(fc, f)
    return len(rows)


def write_geojson_polygon(
    ring, path: str, properties: dict | None = None
) -> int:
    """S11 polygon variant: write one polygon ring as a GeoJSON Feature —
    the shape of the reference's osmclip boundary file
    (create_osmclip.py:58, `gdf.to_file(driver='GeoJSON')`). Driver-side
    pure-Python; the ring is a small boundary, not data. Returns the
    vertex count."""
    pts = [[float(x), float(y)] for x, y in ring]
    if pts and pts[0] != pts[-1]:
        pts.append(pts[0])  # GeoJSON rings are closed
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": properties or {},
                "geometry": {"type": "Polygon", "coordinates": [pts]},
            }
        ],
    }
    with open(path, "w") as f:
        json.dump(fc, f)
    return len(pts)
