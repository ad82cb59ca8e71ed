"""GEOID decomposition (SURVEY.md F1).

Reference: opentimes data/src/utils/census.py:110-156 (``split_geoid``) —
Census GEOIDs are fixed-width zero-padded strings; the prefix encodes the
hierarchy: state=chars 1-2, county=3-5, tract=6-11, block_group=12,
block=12-15. Valid lengths: 2 (state), 5 (county), 11 (tract),
12 (block group), 15 (block). All slicing is string slicing — GEOIDs must
NEVER be cast to integers (leading zeros are significant).

Everything here is a pure column expression → whole-stage codegen, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GEOID_GEOGRAPHY_BY_LENGTH = {
    2: "state",
    5: "county",
    11: "tract",
    12: "block_group",
    15: "block",
}


def geoid_geography(geoid: Column) -> Column:
    """Geography level implied by GEOID length; NULL for invalid lengths
    (the reference raises — in a distributed pipeline an invalid-row NULL
    plus a downstream invariant check beats failing the whole job)."""
    expr = F.lit(None).cast("string")
    for length, name in GEOID_GEOGRAPHY_BY_LENGTH.items():
        expr = F.when(F.length(geoid) == length, F.lit(name)).otherwise(expr)
    return expr


def split_geoid(geoid: Column) -> dict[str, Column]:
    """Decompose a GEOID into its hierarchy components (NULL where the
    GEOID is too short for that level). Mirrors census.py:123-145."""
    ln = F.length(geoid)
    return {
        "geography": geoid_geography(geoid),
        "state": F.when(ln >= 2, F.substring(geoid, 1, 2)),
        "county": F.when(ln >= 5, F.substring(geoid, 3, 3)),
        "tract": F.when(ln >= 11, F.substring(geoid, 6, 6)),
        "block_group": F.when(ln >= 12, F.substring(geoid, 12, 1)),
        "block": F.when(ln >= 15, F.substring(geoid, 12, 4)),
    }


def geoid_prefix(geoid: Column, geography: str) -> Column:
    """Truncate a GEOID to an ancestor geography's prefix (reference:
    site/assets/js/map.js:640-649 — county=5 chars, tract=11 chars)."""
    lengths = {v: k for k, v in GEOID_GEOGRAPHY_BY_LENGTH.items()}
    return F.substring(geoid, 1, lengths[geography])
