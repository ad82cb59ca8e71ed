"""F1 GEOID decomposition — all 5 valid lengths + invalid (reference
data/src/utils/census.py:110-156)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentimes_spark.functions.geoid import geoid_prefix, split_geoid


def _split(spark, geoid):
    df = spark.createDataFrame([(geoid,)], "geoid string")
    parts = split_geoid(F.col("geoid"))
    return df.select(*[v.alias(k) for k, v in parts.items()]).collect()[0].asDict()


def test_block_geoid(spark):
    # Cook County IL block: state 17, county 031, tract 839100, block 1001
    out = _split(spark, "170318391001001")
    assert out == {
        "geography": "block",
        "state": "17",
        "county": "031",
        "tract": "839100",
        "block_group": "1",
        "block": "1001",
    }


def test_all_lengths(spark):
    assert _split(spark, "17")["geography"] == "state"
    assert _split(spark, "17031")["geography"] == "county"
    assert _split(spark, "17031839100")["geography"] == "tract"
    assert _split(spark, "170318391001")["geography"] == "block_group"
    assert _split(spark, "170318391001001")["geography"] == "block"


def test_invalid_length_is_null(spark):
    assert _split(spark, "1703")["geography"] is None


def test_zero_padding_preserved(spark):
    # Alabama '01' — the reason GEOIDs must stay strings
    out = _split(spark, "01001")
    assert out["state"] == "01" and out["county"] == "001"


def test_prefix_truncation(spark):
    df = spark.createDataFrame([("170318391001001",)], "geoid string")
    got = df.select(
        geoid_prefix(F.col("geoid"), "county").alias("c"),
        geoid_prefix(F.col("geoid"), "tract").alias("t"),
    ).collect()[0]
    assert got["c"] == "17031" and got["t"] == "17031839100"
