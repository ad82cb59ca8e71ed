"""Z-order key: ordering invariants + the locality payoff measured as
row-group pruning potential on BOTH dimensions of a written layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentimes_spark.functions.zorder import morton_key, with_morton_key


def test_morton_key_interleaves(spark):
    df = spark.createDataFrame([(0xAB, 0xCD)], "a long, b long")
    key = df.select(morton_key(F.col("a"), F.col("b"), nibbles=2).alias("k"))
    assert key.collect()[0]["k"] == "acbd"


def test_morton_order_is_z_curve(spark):
    """Within one quadrant level, all (a,b) pairs sharing high nibbles
    sort contiguously — the defining Z-curve property."""
    rows = [(a, b) for a in range(32) for b in range(32)]
    df = with_morton_key(
        spark.createDataFrame(rows, "a long, b long"), "a", "b", nibbles=2
    )
    ordered = [ (r["a"], r["b"]) for r in df.orderBy("zkey").collect() ]
    # the first quarter of the curve is exactly the low quadrant
    first_quadrant = set(ordered[: 16 * 16])
    assert first_quadrant == {(a, b) for a in range(16) for b in range(16)}


@pytest.mark.parametrize("filter_col", ["a", "b"])
def test_zorder_layout_prunes_both_dimensions(spark, tmp_path, filter_col):
    """Written Z-ordered across 8 files, a point predicate on EITHER
    column must be satisfiable by a fraction of the files (per-file
    min/max of that column excludes the rest) — single-key sort gives
    this for the leading key only."""
    import os

    import pyarrow.parquet as pq

    rows = [(a, b, float(a + b)) for a in range(64) for b in range(64)]
    df = with_morton_key(
        spark.createDataFrame(rows, "a long, b long, v double"), "a", "b", nibbles=2
    )
    out = str(tmp_path / "z")
    df.repartitionByRange(8, "zkey").sortWithinPartitions("zkey").write.parquet(out)
    target = 5
    touched, total = 0, 0
    for fn in os.listdir(out):
        if not fn.endswith(".parquet"):
            continue
        total += 1
        md = pq.read_metadata(os.path.join(out, fn))
        lo = min(md.row_group(i).column(0 if filter_col == "a" else 1).statistics.min
                 for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(0 if filter_col == "a" else 1).statistics.max
                 for i in range(md.num_row_groups))
        if lo <= target <= hi:
            touched += 1
    assert total >= 4
    assert touched < total, f"predicate on {filter_col} touched every file"
