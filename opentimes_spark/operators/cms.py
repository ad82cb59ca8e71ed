"""Count-Min sketch: sublinear frequency estimation for heavy-hitter
queries (Cormode & Muthukrishnan 2005).

The sketch is a depth×width counter table materialized AS A DATAFRAME of
(row, bucket, cnt): each input item increments one bucket per hash row,
and a point estimate is the MIN of its depth counters — always an
overestimate, with error ≤ εN at probability 1−δ for width=⌈e/ε⌉,
depth=⌈ln 1/δ⌉.

Scale shape: the build is one grouped aggregation onto AT MOST
depth·width keys (map-side combine collapses the token stream before the
shuffle — the sketch is the canonical "bounded keyspace" aggregation),
and sketches built on different corpus partitions MERGE by summing
counters, so incremental ingest unions sketch tables instead of
re-scanning history (same contract as `operators/aggstate.py`).  Hashes
are md5-derived so the exact same bucket math replays in any engine
with md5 — the DuckDB oracle requirement.

No counterpart in the reference (reference has no sketch layer); the
closest public precedents are the Count-Min implementations in
Algebird/DataSketches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, row: int, width: int) -> Column:
    """md5-derived counter index for hash row ``row`` — replays in SQL
    as ``('0x' || substr(md5(r || ':' || x), 1, 8))::BIGINT % width``."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{row}:"), col)), 1, 8), 16, 10
        ).cast("long")
        % width
    ).cast("int")


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 512,
    weight_col: str | None = None,
) -> DataFrame:
    """(row, bucket, cnt) sketch table from the item stream in ``col``.

    One shuffle onto ≤ depth·width keys regardless of input size;
    ``weight_col`` switches from unit increments to weighted counts.
    Merging two sketches of the same shape = union + re-sum.

    NULL items are excluded (COUNT(col) semantics): a NULL would hash
    to NULL buckets and silently vanish from some rows' counters —
    filtering makes the exclusion explicit and symmetric with
    ``cms_estimate``."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}x{width}")
    buckets = F.array(*[_bucket(F.col(col), r, width) for r in range(depth)])
    w = F.col(weight_col) if weight_col else F.lit(1)
    exploded = df.filter(F.col(col).isNotNull()).select(
        F.posexplode(buckets).alias("row", "bucket"), w.alias("__w")
    )
    return exploded.groupBy("row", "bucket").agg(
        F.sum("__w").cast("bigint").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point estimates for each row of ``items``: min over the item's
    depth counters.  The probe explodes each item into its depth
    (row, bucket) keys and equi-joins the sketch — the sketch side is
    ≤ depth·width rows, so Spark broadcasts it and the probe is
    shuffle-free.  Counters the sketch never saw coalesce to 0 (an
    item absent from the build stream estimates 0, as the paper's
    non-negative guarantee requires)."""
    buckets = F.array(*[_bucket(F.col(col), r, width) for r in range(depth)])
    probes = items.filter(F.col(col).isNotNull()).select(
        F.col(col), F.posexplode(buckets).alias("row", "bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )
