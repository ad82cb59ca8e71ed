"""Grouped weighted mean with zero-weight fallback (SURVEY.md A1).

Reference: opentimes data/src/utils/census.py:9-47
(``calculate_weighted_mean``): per group, Σ(v·w)/Σw; when the group's
total weight is 0 (e.g. zero-population blocks), fall back to the plain
mean. The reference implements this as a pandas ``groupby.apply``; in
Spark it is a single shuffle-free-of-UDFs aggregate — partial aggregation
happens map-side, so at 100 TB each executor ships four numbers per
group, not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_weighted_mean(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    out_col: str = "weighted_mean",
    round_to: int | None = None,
) -> DataFrame:
    """groupBy(group_cols) → weighted mean of value_col by weight_col,
    falling back to the unweighted mean where Σw == 0. Also emits ``n``
    (group size) to mirror the reference's count-preserving semantics."""
    wsum = F.sum(F.col(weight_col))
    wmean = F.when(wsum == 0, F.avg(F.col(value_col))).otherwise(
        F.sum(F.col(value_col) * F.col(weight_col)) / wsum
    )
    if round_to is not None:
        wmean = F.round(wmean, round_to)
    return df.groupBy(*group_cols).agg(
        wmean.alias(out_col), F.count(F.lit(1)).alias("n")
    )


def weighted_centroids(
    df: DataFrame,
    group_col: str,
    coord_cols: list[str],
    weight_col: str,
) -> DataFrame:
    """Population-weighted centroid per geography — the reference's cenloc
    computation (create_cenloc.py:104 consuming calculate_weighted_mean
    over x/y in two CRS). One aggregate pass over all coordinate columns
    at once (the reference loops column-by-column)."""
    aggs = []
    wsum = F.sum(F.col(weight_col))
    for c in coord_cols:
        expr = F.when(wsum == 0, F.avg(F.col(c))).otherwise(
            F.sum(F.col(c) * F.col(weight_col)) / wsum
        )
        aggs.append(expr.alias(f"{c}_wt"))
        aggs.append(F.avg(F.col(c)).alias(c))
    return df.groupBy(group_col).agg(*aggs)
