"""Equi-depth histogram via mergeable approx-percentile cutpoints — the
at-scale replacement for a global NTILE sort.

The exact form (``hist_equidepth_price`` in plans/queries.py) ranks the
whole column with ``NTILE(k) OVER (ORDER BY ...)``: a single-partition
global sort, the one plan shape that cannot scale past one executor.
This operator computes the SAME histogram contract (per-bucket row
count + lo/hi bounds) from ``percentile_approx`` cutpoints instead:

1. one aggregate builds the Greenwald-Khanna quantile sketch — partials
   merge associatively, so the pass is map-side parallel with a tiny
   final merge (no row ever leaves its partition unsorted);
2. the k−1 cutpoints (a single 1-row array) broadcast back onto the
   stream via a literal 1-row cross join;
3. bucket id = 1 + #cutpoints strictly below the value — a per-row
   fold over a k−1 array, whole-stage-codegen'd JVM work;
4. the final agg groups on k bucket ids — k rows out, trivially
   shuffled.

Accuracy: bucket POPULATIONS deviate from n/k by at most the sketch's
relative error ε·n per cutpoint (ε defaults to 1/10000); bucket BOUNDS
are exact observed min/max within each assigned bucket.  Ties at a
cutpoint all land in the lower bucket (deterministic, value-stable —
unlike NTILE, which splits equal values across buckets by rank).  Two
deliberate contract deviations from the NTILE twin on degenerate
columns: (a) when a value's frequency exceeds n/k, consecutive
cutpoints coincide and the buckets between them come back EMPTY (and
are omitted) — equal values are never split across buckets, where
NTILE splits them arbitrarily by rank; a constant column therefore
yields one bucket, not k.  (b) NULL values are excluded up front (they
have no position in a value ordering); the NTILE twin's ordering would
otherwise place them first and skew bucket 1's bounds.

SURVEY.md §2.4 A-Ext; VERDICT r4 "What's wrong" #3 names this swap as
the required scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_assign(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    accuracy: int = 10_000,
    cutpoints: list[float] | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """PER-ROW equi-depth bucket assignment — the production decile
    labeller (VERDICT r9 Next #4): every input row comes back with a
    1..n ``bucket_col`` derived from quantile cutpoints, never from a
    global sort.

    Cutpoint source is pluggable: by default one mergeable
    ``percentile_approx`` aggregate over ``df`` (map-side partials, a
    1-row sketch merge); or pass ``cutpoints`` explicitly — e.g.
    ``quantiles_from_rows`` over a PERSISTED
    ``operators/quantile_sketch`` artifact, so a daily-ingest pipeline
    labels today's rows against the corpus-lifetime distribution
    without rescanning history.  Assignment is a broadcast range join:
    bucket = 1 + #cutpoints strictly below the value — a per-row fold
    over an n−1 literal array, whole-stage-codegen'd JVM work.  NULL
    values are dropped (no position in a value ordering); ties at a
    cutpoint land in the lower bucket (value-stable, unlike NTILE's
    arbitrary rank split)."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    df = df.filter(F.col(value_col).isNotNull())
    v = F.col(value_col)
    if cutpoints is not None:
        if len(cutpoints) != n_buckets - 1:
            raise ValueError(
                f"need {n_buckets - 1} cutpoints, got {len(cutpoints)}"
            )
        cuts_arr = F.array(*[F.lit(float(c)) for c in cutpoints])
        source = df
    else:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        cuts = df.agg(
            F.percentile_approx(value_col, probs, accuracy).alias("__cuts")
        )
        cuts_arr = F.col("__cuts")
        source = df.crossJoin(F.broadcast(cuts))
    bucket = (
        F.lit(1)
        + F.aggregate(
            cuts_arr,
            F.lit(0),
            lambda acc, c: acc + F.when(v > c, 1).otherwise(0),
        )
    ).alias(bucket_col)
    return source.select(*df.columns, bucket)


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    accuracy: int = 10_000,
) -> DataFrame:
    """Equi-depth histogram of ``value_col``: one row per bucket with
    ``(bucket, n_rows, lo, hi)`` — same output contract as the exact
    NTILE form, no global sort anywhere in the plan."""
    return (
        bucket_assign(df, value_col, n_buckets, accuracy)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min(value_col), 2).alias("lo"),
            F.round(F.max(value_col), 2).alias("hi"),
        )
    )
