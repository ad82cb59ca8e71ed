"""Vector math over `array<float>` embedding columns — JVM-side
expressions (F.zip_with / F.aggregate), no UDFs.

Everything computes in DOUBLE with a sequential left-fold so results are
bit-identical to the DuckDB oracle's `list_*` functions applied to
DOUBLE[]-cast inputs (both engines fold left-to-right over the array).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """NULL when either vector has zero norm (a zero embedding — failed
    embed, padding row — is similar to nothing): under Spark 4's
    default ANSI mode an unguarded division would raise
    DIVIDE_BY_ZERO and kill the whole job on one bad row.  Consumers'
    threshold compares (``cos >= t``) are NULL-safe by SQL semantics —
    a NULL similarity never passes."""
    denom = norm(a) * norm(b)
    return F.when(denom != 0.0, dot(a, b) / denom)
