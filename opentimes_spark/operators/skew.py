"""Skew-mitigation join helpers.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but it only works for sort-merge joins after a shuffle has
materialized — and it cannot fix aggregation skew. These helpers encode
the two explicit patterns for when you know the skew ahead of time:

- ``salted_join``: replicate the small side ``salt`` times, scatter the
  big side's hot keys across ``salt`` sub-keys. Turns one executor-killing
  partition into ``salt`` even ones at the cost of replicating the small
  side (fine: it was broadcastable-adjacent anyway, just not broadcast —
  e.g. 100 MB–1 GB dimension with a few hot keys).
- ``two_phase_agg``: salt → partial agg on (key, salt) → final agg on
  key. For re-aggregatable measures (sum/count/min/max) this bounds any
  single reducer's input to ~1/salt of the hot key's rows.

At 100 TB: pick ``salt`` ≈ hot-key rows / target-partition rows. Salting
is deterministic on a hash of a tiebreaker column (not rand()) so retried
tasks produce identical output — required for exactly-once sinks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(tiebreaker: Column, salt: int) -> Column:
    return F.pmod(F.xxhash64(tiebreaker), F.lit(salt)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    tiebreaker: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side salted and
    the small side replicated ``salt``×. Result columns = big ∪ small
    (join key once), same as ``big.join(small, on, how)`` for ``how``
    in {inner, left, left_semi, left_anti}.

    RIGHT/FULL outer joins are rejected: the small side's rows exist in
    ``salt`` replicas, so a small-side key unmatched in ``big`` would
    survive the outer join ``salt`` times where the plain join emits it
    once — salting cannot preserve right-outer multiplicity.  (A
    right-skew problem wants the roles swapped:
    ``salted_join(small_as_big, ...)`` with how="left".)"""
    if how in ("right", "rightouter", "right_outer", "full", "outer", "fullouter", "full_outer"):
        raise ValueError(
            f"salted_join cannot express how={how!r}: replicated small-"
            "side rows would duplicate unmatched keys salt times"
        )
    tb = F.col(tiebreaker) if tiebreaker else F.monotonically_increasing_id()
    b = big.withColumn("__salt", _salt_col(tb, salt))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return b.join(s, on=[on, "__salt"], how=how).drop("__salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, str],
    salt: int = 8,
    tiebreaker: str | None = None,
) -> DataFrame:
    """Skew-safe groupBy: ``aggs`` maps column → fn in {sum, count, min,
    max}. Phase 1 aggregates on (key, salt); phase 2 merges per key
    (count merges with sum). Output columns are ``{fn}_{col}``."""
    merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for fn in aggs.values():
        if fn not in merge:
            raise ValueError(f"non-reaggregatable fn: {fn}")
    tb = F.col(tiebreaker) if tiebreaker else F.monotonically_increasing_id()
    partial = (
        df.withColumn("__salt", _salt_col(tb, salt))
        .groupBy(key, "__salt")
        .agg(
            *[
                first[fn](F.col(c)).alias(f"{fn}_{c}")
                for c, fn in aggs.items()
            ]
        )
    )
    return partial.groupBy(key).agg(
        *[
            merge[fn](F.col(f"{fn}_{c}")).alias(f"{fn}_{c}")
            for c, fn in aggs.items()
        ]
    )
