"""As-of (nearest-prior) join — the time-series join Spark lacks as a
built-in and the classic example of re-expressing a specialized operator
as a composition of DataFrame ops (SURVEY.md §2 X-family custom
operators; DuckDB/kdb/pandas ``merge_asof`` semantics).

Spark-first plan shape — the union-window trick, NOT a range join:

1. tag both inputs and ``unionByName`` them (right rows carry their
   payload, left rows carry NULL payload);
2. one ``Window.partitionBy(key).orderBy(ts, side)`` pass where
   ``last_value(payload, ignoreNulls=True)`` up to the current row
   fills each left row with the latest right payload at-or-before it;
3. filter back to the left rows.

Cost: ONE shuffle on the join key (the window's), a per-partition sort,
zero row expansion. The naive alternative — a non-equi theta join
``r.ts <= l.ts`` + argmax — explodes to O(|L|·|R|) pairs per key before
aggregation; at 100 TB the union-window plan is the difference between
a linear pass and a quadratic blowup. Ties on (key, ts): right rows
sort BEFORE left rows at equal timestamps, so an exactly-simultaneous
right row matches (``<=`` semantics, same as DuckDB ASOF JOIN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    payload_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every ``left`` row gains the ``payload_cols`` of
    the latest ``right`` row with the same ``on`` key and
    ``right.ts <= left.ts`` (NULLs when no prior right row exists).
    ``right`` must be unique per (on, ts) — pre-aggregate if not, or
    ties would be resolved arbitrarily.

    All payloads are filled through ONE struct column (the last non-null
    STRUCT, not per-column last non-null values): every output row takes
    its entire payload from the same matched right row, and a matched
    row's legitimately-NULL field stays NULL instead of being forward-
    filled from an older row — per-column ``last(ignorenulls)`` would
    silently stitch values from different right rows."""
    from pyspark.sql.types import StructField, StructType

    p_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in payload_cols]
    )
    l_tag = left.withColumn("__side", F.lit(1)).withColumn(
        "__p", F.lit(None).cast(p_type)
    )
    # A NULL-ts right row must never match: ASOF semantics (DuckDB,
    # merge_asof) skip NULL keys, but NULLS FIRST ordering would make
    # such a row the "prior" match for every left row — filter it out
    # before the union.  (A NULL-ts LEFT row needs no guard: it sorts
    # before every real right row and correctly sees no match.)
    r_tag = right.filter(F.col(ts).isNotNull()).select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("__side"),
        # the struct itself is never NULL for a right row (even if every
        # field is), so last(ignorenulls) skips only left-row placeholders
        F.struct(*[F.col(c).alias(c) for c in payload_cols]).alias("__p"),
    )
    # align schemas: left keeps all its columns; right rows carry NULL
    # for the left-only columns
    left_only = [c for c in left.columns if c not in (on, ts)]
    for c in left_only:
        r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tag.unionByName(r_tag.select(*l_tag.columns))
    # right rows (side 0) sort before left rows (side 1) at equal ts →
    # an exactly-simultaneous right row is visible to the left row (<=)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "__asof", F.last("__p", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("__side") == 1).select(
        *[c for c in left.columns],
        *[F.col(f"__asof.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )
