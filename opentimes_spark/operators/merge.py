"""CDC upsert / snapshot-merge operator.

The reference rebuilds its public datasets wholesale each release
(data/src/*.py write full parquet snapshots); an incremental corpus at
100 TB can't afford that — it applies a changeset (inserts, updates,
deletes) to the previous snapshot. This is Delta/Iceberg ``MERGE INTO``
semantics re-expressed on plain DataFrames.

Spark-first shape: **union + latest-wins window**, not a full outer
join. One hash shuffle on the key (co-bucketable with the snapshot
layout, `io/bucketed.py`), no join fan-out concerns, and it naturally
handles several change versions of the same key in one batch — a full
outer join would need a pre-dedup of the changeset first (an extra
shuffle). Deletes ride the changeset as tombstone rows and are dropped
after the window picks winners, so a delete beats a stale update of the
same version epoch only if versioned later — exactly MERGE semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: change-row operation codes
OP_UPSERT = "U"
OP_DELETE = "D"


def merge_changeset(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    version_col: str,
    op_col: str = "op",
    check: bool = True,
) -> DataFrame:
    """Apply ``changes`` to ``snapshot``, returning the new snapshot.

    ``changes`` must carry the snapshot's columns plus ``op_col``
    ('U' upsert / 'D' delete) and a ``version_col`` that orders change
    batches; the snapshot's own ``version_col`` values order it against
    the changes (a snapshot built at version v beats changes ≤ v). On a
    version tie the change row wins (it is the later intent).

    ``changes`` must be UNIQUE per (keys, version): two change rows in
    the same version epoch for the same key exhaust the window ordering
    and the winner would be whichever sorts first in its partition —
    nondeterministic across runs. ``check=True`` (default) enforces this
    with a bounded probe (first offending key only, one job over the
    changeset — the small side of a merge); disable for changesets
    already validated upstream.

    Plan: unionByName → row_number over (keys, version desc, change-side
    first) → keep rank 1, drop tombstones. Exactly one exchange on
    ``keys``; everything else is narrow.
    """
    if op_col not in changes.columns:
        raise ValueError(f"changes must carry an {op_col!r} column (U/D)")
    if check:
        dup = (
            changes.groupBy(*keys, version_col)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            d = dup[0].asDict()
            raise ValueError(
                "changes has duplicate rows per (keys, version) — winner "
                f"would be nondeterministic (e.g. {d}); dedupe the "
                "changeset or pass check=False for pre-validated input"
            )
    snap = snapshot
    if op_col not in snap.columns:
        snap = snap.withColumn(op_col, F.lit(OP_UPSERT))
    snap = snap.withColumn("__chg", F.lit(0))
    chg = changes.withColumn("__chg", F.lit(1))
    merged = snap.unionByName(chg)
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), F.col("__chg").desc()
    )
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        # null-safe: a NULL op (sloppy upstream) is NOT a delete — a
        # plain != would NULL out and silently drop the winning row
        .filter(~F.col(op_col).eqNullSafe(OP_DELETE))
        .drop("__rn", "__chg", op_col)
    )
