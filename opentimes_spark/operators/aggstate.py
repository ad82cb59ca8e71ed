"""Mergeable aggregate state: incremental maintenance of a rollup.

The reference recomputes its summary tables from scratch each release
(`data/dvc.yaml` reruns every stage when inputs change); at 100 TB a
rollup over all history cannot rescan history per new batch.  The
standard fix is to persist *algebraic aggregate state* — (count, sum,
min, max) per group — which forms a commutative monoid: the state of a
union of batches is the pointwise merge of per-batch states.  New data
shuffles only the delta; the historical state is never rescanned, and
`finalize` derives the presentation row (avg = sum/count) at read time.

This is exactly what Spark's partial aggregation does *within* a job
(`partial_count` → `merge` in HashAggregate); this operator materializes
the same semantics *across* jobs, which also makes it the batch twin of
a streaming `outputMode("update")` aggregate.

Scale notes: state width is O(groups × measures), independent of input
rows; the merge is a groupBy on the rollup keys only — one shuffle of
state-sized data.  AVG must ride (sum, count) — averaging averages is
wrong under unequal batch sizes — and MIN/MAX stay mergeable while SUM
of deletions would need a retraction column (not modeled; append-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STATE_AGGS = {
    "cnt": (F.count, F.sum),  # build from raw, re-merge between states
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _state_cols(measures: dict[str, list[str]]) -> list[str]:
    return [f"{col}__{st}" for col, stats in measures.items() for st in stats]


def partial_agg_state(
    df: DataFrame, keys: list[str], measures: dict[str, list[str]]
) -> DataFrame:
    """Per-group algebraic state for ``measures`` ({column: [stats]},
    stats ⊆ {cnt, sum, min, max}).  One shuffle over THIS batch only."""
    aggs = []
    for col, stats in measures.items():
        for st in stats:
            if st not in _STATE_AGGS:
                raise ValueError(f"unsupported stat {st!r} (not mergeable)")
            build, _ = _STATE_AGGS[st]
            aggs.append(build(col).alias(f"{col}__{st}"))
    return df.groupBy(*keys).agg(*aggs)


def merge_agg_states(
    states: list[DataFrame], keys: list[str], measures: dict[str, list[str]]
) -> DataFrame:
    """Pointwise monoid merge of per-batch states: union (groups absent
    from a batch simply contribute no row) then re-aggregate with each
    stat's merge function.  Associative and commutative — batch order
    never matters."""
    if not states:
        raise ValueError("no states to merge")
    cols = keys + _state_cols(measures)
    unioned = states[0].select(*cols)
    for s in states[1:]:
        unioned = unioned.unionByName(s.select(*cols))
    aggs = []
    for col, stats in measures.items():
        for st in stats:
            _, merge = _STATE_AGGS[st]
            name = f"{col}__{st}"
            aggs.append(merge(name).alias(name))
    return unioned.groupBy(*keys).agg(*aggs)


def finalize_agg(
    state: DataFrame,
    measures: dict[str, list[str]],
    avg_of: list[str] = (),
    round_to: int = 4,
) -> DataFrame:
    """Presentation row from state: pass stats through, derive
    ``{col}__avg`` = sum/cnt for columns in ``avg_of`` (both stats must
    be in the state)."""
    for col in avg_of:
        stats = measures.get(col, [])
        missing = [st for st in ("sum", "cnt") if st not in stats]
        if missing:
            raise ValueError(
                f"avg_of column {col!r} needs {missing} in measures (got {stats})"
            )
    out = state
    for col in avg_of:
        out = out.withColumn(
            f"{col}__avg",
            F.round(F.col(f"{col}__sum") / F.col(f"{col}__cnt"), round_to),
        )
    return out
