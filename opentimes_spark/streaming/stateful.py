"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.10 extension surface — arbitrary per-key state beyond the
built-in windowed aggregations).

The state functions are pure pandas (no package-internal imports), but
as module-level functions they pickle BY REFERENCE: a real cluster's
Python workers must be able to import ``opentimes_spark`` — ship it
with ``session.ship_package`` (or ``--py-files``) exactly like every
other operator.  Local-mode tests pass without it only because workers
inherit the driver's ``sys.path``.

Scale notes: state lives in the state store partitioned by the group
key — per-key state here is O(1) (a few counters), so total state is
bounded by key cardinality, not event volume. Skewed keys only skew the
*input* shuffle, not the state size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, max_value double"
)
STATE_SCHEMA = "n bigint, total double, mx double"


def _update_user_stats(key, pdfs, state):
    import pandas as pd

    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        vals = pdf["value"].dropna()  # all-NaN max() is NaN — keep it out
        if len(vals):
            mx = max(mx, float(vals.max()))
    state.update((n, total, mx))
    # -inf is the internal "no non-null value yet" sentinel; the batch
    # twin's MAX(value) — and SUM(value) — yield NULL there (pandas
    # all-NaN sum is 0.0, which would diverge), so emit NULL for both
    none_yet = mx == float("-inf")
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [None if none_yet else total],
            "max_value": [None if none_yet else mx],
        }
    )


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max) over the event stream — the
    canonical arbitrary-stateful-operator shape: one state row per key,
    an updated summary emitted every micro-batch the key appears in.
    Equivalent batch query: ``SELECT user_id, COUNT(*), SUM(value),
    MAX(value) FROM events GROUP BY user_id`` — the final update per key
    must match it exactly."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class _RunningStatsProcessor:
    """StatefulProcessor for transformWithStateInPandas — defined as a
    plain class and subclassed lazily so importing this module never
    requires the Spark 4 API to exist."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("stats", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timer_values):
        import pandas as pd

        n, total, mx = (
            self._state.get() if self._state.exists() else (0, 0.0, float("-inf"))
        )
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            vals = pdf["value"].dropna()  # all-NaN max() is NaN
            if len(vals):
                mx = max(mx, float(vals.max()))
        self._state.update((n, total, mx))
        # identical NULL semantics to the legacy twin: the batch
        # SUM/MAX over an all-null key is NULL, not 0.0 / -inf
        none_yet = mx == float("-inf")
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [None if none_yet else total],
                "max_value": [None if none_yet else mx],
            }
        )

    def close(self) -> None:
        pass


def running_user_stats_tws(stream: DataFrame) -> DataFrame:
    """The same per-user running summary on the Spark 4
    ``transformWithStateInPandas`` API (StatefulProcessor + typed
    ValueState) — the successor to applyInPandasWithState with
    composable named state, timers, and TTL.  Kept alongside the
    legacy-API twin so both stateful surfaces stay covered; the test
    pins both to the identical batch aggregate.

    Scale contract is unchanged: one O(1) state row per key in the
    RocksDB-backed store, input shuffle keyed by user_id.

    ENVIRONMENT SEAM: the transformWithState protocol serializes state
    messages with protobuf; without ``google.protobuf`` installed the
    Spark driver worker crashes opaquely mid-query, so absence is
    surfaced here as an explicit error.  The legacy-API twin
    ``running_user_stats`` has no such dependency.  (Probed again in
    round 9: ``import google.protobuf`` fails and ``pip download
    protobuf`` finds no distribution — the container has no index
    access — so the seam stands; the auto-activating test in
    tests/test_streaming.py flips on by itself the moment protobuf
    appears.)"""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "transformWithStateInPandas requires the google.protobuf "
            "package (state-protocol serialization), which is not "
            "installed in this environment; use running_user_stats "
            "(applyInPandasWithState) instead"
        ) from e
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    proc = type(
        "RunningStatsProcessor", (_RunningStatsProcessor, StatefulProcessor), {}
    )()
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
