"""State-store telemetry for stateful streaming queries (round 8,
VERDICT r7 item 8).

The left/full-outer stream-stream joins pin CORRECTNESS via checkpoint
tests, but the 100 TB operational risk is unbounded state: a wrong
watermark, a skewed key, or a stalled upstream turns the state store
into a slow memory leak that no output-value test can see.  Spark
already measures everything needed — each micro-batch's progress event
carries per-stateful-operator row counts and eviction counts — this
module surfaces them two ways:

- **pull**: ``state_operator_metrics(query)`` flattens a
  ``StreamingQuery``'s retained progress history into plain dicts —
  one row per (batch, stateful operator) with ``state_rows``
  (numRowsTotal), ``rows_updated``, ``rows_removed`` (the eviction
  counter), memory, and the batch watermark;
- **push**: ``StateTelemetryListener`` (a ``StreamingQueryListener``)
  appends the same rows to a JSONL file as batches complete, and
  ``read_state_telemetry`` loads that file back as a DataFrame — the
  catalog-layer hook a monitoring job tails.  JSONL because progress
  events arrive one at a time from a listener thread: appending a line
  is atomic at OS pipe-buffer sizes and needs no parquet writer state.

The health invariant these rows exist to check: under steady-state
ingest with an advancing watermark, ``state_rows`` PLATEAUS (bounded by
rate x join horizon) while ``rows_removed`` keeps pace with
``rows_updated`` — growth without eviction is the leak signature.
``assert_state_plateau`` encodes that check for tests and monitoring.

Reference parity note: the reference's batch pipeline has no streaming
state to watch; this is engine-operational surface the Spark target
needs (SURVEY.md §2.10).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_FIELDS = (
    "query_id",
    "run_id",
    "batch_id",
    "operator",
    "state_rows",
    "rows_updated",
    "rows_removed",
    "memory_used_bytes",
    "watermark",
    "timestamp",
)

TELEMETRY_SCHEMA = (
    "query_id string, run_id string, batch_id long, operator string, "
    "state_rows long, rows_updated long, rows_removed long, "
    "memory_used_bytes long, watermark string, timestamp string"
)


def _progress_dict(p) -> dict:
    """Normalize a progress object: PySpark exposes progress either as
    a JSON-backed object (``.json``) or a plain dict depending on API
    surface/version."""
    if isinstance(p, dict):
        return p
    if hasattr(p, "json"):
        return json.loads(p.json)
    raise TypeError(f"unrecognized progress object: {type(p)!r}")


def _rows_of(progress: dict) -> list[dict]:
    ev = progress.get("eventTime") or {}
    out = []
    for op in progress.get("stateOperators") or []:
        out.append(
            {
                # ids arrive as uuid.UUID from some PySpark surfaces —
                # stringify for JSONL and the DataFrame schema
                "query_id": str(progress.get("id")),
                "run_id": str(progress.get("runId")),
                "batch_id": progress.get("batchId"),
                "operator": op.get("operatorName"),
                "state_rows": op.get("numRowsTotal"),
                "rows_updated": op.get("numRowsUpdated"),
                "rows_removed": op.get("numRowsRemoved"),
                "memory_used_bytes": op.get("memoryUsedBytes"),
                "watermark": ev.get("watermark"),
                "timestamp": progress.get("timestamp"),
            }
        )
    return out


def state_operator_metrics(query) -> list[dict]:
    """One dict per (retained batch, stateful operator) from a
    ``StreamingQuery``'s ``recentProgress`` — batches with no stateful
    operator contribute nothing."""
    rows = []
    for p in query.recentProgress:
        rows.extend(_rows_of(_progress_dict(p)))
    return rows


def telemetry_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """Telemetry rows as a DataFrame (catalog-layer shape)."""
    return spark.createDataFrame(
        [tuple(r.get(f) for f in _FIELDS) for r in rows], TELEMETRY_SCHEMA
    )


class StateTelemetryListener:
    """``StreamingQueryListener`` appending one JSONL row per
    (batch, stateful operator) as progress events arrive.

    Use ``attach_state_listener`` / ``detach``; rows accumulate in
    ``self.rows`` as well, so in-process consumers need no file.
    Implemented structurally (duck-typed event handlers) and registered
    through ``spark.streams.addListener``."""

    def __init__(self, jsonl_path: str | None = None) -> None:
        self.jsonl_path = jsonl_path
        self.rows: list[dict] = []

    # StreamingQueryListener interface ------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API name)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        rows = _rows_of(_progress_dict(event.progress))
        if not rows:
            return
        self.rows.extend(rows)
        if self.jsonl_path:
            with open(self.jsonl_path, "a", encoding="utf-8") as f:
                for r in rows:
                    f.write(json.dumps(r) + "\n")

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def attach_state_listener(
    spark: SparkSession, jsonl_path: str | None = None
) -> StateTelemetryListener:
    """Register a telemetry listener on the session; returns it (keep
    the reference to read ``.rows`` and to detach)."""
    from pyspark.sql.streaming import StreamingQueryListener

    # subclass dynamically so the module imports even where the
    # listener API is unavailable (pure-connect sessions)
    class _L(StreamingQueryListener):
        def __init__(self, inner):
            self._inner = inner

        def onQueryStarted(self, event):  # noqa: N802
            self._inner.onQueryStarted(event)

        def onQueryProgress(self, event):  # noqa: N802
            self._inner.onQueryProgress(event)

        def onQueryIdle(self, event):  # noqa: N802
            self._inner.onQueryIdle(event)

        def onQueryTerminated(self, event):  # noqa: N802
            self._inner.onQueryTerminated(event)

    inner = StateTelemetryListener(jsonl_path)
    wrapper = _L(inner)
    spark.streams.addListener(wrapper)
    inner._wrapper = wrapper  # for detach
    return inner


def detach_state_listener(
    spark: SparkSession, listener: StateTelemetryListener
) -> None:
    spark.streams.removeListener(listener._wrapper)


def read_state_telemetry(spark: SparkSession, jsonl_path: str) -> DataFrame:
    """Load a listener's JSONL file back as the telemetry DataFrame."""
    rows = []
    if os.path.exists(jsonl_path):
        with open(jsonl_path, encoding="utf-8") as f:
            rows = [json.loads(line) for line in f if line.strip()]
    return telemetry_df(spark, rows)


def assert_state_plateau(
    rows: list[dict],
    per_batch_bound: int,
    min_batches: int = 2,
) -> dict:
    """The leak check: over the LAST ``min_batches`` state-bearing
    BATCHES (distinct ``batch_id``s — with several stateful operators a
    batch contributes one row each, and they all count as one batch),
    every operator's ``state_rows`` must stay within ``per_batch_bound``
    (the rate x horizon budget), and no operator's state may grow
    strictly monotonically across the whole tail (checked when the tail
    holds >= 3 observations of that operator — two points can't
    distinguish ramp-up from a leak).  Returns {'max_state_rows',
    'total_removed', 'batches'} where ``batches`` counts the distinct
    batch_ids checked; raises AssertionError with the offending series
    otherwise.  ``total_removed`` sums the WHOLE observed series (the
    eviction evidence), not just the tail.

    Rows are scoped PER (query_id, run_id) before any of the above: a
    session-level listener observing two concurrent queries — or one
    query restarted from checkpoint, which resets batch_id to 0 —
    would otherwise interleave unrelated batch series and either raise
    a spurious leak or mask a real one.  Every run is checked
    independently; at least one run must carry >= ``min_batches``
    state-bearing batches, and shorter runs (a restart tail) are still
    held to the per-batch bound."""
    runs: dict[tuple, list[dict]] = {}
    for r in rows:
        if r["state_rows"] is None:
            continue
        runs.setdefault(
            (r.get("query_id"), r.get("run_id")), []
        ).append(r)
    if not runs:
        raise AssertionError(
            f"need >= {min_batches} state-bearing batches, got 0"
        )
    worst_all = 0
    total_removed = 0
    batches_checked = 0
    deep_runs = 0
    for key, run_rows in sorted(runs.items(), key=lambda kv: str(kv[0])):
        series = sorted(
            run_rows, key=lambda r: (r["batch_id"], r["operator"] or "")
        )
        total_removed += sum(r["rows_removed"] or 0 for r in series)
        batch_ids = sorted({r["batch_id"] for r in series})
        tail_ids = set(batch_ids[-min_batches:])
        tail = [r for r in series if r["batch_id"] in tail_ids]
        worst = max(r["state_rows"] for r in tail)
        worst_all = max(worst_all, worst)
        if worst > per_batch_bound:
            raise AssertionError(
                f"run {key}: state grew past the rate x horizon budget: "
                f"{worst} > {per_batch_bound}; series="
                f"{[(r['batch_id'], r['state_rows']) for r in series]}"
            )
        if len(batch_ids) < min_batches:
            continue  # a short restart tail: bound-checked only
        deep_runs += 1
        batches_checked += len(tail_ids)
        per_op: dict[str, list[int]] = {}
        for r in tail:
            per_op.setdefault(r["operator"] or "", []).append(
                r["state_rows"]
            )
        for op, vals in per_op.items():
            if len(vals) >= 3 and all(
                b > a for a, b in zip(vals, vals[1:])
            ):
                raise AssertionError(
                    f"run {key}: operator {op!r} state grew strictly "
                    f"monotonically over the last {len(vals)} batches: "
                    f"{vals} — eviction is not keeping pace (leak "
                    "signature)"
                )
    if deep_runs == 0:
        raise AssertionError(
            f"need >= {min_batches} state-bearing batches in at least "
            f"one run; runs held "
            f"{[len({r['batch_id'] for r in v}) for v in runs.values()]}"
        )
    return {
        "max_state_rows": worst_all,
        "total_removed": total_removed,
        "batches": batches_checked,
    }
