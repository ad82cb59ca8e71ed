"""Structured Streaming recipes over the events stream (SURVEY.md §2.10
extension surface — the reference is pure batch, §1.4).

Each recipe takes a streaming DataFrame (``spark.readStream``) and
returns the transformed streaming DataFrame; sinks are the caller's
choice (tests use foreachBatch → memory). The batch twins in
plans/queries.py (events_hourly, sessionize_events) share the same
window semantics, so the oracle-checked batch results double as the
streaming correctness reference.

Scale notes: every aggregation here is keyed by (window, ...) so state
is bounded by watermark horizon × key cardinality; shuffle partitioning
follows the group keys. ``foreachBatch`` sinks should write through
io.write.write_sorted_partitioned to keep the layout contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_event_time(stream: DataFrame, col: str = "ts") -> DataFrame:
    """Coerce the event-time column to TIMESTAMP (with timezone).

    Parquet written with isAdjustedToUTC=false arrives as TIMESTAMP_NTZ,
    which `withWatermark` rejects outright.  The session pins
    spark.sql.session.timeZone=UTC (session.py), so the NTZ→LTZ cast is
    wall-clock identity; on an already-LTZ column it is a no-op."""
    return stream.withColumn(col, F.col(col).cast("timestamp"))


def hourly_event_counts(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour window × event_type: count, users, value sum.
    Late data beyond ``watermark`` is dropped (state GC)."""
    return (
        _with_event_time(stream).withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "n_users_approx",
            "total_value",
        )
    )


def sliding_value_rate(
    stream: DataFrame, window: str = "30 minutes", slide: str = "10 minutes"
) -> DataFrame:
    """Sliding-window mean value per event_type."""
    return (
        _with_event_time(stream).withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.avg("value").alias("avg_value"), F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "avg_value",
            "n",
        )
    )


def session_counts(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user (gap-based) — the streaming twin of the
    batch gaps-and-islands sessionize_events query. Input rows later than
    ``watermark`` behind the max seen ts are dropped (the late-data
    contract) — size the watermark to the source's real disorder."""
    return (
        _with_event_time(stream).withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon."""
    return (
        _with_event_time(stream)
        .withWatermark("ts", watermark)
        .dropDuplicates(["event_id", "ts"])
    )


def dedup_stream_redelivery(
    stream: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Dedup on event_id ALONE within the watermark horizon
    (``dropDuplicatesWithinWatermark``, Spark 3.5+): the redelivery
    case ``dedup_stream`` cannot express — an at-least-once source
    re-emits the same event_id with a DIFFERENT timestamp, so a
    (event_id, ts) key sees two distinct rows.  Here state is keyed by
    event_id only and each entry expires one watermark horizon after
    the FIRST sighting's event time, so state stays bounded by
    rate × horizon without the time column in the key."""
    return (
        _with_event_time(stream)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )


def stream_stream_join(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: purchase events matched to the same
    user's click events at most ``within`` earlier — the canonical
    attribution join. Both sides carry watermarks and the join condition
    carries the time bound, so state for unmatched rows is GC'd once the
    watermark passes the interval (state is bounded by rate × horizon,
    not stream length)."""
    clicks, purchases = _with_event_time(clicks), _with_event_time(purchases)
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value"),
    ).withWatermark("purchase_ts", watermark)
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {within}")),
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        "purchase_ts",
        "click_ts",
        "value",
    )


def stream_stream_left_outer_join(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream LEFT OUTER attribution join (round 7, VERDICT r6
    item 8): every purchase emits — matched purchases as soon as the
    click arrives, UNMATCHED purchases with NULL click columns once the
    global watermark passes their join interval and the engine can
    prove no qualifying click can still arrive.  This exercises the
    state-eviction path inner joins never touch: an unmatched left row
    is held in the state store exactly until
    ``purchase_ts + within < watermark`` and is emitted-with-nulls at
    eviction time, so state stays bounded by rate × horizon while no
    purchase is ever silently dropped.  Same keys/columns as
    ``stream_stream_join`` — the inner join is this with the null rows
    filtered out."""
    clicks, purchases = _with_event_time(clicks), _with_event_time(purchases)
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value"),
    ).withWatermark("purchase_ts", watermark)
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {within}")),
        "leftOuter",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        "purchase_ts",
        "click_ts",
        "value",
    )


def stream_stream_full_outer_join(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """FULL outer variant of the attribution join (round 7): BOTH
    unmatched purchases (NULL click columns) and unmatched clicks
    (NULL purchase columns) emit at watermark eviction — the complete
    audit stream where every event on either side is accounted for
    exactly once.  Exercises right-side state eviction, which the
    left-outer variant never touches.  Same condition and columns as
    ``stream_stream_left_outer_join``; ``user_id`` coalesces from
    whichever side is present."""
    clicks, purchases = _with_event_time(clicks), _with_event_time(purchases)
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value"),
    ).withWatermark("purchase_ts", watermark)
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {within}")),
        "fullOuter",
    ).select(
        F.coalesce(F.col("p_user"), F.col("c_user")).alias("user_id"),
        "purchase_id",
        "click_id",
        "purchase_ts",
        "click_ts",
        "value",
    )


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    stream_key: str = "user_id",
    dim_key: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join — the standard dimension attach on
    an event stream (user profile, device registry).  The static side
    is broadcast to every micro-batch task: stateless, no watermark
    needed, and the stream side never shuffles (contrast with
    stream-stream joins, which buffer state bounded by the watermark
    horizon).  Spark re-resolves the static relation per micro-batch,
    so a dim TABLE backed by files picks up slowly-changing updates at
    batch boundaries; pin a snapshot version (io/snapshots.py) when
    that drift is unwanted."""
    if dim_key != stream_key and stream_key in dim.columns:
        # renaming dim_key onto an already-present column would leave
        # TWO stream_key columns and the join would fail as ambiguous
        raise ValueError(
            f"dim already has a column named {stream_key!r}; drop or "
            f"rename it before joining on {dim_key!r}"
        )
    d = dim.withColumnRenamed(dim_key, stream_key) if dim_key != stream_key else dim
    return stream.join(F.broadcast(d), stream_key, how)


def cms_stream_sink(out_dir: str, col: str, depth: int = 4, width: int = 512):
    """foreachBatch sink maintaining a streaming Count-Min sketch: each
    micro-batch's PARTIAL sketch (≤ depth·width counter rows) lands in
    its own ``batch_id=<n>`` Hive partition under ``out_dir``; the live
    sketch is recovered by ``cms_read_merged`` (counter addition — the
    CMS merge law).

    foreachBatch is at-least-once — after a failure the same batch_id
    can replay — so the write is a DYNAMIC partition overwrite keyed by
    batch_id: a replayed batch REPLACES its own partition instead of
    appending a duplicate partial (which would double-count every item
    in that batch).  Partials instead of a rewritten merged table keep
    the sink contention-free at any ingest rate; one bounded partition
    per batch, compactable with io/compact when batch counts grow."""
    from opentimes_spark.operators.cms import cms_build

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            cms_build(batch_df, col, depth=depth, width=width)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return sink


def cms_read_merged(spark, out_dir: str) -> DataFrame:
    """The current streaming sketch: all appended partials re-summed to
    one (row, bucket, cnt) table — bounded by depth·width rows, so the
    merge is dimension-cheap regardless of how long the stream ran."""
    return (
        spark.read.parquet(out_dir)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
