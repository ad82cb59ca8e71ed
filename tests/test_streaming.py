"""Structured Streaming recipes: file-source stream over the events
parquet, results compared against the equivalent batch computation
(same window semantics → identical final results in complete/update
modes once all data is processed)."""

from __future__ import annotations

import shutil
from datetime import timedelta

import pytest
from pyspark.sql import functions as F

from opentimes_spark.io.read import read_table
from opentimes_spark.streaming.events import (
    dedup_stream,
    hourly_event_counts,
    session_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def events_stream(spark, tmp_path):
    """Stage the events table as a one-file parquet dir and open it as a
    file-source stream (maxFilesPerTrigger exercises incremental reads)."""
    # pin event time to TIMESTAMP (LTZ): the driver-staged parquet may
    # carry ts as TIMESTAMP_NTZ, and the batch/stream comparison must run
    # in one type domain (watermarks additionally require LTZ)
    batch = read_table(spark, SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = str(tmp_path / "events_src")
    batch.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    yield batch, stream
    shutil.rmtree(src, ignore_errors=True)


def _run_to_memory(stream_df, name, mode="complete"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_hourly_counts_match_batch(spark, events_stream):
    batch, stream = events_stream
    _run_to_memory(hourly_event_counts(stream), "hourly")
    got = {
        (r["hour_start"], r["event_type"]): (r["n_events"], round(r["total_value"], 4))
        for r in spark.sql("SELECT * FROM hourly").collect()
    }
    expect = {
        (r["w"]["start"], r["event_type"]): (r["n_events"], round(r["total_value"], 4))
        for r in batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .collect()
    }
    assert got == expect and len(got) > 0


def test_session_counts_total_events_preserved(spark, events_stream):
    batch, stream = events_stream
    # files arrive in arbitrary time order → watermark must cover the
    # full span or genuinely-late rows are (correctly) dropped
    _run_to_memory(session_counts(stream, watermark="90 days"), "sessions")
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert sum(r["n_events"] for r in rows) == batch.count()
    # session windows are per-user disjoint intervals
    by_user: dict[int, list[tuple]] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["session_start"], r["session_end"])
        )
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 <= s2


def test_dedup_stream_passthrough_when_unique(spark, events_stream):
    batch, stream = events_stream
    q = (
        dedup_stream(stream, watermark="90 days")
        .writeStream.format("memory")
        .queryName("dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT COUNT(*) c FROM dedup").collect()[0]["c"] == batch.count()


def test_dedup_within_watermark_collapses_redelivered_ids(spark, tmp_path):
    """dropDuplicatesWithinWatermark (Spark 3.5+): the same event_id
    redelivered with a DIFFERENT timestamp must collapse to one row —
    the at-least-once-source case a (event_id, ts)-keyed dropDuplicates
    cannot express (it sees two distinct keys and keeps both)."""
    from opentimes_spark.streaming.events import dedup_stream_redelivery

    base = read_table(spark, SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    dupes = base.limit(50).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 7 SECONDS")  # redelivery drift
    )
    src = str(tmp_path / "redelivered_src")
    base.unionByName(dupes).repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        dedup_stream_redelivery(stream, watermark="90 days")
        .writeStream.format("memory")
        .queryName("dedup_redeliver")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT COUNT(*) c, COUNT(DISTINCT event_id) d FROM dedup_redeliver"
    ).collect()[0]
    assert got["c"] == base.count()  # duplicates collapsed
    assert got["d"] == got["c"]  # one row per event_id

    # the contrast: key-based dedup keeps BOTH timestamp variants
    q2 = (
        dedup_stream(
            spark.readStream.schema(base.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            watermark="90 days",
        )
        .writeStream.format("memory")
        .queryName("dedup_keyed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    keyed = spark.sql("SELECT COUNT(*) c FROM dedup_keyed").collect()[0]["c"]
    assert keyed == base.count() + 50


def test_watermark_drops_late_data(spark, events_stream):
    """The late-data contract itself: with a small watermark and files
    arriving out of time order, late rows must be dropped — fewer events
    than the batch total survive."""
    batch, stream = events_stream
    _run_to_memory(
        session_counts(stream, watermark="1 hour"), "sessions_strict"
    )
    got = spark.sql("SELECT SUM(n_events) s FROM sessions_strict").collect()[0]["s"]
    assert got < batch.count()


def test_stateful_running_totals_match_batch(spark, events_stream):
    """applyInPandasWithState custom operator: the last emitted update
    per user must equal the batch groupBy aggregate."""
    from opentimes_spark.streaming.stateful import running_user_stats

    batch, stream = events_stream
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode appends one row per (key, micro-batch); the row with
    # the max n_events per user is the final state
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 4), r["max_value"])
        for r in spark.sql(
            """
            SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY user_id ORDER BY n_events DESC) rn
                FROM user_stats
            ) WHERE rn = 1
            """
        ).collect()
    }
    expect = {
        r["user_id"]: (r["n"], round(r["total"], 4), r["mx"])
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert got == expect and len(got) > 0


def test_stream_stream_join_matches_batch(spark, events_stream):
    """Purchase←click attribution join: streaming result must equal the
    same interval join run in batch."""
    from opentimes_spark.streaming.events import stream_stream_join

    batch, stream = events_stream
    clicks_s = stream.filter(F.col("event_type") == "click")
    purch_s = stream.filter(F.col("event_type") == "purchase")
    q = (
        stream_stream_join(clicks_s, purch_s, within="1 hour", watermark="90 days")
        .writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM attrib").collect()
    }
    c = batch.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = batch.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    expect = {
        (r["purchase_id"], r["click_id"])
        for r in p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 hour")),
        ).collect()
    }
    assert got == expect and len(got) > 0


def test_foreachbatch_writes_sorted_layout(spark, events_stream, tmp_path):
    """The SCALE.md claim in practice: a foreachBatch sink writing each
    micro-batch through write_sorted_partitioned leaves a Hive layout a
    batch reader can consume."""
    import os

    from opentimes_spark.io.write import write_sorted_partitioned

    batch, stream = events_stream
    out = str(tmp_path / "events_sink")

    def sink(mb_df, epoch_id):
        if mb_df.isEmpty():
            return
        write_sorted_partitioned(
            mb_df.withColumn("event_date", F.to_date("ts").cast("string")),
            os.path.join(out, f"epoch={epoch_id}"),
            partition_by=["event_type"],
            order_by=["ts"],
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    back = spark.read.option("basePath", out).parquet(out + "/epoch=*")
    assert back.count() == batch.count()
    assert "event_type" in back.columns


def test_foreachbatch_cdc_upsert(spark, events_stream, tmp_path):
    """Streaming ingestion into a maintained snapshot: each micro-batch
    is a changeset applied with merge_changeset (union + latest-wins
    window) and the snapshot is re-pointed to the new parquet — the
    foreachBatch shape of an incremental 100 TB corpus update. The final
    snapshot must equal ONE batch merge of all events because versioned
    latest-wins upserts are order-insensitive across batches. (Deletes
    are deliberately absent here: tombstones would have to be RETAINED
    in the stored snapshot to stay order-insensitive — dropping them,
    as the read view does, lets an out-of-order earlier version
    resurrect a deleted key.)"""
    import os

    from opentimes_spark.operators.merge import merge_changeset

    batch, stream = events_stream
    snap0 = (
        batch.select("user_id").distinct()
        .select(
            F.col("user_id").alias("k"),
            F.lit(-1.0).alias("v"),
            F.lit(-1).cast("long").alias("version"),
        )
    )
    snap0_path = str(tmp_path / "snap_init")
    snap0.write.parquet(snap0_path)
    state = {"path": snap0_path}

    def to_changes(df):
        return df.select(
            F.col("user_id").alias("k"),
            F.col("value").alias("v"),
            F.col("event_id").alias("version"),  # unique → no tie-break needed
            F.lit("U").alias("op"),
        )

    def sink(mb_df, epoch_id):
        if mb_df.isEmpty():
            return
        cur = spark.read.parquet(state["path"])
        new_path = str(tmp_path / f"snap_{epoch_id}")
        merge_changeset(cur, to_changes(mb_df), ["k"], "version").write.parquet(
            new_path
        )
        state["path"] = new_path

    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_cdc"))
        .start()
    )
    q.awaitTermination(120)

    final = sorted(tuple(r) for r in spark.read.parquet(state["path"]).collect())
    expected = sorted(
        tuple(r)
        for r in merge_changeset(
            spark.read.parquet(snap0_path), to_changes(batch), ["k"], "version"
        ).collect()
    )
    assert final == expected and len(final) == 15


def test_foreachbatch_incremental_rollup(spark, events_stream, tmp_path):
    """Streaming maintenance of an aggregate-state table: each
    micro-batch reduces to per-group algebraic state and merges into the
    stored state (operators/aggstate.py) — the foreachBatch twin of an
    update-mode aggregate, and the streaming face of the incremental-
    rollup story (only the batch's state shuffles, history is never
    rescanned). Because the state is a commutative monoid, the final
    table must equal the one-shot state over all events regardless of
    how the file source split the batches."""
    from opentimes_spark.operators.aggstate import (
        merge_agg_states,
        partial_agg_state,
    )

    batch, stream = events_stream
    keys, measures = ["event_type"], {"value": ["cnt", "sum", "min", "max"]}
    state = {"path": None}

    def sink(mb_df, epoch_id):
        if mb_df.isEmpty():
            return
        s = partial_agg_state(mb_df, keys, measures)
        if state["path"] is not None:
            s = merge_agg_states(
                [spark.read.parquet(state["path"]), s], keys, measures
            )
        new_path = str(tmp_path / f"rollup_{epoch_id}")
        s.write.parquet(new_path)
        state["path"] = new_path

    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_rollup"))
        .start()
    )
    q.awaitTermination(120)

    def norm(df):
        # sums are floating point: batch-split order may differ from the
        # one-shot sum in the last ulp; compare rounded
        rows = df.collect()
        return sorted(
            (r.event_type, r["value__cnt"], round(r["value__sum"], 6),
             r["value__min"], r["value__max"])
            for r in rows
        )

    got = norm(spark.read.parquet(state["path"]))
    want = norm(partial_agg_state(batch, keys, measures))
    assert got == want and len(got) > 0


def test_stream_static_enrichment_matches_batch(spark, events_stream):
    """Stream-static broadcast join: streaming result equals the batch
    join, unmatched stream rows survive (left join), and the stream
    side needs no watermark/state."""
    from opentimes_spark.streaming.events import enrich_with_dim

    batch, stream = events_stream
    dim = spark.createDataFrame(
        [(i, f"tier{i % 3}") for i in range(0, 120, 2)],  # only even users
        "user_id long, tier string",
    )
    out = enrich_with_dim(stream, dim).select("event_id", "user_id", "tier")
    _run_to_memory(out, "enriched", mode="append")
    got = {r.event_id: r.tier for r in spark.sql("SELECT * FROM enriched").collect()}
    expect = {
        r.event_id: r.tier
        for r in batch.join(dim, "user_id", "left")
        .select("event_id", "tier")
        .collect()
    }
    assert got == expect and len(got) == batch.count()


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs google.protobuf (absent here)",
)
def test_transform_with_state_matches_batch(spark, events_stream):
    """Spark 4 transformWithStateInPandas twin of running_user_stats:
    final update per user equals the batch aggregate (and therefore the
    legacy applyInPandasWithState result)."""
    from opentimes_spark.streaming.stateful import running_user_stats_tws

    batch, stream = events_stream
    q = (
        running_user_stats_tws(stream)
        .writeStream.format("memory")
        .queryName("user_stats_tws")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 4), r["max_value"])
        for r in spark.sql(
            """
            SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY user_id ORDER BY n_events DESC) rn
                FROM user_stats_tws
            ) WHERE rn = 1
            """
        ).collect()
    }
    expect = {
        r["user_id"]: (r["n"], round(r["total"], 4), r["mx"])
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert got == expect and len(got) > 0


def test_transform_with_state_raises_clearly_without_protobuf(spark, events_stream):
    """Without google.protobuf the new-API path must fail fast with a
    clear error naming the working alternative, not crash the Spark
    driver worker mid-query."""
    if _has_protobuf():
        pytest.skip("protobuf present; the seam is exercised by the real test")
    from opentimes_spark.streaming.stateful import running_user_stats_tws

    _, stream = events_stream
    with pytest.raises(NotImplementedError, match="running_user_stats"):
        running_user_stats_tws(stream)


def test_checkpoint_recovery_resumes_stateful_query(spark, tmp_path):
    """Streaming state must survive a query restart: run a windowed
    count with a checkpoint, stop, add MORE source files, restart with
    the SAME checkpoint — the second run processes only the new files
    and the final counts equal one batch pass over everything."""
    import shutil as _sh

    from opentimes_spark.streaming.events import hourly_event_counts

    batch = read_table(spark, SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    first, second = batch.filter("user_id % 2 = 0"), batch.filter("user_id % 2 = 1")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    first.coalesce(1).write.parquet(src)

    def run_once(name):
        stream = spark.readStream.schema(batch.schema).parquet(src)
        q = (
            hourly_event_counts(stream, watermark="90 days")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return q

    run_once("ck1")
    n_first = spark.sql("SELECT SUM(n_events) s FROM ck1").collect()[0]["s"]
    assert n_first == first.count()

    # new files arrive while the query is down
    second.coalesce(1).write.mode("append").parquet(src)
    q2 = run_once("ck2")
    got = {
        (r["hour_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM ck2").collect()
    }
    expect = {
        (r["w"]["start"], r["event_type"]): r["n"]
        for r in batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expect
    # the restart recovered from the checkpoint instead of reprocessing:
    # only the newly-arrived file shows up in the second run's progress
    progress = [p for p in q2.recentProgress if p["numInputRows"] > 0]
    assert sum(p["numInputRows"] for p in progress) == second.count()
    _sh.rmtree(ckpt, ignore_errors=True)


def test_enrich_with_dim_rejects_column_collision(spark):
    from opentimes_spark.streaming.events import enrich_with_dim

    stream = spark.createDataFrame([(1, 5.0)], "user_id long, value double")
    dim = spark.createDataFrame(
        [(1, 2, "gold")], "uid long, user_id long, tier string"
    )
    with pytest.raises(ValueError, match="already has a column"):
        enrich_with_dim(stream, dim, stream_key="user_id", dim_key="uid")


def test_stateful_update_emits_null_max_for_all_null_values():
    """The batch twin's MAX(value) is NULL when every value is null —
    the -inf internal sentinel must not leak into the emitted row."""
    import pandas as pd

    from opentimes_spark.streaming.stateful import _update_user_stats

    class FakeState:
        exists = False

        def update(self, t):
            self.stored = t

    st = FakeState()
    pdf = pd.DataFrame({"value": [None, float("nan")]})
    out = list(_update_user_stats((7,), iter([pdf]), st))[0]
    assert out["n_events"].iloc[0] == 2
    assert out["max_value"].iloc[0] is None or pd.isna(out["max_value"].iloc[0])
    # a later non-null batch recovers the real max
    st2 = FakeState()
    st2.exists = False
    out2 = list(
        _update_user_stats((7,), iter([pd.DataFrame({"value": [None, 3.5]})]), st2)
    )[0]
    assert out2["max_value"].iloc[0] == 3.5


def test_streaming_cms_matches_batch_sketch(spark, events_stream, tmp_path):
    """The CMS merge law over a real stream: per-micro-batch partial
    sketches appended by the foreachBatch sink must re-sum to EXACTLY
    the sketch built over the whole table in one batch pass — the
    incremental heavy-hitter path (operators/cms.py + cms_stream_sink)."""
    from opentimes_spark.operators.cms import cms_build
    from opentimes_spark.streaming.events import cms_read_merged, cms_stream_sink

    batch, stream = events_stream
    out = str(tmp_path / "cms_sketch")
    q = (
        stream.writeStream.foreachBatch(cms_stream_sink(out, "event_type"))
        .option("checkpointLocation", str(tmp_path / "ckpt_cms"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    merged = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_read_merged(spark, out).collect()
    }
    direct = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_build(batch, "event_type").collect()
    }
    assert merged == direct
    # and the stream really was incremental: multiple partial sketches
    n_batches = spark.read.parquet(out).select("batch_id").distinct().count()
    assert n_batches > 1


def test_cms_sink_replayed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: invoking the sink TWICE with the
    same batch_id must leave exactly one partial (dynamic partition
    overwrite), not a double-counted append."""
    from opentimes_spark.operators.cms import cms_build
    from opentimes_spark.streaming.events import cms_read_merged, cms_stream_sink

    out = str(tmp_path / "cms_replay")
    df = spark.createDataFrame([("x",), ("y",), ("x",)], "event_type string")
    sink = cms_stream_sink(out, "event_type")
    sink(df, 7)
    sink(df, 7)  # replay of the same micro-batch
    merged = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_read_merged(spark, out).collect()
    }
    direct = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_build(df, "event_type").collect()
    }
    assert merged == direct


def test_stream_stream_left_outer_emits_nulls_after_watermark(spark, tmp_path):
    """Left-outer stream-stream join with state eviction (round 7):
    purchases WITH a qualifying click emit matched; purchases WITHOUT
    one are held in state and emitted with NULL click columns only
    after the global watermark passes their join interval.  Pinned
    against the batch left join.

    Two availableNow runs against one checkpoint: run 1 processes the
    real events (watermark still below every purchase's expiry, so no
    null rows yet); a far-future flush event then lands on BOTH streams
    and run 2 advances the watermark past every real interval, forcing
    the evicted-unmatched rows out with nulls."""
    from opentimes_spark.streaming.events import stream_stream_left_outer_join

    batch = read_table(spark, SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    clicks_b = batch.filter(F.col("event_type") == "click")
    purch_b = batch.filter(F.col("event_type") == "purchase")

    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purch")
    clicks_b.coalesce(1).write.parquet(cdir)
    purch_b.coalesce(1).write.parquet(pdir)

    def open_streams():
        cs = spark.readStream.schema(batch.schema).parquet(cdir)
        ps = spark.readStream.schema(batch.schema).parquet(pdir)
        return stream_stream_left_outer_join(
            cs, ps, within="1 hour", watermark="0 seconds"
        )

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run(name):
        q = (
            open_streams()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(out).collect()

    rows1 = run("louter1")
    # run 1: the watermark ends at max(ts) - delay, so unmatched
    # purchases whose interval is already past CAN evict with nulls,
    # but any purchase still inside its join horizon
    # (purchase_ts + within >= watermark) MUST still be held in state —
    # eviction is watermark-gated, not emit-on-sight
    far0 = batch.agg(F.max("ts").alias("m")).collect()[0]["m"]
    held = {
        r["purchase_id"]
        for r in rows1
        if r["click_id"] is None
        and r["purchase_ts"] + timedelta(hours=1) >= far0
    }
    assert held == set(), f"evicted before watermark passed: {held}"

    # flush event 30 days past the corpus on both streams → watermark
    # jumps past every purchase's (ts + within) horizon in run 2
    flush = (
        batch.limit(1)
        .withColumn("event_id", F.lit(-1).cast("bigint"))
        .withColumn("user_id", F.lit(-1).cast("bigint"))
        .withColumn("event_type", F.lit("click"))
        .withColumn("ts", F.lit(far0).cast("timestamp") + F.expr("INTERVAL 30 days"))
    )
    flush.coalesce(1).write.mode("append").parquet(cdir)
    flush.withColumn("event_type", F.lit("purchase")).coalesce(1).write.mode(
        "append"
    ).parquet(pdir)

    rows2 = run("louter2")  # cumulative: the file sink holds both runs
    got_matched = {
        (r["purchase_id"], r["click_id"])
        for r in rows2
        if r["click_id"] is not None and r["purchase_id"] != -1
    }
    got_null = {
        r["purchase_id"]
        for r in rows2
        if r["click_id"] is None and r["purchase_id"] != -1
    }

    c = clicks_b.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purch_b.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    joined = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 hour")),
        "left_outer",
    )
    expect_matched = {
        (r["purchase_id"], r["click_id"])
        for r in joined.filter(F.col("click_id").isNotNull()).collect()
    }
    expect_null = {
        r["purchase_id"]
        for r in joined.filter(F.col("click_id").isNull()).collect()
    }
    assert got_matched == expect_matched and len(got_matched) > 0
    assert got_null == expect_null and len(got_null) > 0


def test_stream_stream_full_outer_accounts_for_both_sides(spark, tmp_path):
    """Full-outer stream-stream join: every purchase AND every click
    appears exactly once across matched + null-padded rows once the
    watermark passes — right-side eviction included.  Same two-run
    flush harness as the left-outer test; pinned against the batch
    full join."""
    from opentimes_spark.streaming.events import stream_stream_full_outer_join

    batch = read_table(spark, SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    clicks_b = batch.filter(F.col("event_type") == "click")
    purch_b = batch.filter(F.col("event_type") == "purchase")
    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purch")
    clicks_b.coalesce(1).write.parquet(cdir)
    purch_b.coalesce(1).write.parquet(pdir)
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def run():
        cs = spark.readStream.schema(batch.schema).parquet(cdir)
        ps = spark.readStream.schema(batch.schema).parquet(pdir)
        q = (
            stream_stream_full_outer_join(
                cs, ps, within="1 hour", watermark="0 seconds"
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(out).collect()

    run()
    far0 = batch.agg(F.max("ts").alias("m")).collect()[0]["m"]
    flush = (
        batch.limit(1)
        .withColumn("event_id", F.lit(-1).cast("bigint"))
        .withColumn("user_id", F.lit(-1).cast("bigint"))
        .withColumn("event_type", F.lit("click"))
        .withColumn("ts", F.lit(far0).cast("timestamp") + F.expr("INTERVAL 30 days"))
    )
    flush.coalesce(1).write.mode("append").parquet(cdir)
    flush.withColumn("event_type", F.lit("purchase")).coalesce(1).write.mode(
        "append"
    ).parquet(pdir)
    rows = [r for r in run() if r["purchase_id"] != -1 and r["click_id"] != -1]

    got_pairs = {
        (r["purchase_id"], r["click_id"])
        for r in rows
        if r["purchase_id"] is not None and r["click_id"] is not None
    }
    got_null_p = {r["purchase_id"] for r in rows if r["click_id"] is None}
    got_null_c = {r["click_id"] for r in rows if r["purchase_id"] is None}

    c = clicks_b.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purch_b.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    joined = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 hour")),
        "full_outer",
    ).collect()
    exp_pairs = {
        (r["purchase_id"], r["click_id"])
        for r in joined
        if r["purchase_id"] is not None and r["click_id"] is not None
    }
    exp_null_p = {
        r["purchase_id"] for r in joined if r["click_id"] is None
        and r["purchase_id"] is not None
    }
    exp_null_c = {
        r["click_id"] for r in joined if r["purchase_id"] is None
        and r["click_id"] is not None
    }
    assert got_pairs == exp_pairs and len(got_pairs) > 0
    assert got_null_p == exp_null_p and len(got_null_p) > 0
    assert got_null_c == exp_null_c and len(got_null_c) > 0
