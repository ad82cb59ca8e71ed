"""End-to-end corpus-curation job: funnel sanity + checkpoint skipping."""

from __future__ import annotations

import json
import os

from opentimes_spark.jobs.curate_corpus import curate, parse_args


def test_curate_funnel_and_incremental_skip(spark, tmp_path):
    out = str(tmp_path / "curated")
    os.makedirs(out, exist_ok=True)
    args = parse_args(
        ["--sf-dir", "/root/testdata/sf0.001", "--out", out]
    )

    m1 = curate(spark, args)
    stages = ["quality", "exact", "spans", "decontam", "curated"]
    rows = [m1["stages"][s]["rows"] for s in stages]
    assert all(not m1["stages"][s]["skipped"] for s in stages)
    # monotone funnel: every stage only ever drops documents
    assert all(a >= b for a, b in zip(rows, rows[1:]))
    assert rows[-1] > 0

    # the curated corpus parquet is real and carries the packing cols
    cur = spark.read.parquet(os.path.join(out, "curated"))
    assert {"doc_id", "source", "text", "n_tok", "seq_bin"} <= set(
        cur.columns
    )
    # no doc from the held-out eval source survives
    assert cur.filter(cur.source == "src19").count() == 0

    with open(os.path.join(out, "manifest.json")) as fh:
        assert json.load(fh)["stages"] == m1["stages"]

    # second run: every stage content-addressed-skips, same counts
    m2 = curate(spark, args)
    assert all(m2["stages"][s]["skipped"] for s in stages), m2
    assert [m2["stages"][s]["rows"] for s in stages] == rows


def test_curate_publish_versioned_snapshot(spark, tmp_path):
    """--publish snapshots the curated output: the pointer advances per
    run, old versions stay time-travelable, and the published rows
    equal the curated stage's."""
    from opentimes_spark.io.snapshots import latest_version, read_snapshot

    out = str(tmp_path / "curated")
    os.makedirs(out, exist_ok=True)
    args = parse_args(
        ["--sf-dir", "/root/testdata/sf0.001", "--out", out, "--publish"]
    )

    m1 = curate(spark, args)
    assert m1["published_version"] == 0
    root = os.path.join(out, "published")
    assert latest_version(root) == 0
    n_curated = m1["stages"]["curated"]["rows"]
    assert read_snapshot(spark, root).count() == n_curated

    # a re-run skips every stage but still publishes a NEW version
    m2 = curate(spark, args)
    assert m2["published_version"] == 1
    assert read_snapshot(spark, root).count() == n_curated
    assert read_snapshot(spark, root, version=0).count() == n_curated


def test_curate_semantic_stage(spark, tmp_path):
    """--semantic-tau inserts the SemDeDup stage: the funnel stays
    monotone through it, dropped docs are exactly the operator's
    kept=0 ids (restricted to decontam survivors), and docs without an
    embedding pass through."""
    out = str(tmp_path / "curated_sem")
    os.makedirs(out, exist_ok=True)
    args = parse_args(
        [
            "--sf-dir", "/root/testdata/sf0.001",
            "--out", out,
            "--semantic-tau", "0.2",
        ]
    )
    m = curate(spark, args)
    stages = ["quality", "exact", "spans", "decontam", "semantic", "curated"]
    rows = [m["stages"][s]["rows"] for s in stages]
    assert all(a >= b for a, b in zip(rows, rows[1:]))
    assert rows[-1] > 0
    # the semantic stage must drop SOMETHING at tau=0.2 on this corpus
    assert m["stages"]["semantic"]["rows"] < m["stages"]["decontam"]["rows"]

    from pyspark.sql import functions as F

    from opentimes_spark.operators.clustering import semantic_prune

    dec = spark.read.parquet(os.path.join(out, "decontam"))
    sem = spark.read.parquet(os.path.join(out, "semantic"))
    dec_ids = {r["doc_id"] for r in dec.select("doc_id").collect()}
    sem_ids = {r["doc_id"] for r in sem.select("doc_id").collect()}
    # keep decisions are computed among SURVIVORS: restrict embeddings
    # to decontam's ids first, exactly as the stage does — a near-dup
    # of an already-removed doc must NOT be dropped
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter(F.col("vec_id").isin([int(i) for i in dec_ids]))
    )
    pruned_ids = {
        r["vec_id"]
        for r in semantic_prune(emb, k=8, threshold=0.2, max_iter=10, tol=1e-9)
        .filter(F.col("kept") == 0)
        .collect()
    }
    assert dec_ids - sem_ids == pruned_ids
    # every dropped doc's kept lower-id twin is still in the corpus: the
    # keep-one-representative invariant
    assert pruned_ids <= dec_ids and pruned_ids.isdisjoint(sem_ids)


def test_curate_gopher_and_boilerplate_stages(spark, tmp_path):
    """The opt-in rule-filter stages slot between quality and exact:
    each can only drop docs, the funnel stays monotone, and a permissive
    boilerplate threshold is a no-op while a zero threshold drops every
    doc that has any template trigram."""
    out = str(tmp_path / "curated_gb")
    os.makedirs(out, exist_ok=True)
    args = parse_args(
        [
            "--sf-dir", "/root/testdata/sf0.001", "--out", out,
            "--gopher", "--boilerplate-max", "0.9",
        ]
    )
    m = curate(spark, args)
    stages = [
        "quality", "gopher", "boilerplate", "exact", "spans",
        "decontam", "curated",
    ]
    rows = [m["stages"][s]["rows"] for s in stages]
    assert all(a >= b for a, b in zip(rows, rows[1:])), rows
    assert rows[-1] > 0

    # the fused prefilter stage really applies the composed rule: every
    # survivor of the single checkpoint passes gopher_pass (boilerplate
    # only drops further, so the property holds on the stage output)
    from opentimes_spark.functions.text import gopher_pass
    from pyspark.sql import functions as F

    g = spark.read.parquet(os.path.join(out, "prefilter"))
    assert g.filter(~gopher_pass(F.col("text"))).count() == 0

    # a zero threshold drops every doc with any template trigram —
    # strictly fewer than its own upstream (this corpus is template-y)
    out2 = str(tmp_path / "curated_aggr")
    os.makedirs(out2, exist_ok=True)
    m2 = curate(
        spark,
        parse_args(
            [
                "--sf-dir", "/root/testdata/sf0.001", "--out", out2,
                "--boilerplate-max", "0.0",
            ]
        ),
    )
    assert (
        m2["stages"]["boilerplate"]["rows"]
        < m2["stages"]["quality"]["rows"]
    )


def test_curate_recovers_from_missing_prefilter_sidecar(spark, tmp_path):
    """A crash between run_stage's lock commit and the interior-counts
    sidecar write used to wedge every later run (skip path read the
    sidecar with no fallback).  The skip path must now invalidate the
    lock and rebuild the stage once."""
    out = str(tmp_path / "curated")
    os.makedirs(out, exist_ok=True)
    args = parse_args(
        ["--sf-dir", "/root/testdata/sf0.001", "--out", out]
    )
    m1 = curate(spark, args)
    rows1 = m1["stages"]["quality"]["rows"]
    # simulate the crash window: checkpoint + lock committed, sidecar lost
    os.remove(os.path.join(out, "prefilter", "_stage_counts.json"))
    m2 = curate(spark, args)
    assert m2["stages"]["quality"]["rows"] == rows1
    assert not m2["stages"]["quality"]["skipped"]  # rebuilt, not wedged
    # and the rebuild restores skippability
    m3 = curate(spark, args)
    assert m3["stages"]["quality"]["skipped"]
    assert m3["stages"]["quality"]["rows"] == rows1
