"""Index lifecycle maintenance: consume the staleness telemetry the
three incremental ingest paths emit, decide append-vs-rebuild, and
publish rebuilds through versioned pointers (VERDICT r7 item 4).

The repo has three O(batch) incremental index paths, each mirroring the
reference's publish-then-consume artifact discipline (reference
``data/dvc.yaml`` pins every published stage output):

- the **exact-dedup fingerprint ledger** (``operators/dedup.py:
  incremental_exact_dedup``) — grows a file per ingest; the hazard is
  FRAGMENTATION (a 100 TB year of daily ingests = thousands of tiny
  parquet files whose listing/footer overhead dominates the anti-join
  scan);
- the **LSH band-row index** (``operators/dedup.py:write_lsh_index`` /
  ``append_to_lsh_index``) — parameters never drift, but a HOT BAND
  (one (band_idx, band_hash) bucket collecting a degenerate shingle)
  makes every future probe's candidate join quadratic in that bucket;
  the fix is a rebuild under wider bands (band_size+1 lowers the
  collision probability exponentially);
- the **IVF-PQ vector index** (``operators/similarity.py:
  append_to_ivfpq_index``) — frozen centroids; a drifting corpus shows
  up as ``staleness_ratio`` (mean appended-vector cell distance over
  the train-time baseline) creeping past 1, meaning cells no longer
  partition the data and probe recall decays.

This job closes the loop nothing consumed before: each ``maintain_*``
ingests a batch through the append path, reads the telemetry, and when
a threshold trips REBUILDS the artifact into a fresh ``v=N+1``
directory published via ``io/snapshots.publish_dir_snapshot`` — the
pointer swaps only after the build commits, probes resolve
``snapshots.current_dir(root)``, and stale reuse is impossible by
construction (a reader can never see a half-built index, and a rebuilt
index is only visible once complete).  Old versions stay readable for
time travel until ``prune_snapshots``.

Scale story: appends stay O(batch) against the LIVE version directory
(append-only — new complete files, existing files never rewritten);
rebuilds are the rare O(corpus) event this job gates on evidence, and
publishing them as ``v=N+1`` means the expensive rebuild never blocks
readers of ``v=N``.

Run: ``python -m opentimes_spark.jobs.maintain_indexes --sf-dir
/root/testdata/sf0.001 --work /tmp/indexes``
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opentimes_spark.io import snapshots
from opentimes_spark.operators import dedup as D
from opentimes_spark.operators import similarity as S

# Thresholds — module constants so tests and operators can tune them.
LEDGER_MAX_FILES = 16          # fragment count before compaction
LSH_HOT_BAND_CAP = 64          # rows in one (band_idx, band_hash) bucket
LSH_BAND_SIZE_MAX = 8          # escalation ceiling
IVFPQ_STALENESS_MAX = 1.5      # mean/train cell distance ratio

# --- decision log ------------------------------------------------------------
#
# "When did the LSH index last rebuild, and why?" must be a TABLE, not a
# grep over job stdout (VERDICT r8 item 5).  Every maintain_* decision
# appends one row to a parquet log: fixed columns for the filterable
# dimensions (index, action, version, wall-clock), and the per-index
# telemetry (hot_band_rows, staleness_ratio, accepted/rejected, ...) as
# a JSON detail string — schema-stable across the three index kinds, and
# still queryable field-by-field via get_json_object.  Same read-back
# contract as streaming/telemetry.py: the log is ordinary data the
# catalog layer can register as a view.

DECISION_LOG_SCHEMA = (
    "decided_ns long, index string, action string, version long, detail string"
)
DECISION_LOG_MAX_FILES = 32    # fragment count before the log compacts


def record_decision(spark: SparkSession, log_root: str, rec: dict) -> None:
    """Append one decision record to the parquet decision log.

    The log is itself a VERSIONED SNAPSHOT root (``v=N`` + atomic
    ``_LATEST``): appends go through ``append_into_snapshot`` under the
    publish lock, and once the live version exceeds
    ``DECISION_LOG_MAX_FILES`` parquet fragments the whole log is
    rewritten into one compacted ``v=N+1`` — the same small-files
    discipline the dedup ledger applies, closing the
    one-file-per-decision growth pathology (VERDICT r9 Next #7).  A
    year of daily decisions stays a handful of files, not 365+."""
    import time

    detail = {
        k: v for k, v in rec.items() if k not in ("index", "action", "version")
    }
    row = (
        time.time_ns(),
        rec.get("index"),
        rec.get("action"),
        int(rec.get("version", -1)),
        json.dumps(detail, sort_keys=True),
    )
    df = spark.createDataFrame([row], DECISION_LOG_SCHEMA).coalesce(1)
    try:
        snapshots.current_dir(log_root)
    except FileNotFoundError:
        snapshots.write_snapshot(df, log_root)
        return
    snapshots.append_into_snapshot(
        log_root, lambda d: df.write.mode("append").parquet(d)
    )
    live = snapshots.current_dir(log_root)
    if _parquet_file_count(live) > DECISION_LOG_MAX_FILES:
        compacted = spark.read.parquet(live).coalesce(1)
        snapshots.write_snapshot(compacted, log_root, sort_by="decided_ns")


def read_decision_log(spark: SparkSession, log_root: str) -> DataFrame:
    """The decision log as a DataFrame, oldest decision first (resolved
    through the live snapshot pointer)."""
    return spark.read.parquet(snapshots.current_dir(log_root)).orderBy(
        "decided_ns"
    )


def _parquet_file_count(path: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(path):
        if "_params" in root or "_centroids" in root or "_codebooks" in root:
            continue
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


# --- exact-dedup ledger ------------------------------------------------------


def maintain_dedup_ledger(
    spark: SparkSession,
    batch: DataFrame,
    root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files: int = LEDGER_MAX_FILES,
    decision_log: str | None = None,
) -> dict:
    """Ingest ``batch`` against the versioned fingerprint ledger at
    ``root``; compact when fragmented.

    The ledger is a plain (fp, canonical_id) DataFrame, so versions
    publish through ``write_snapshot`` directly.  Each ingest APPENDS
    the fresh batch's fingerprints as new files into the live version
    directory (O(batch)); when the live directory's parquet file count
    exceeds ``max_files`` the whole ledger is rewritten into one
    compacted ``v=N+1`` snapshot — the small-files compaction trigger
    disclosed in ``incremental_exact_dedup``'s docstring.  Returns
    {'accepted', 'rejected', 'action', 'version', 'ledger_files'}.
    """
    try:
        vdir = snapshots.current_dir(root)
    except FileNotFoundError:
        vdir = None

    n_batch = batch.count()
    if vdir is None:
        fresh, updated = D.incremental_exact_dedup(
            batch, None, id_col, text_col
        )
        version = snapshots.write_snapshot(updated, root)
        action = "bootstrap"
        live = snapshots.current_dir(root)
        n_accepted = fresh.count()
    else:
        # The dedup DECISION and the ledger append are one critical
        # section: both run inside append_fn, under the publish lock,
        # against the locked live directory — so a competing ingest can
        # no longer accept the same fingerprint in the window between
        # an unlocked anti join and the locked append (TOCTOU, ADVICE
        # r9).  The eager localCheckpoint still breaks lineage on the
        # version dir before new files land in it.
        def _decide_and_append(d: str) -> int:
            live_ledger = spark.read.parquet(d).select("fp", "canonical_id")
            fresh_l, _ = D.incremental_exact_dedup(
                batch, live_ledger, id_col, text_col
            )
            staged = fresh_l.select(
                D.fingerprint(F.col(text_col)).alias("fp"),
                F.col(id_col).alias("canonical_id"),
            ).localCheckpoint(eager=True)
            staged.write.mode("append").parquet(d)
            return staged.count()

        n_accepted = snapshots.append_into_snapshot(root, _decide_and_append)
        version = snapshots.latest_version(root)
        action = "append"
        live = vdir

    n_files = _parquet_file_count(live)
    if n_files > max_files:
        compacted = spark.read.parquet(live).coalesce(1)
        version = snapshots.write_snapshot(compacted, root, sort_by="fp")
        action = "compact"
        n_files = _parquet_file_count(snapshots.current_dir(root))
    rec = {
        "index": "dedup_ledger",
        "action": action,
        "version": int(version),
        "accepted": int(n_accepted),
        "rejected": int(n_batch - n_accepted),
        "ledger_files": int(n_files),
    }
    if decision_log:
        record_decision(spark, decision_log, rec)
    return rec


# --- LSH band-row index ------------------------------------------------------


def lsh_hot_band_stats(spark: SparkSession, vdir: str) -> dict:
    """Telemetry for the rebuild decision: the largest (band_idx,
    band_hash) bucket and the distinct doc count — one aggregate over
    the 3-column index, never the corpus."""
    idx = spark.read.parquet(vdir)
    row = (
        idx.groupBy("band_idx", "band_hash")
        .count()
        .agg(F.max("count").alias("hot"))
        .collect()[0]
    )
    n_docs = idx.select(idx.columns[0]).distinct().count()
    return {"hot_band_rows": int(row["hot"] or 0), "indexed_docs": int(n_docs)}


def maintain_lsh_index(
    spark: SparkSession,
    corpus: DataFrame,
    batch: DataFrame,
    root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    hot_band_cap: int = LSH_HOT_BAND_CAP,
    decision_log: str | None = None,
    **build_params,
) -> dict:
    """Ingest ``batch`` into the versioned LSH index at ``root``;
    rebuild under wider bands when a hot band trips the cap.

    ``corpus`` is the full document set the REBUILD path signs (the
    append path touches only ``batch``).  Escalation: each rebuild
    bumps ``band_size`` by 1 (capped at ``LSH_BAND_SIZE_MAX`` and at
    ``num_hashes``), which exponentially lowers the band-collision
    probability that created the hot bucket.  Returns the decision
    record.
    """
    try:
        vdir = snapshots.current_dir(root)
    except FileNotFoundError:
        version = snapshots.publish_dir_snapshot(
            root,
            lambda d: D.write_lsh_index(
                corpus, d, id_col, text_col, **build_params
            ),
            meta={"built_from": "bootstrap", **build_params},
        )
        vdir = snapshots.current_dir(root)
        stats = lsh_hot_band_stats(spark, vdir)
        rec = {
            "index": "lsh", "action": "bootstrap", "version": int(version),
            "appended": 0, **stats,
        }
        if decision_log:
            record_decision(spark, decision_log, rec)
        return rec

    appended = snapshots.append_into_snapshot(
        root, lambda d: D.append_to_lsh_index(batch, d, id_col, text_col)
    )["appended"]
    stats = lsh_hot_band_stats(spark, vdir)
    action = "append"
    saturated = False
    version = snapshots.latest_version(root)
    if stats["hot_band_rows"] > hot_band_cap:
        p = D.read_lsh_params(spark, vdir)
        new_band = min(
            p["band_size"] + 1, LSH_BAND_SIZE_MAX, p["num_hashes"]
        )
        if new_band == p["band_size"]:
            # Escalation exhausted: a rebuild at identical parameters
            # would be a full O(corpus) pass repeated on EVERY future
            # ingest with no effect on the hot bucket.  Keep appending
            # and surface the saturation so an operator can raise
            # num_hashes / re-shingle instead of burning rebuilds.
            saturated = True
        else:
            version = snapshots.publish_dir_snapshot(
                root,
                lambda d: D.write_lsh_index(
                    corpus, d, id_col, text_col,
                    num_hashes=p["num_hashes"], band_size=new_band,
                    shingle_size=p["shingle_size"], hash_fn=p["hash_fn"],
                ),
                meta={"built_from": "hot_band_rebuild", "band_size": new_band},
            )
            action = "rebuild"
            stats = lsh_hot_band_stats(spark, snapshots.current_dir(root))
    rec = {
        "index": "lsh", "action": action, "version": int(version),
        "appended": int(appended), "saturated": saturated, **stats,
    }
    if decision_log:
        record_decision(spark, decision_log, rec)
    return rec


# --- IVF-PQ vector index -----------------------------------------------------


def maintain_ivfpq_index(
    spark: SparkSession,
    corpus: DataFrame,
    batch: DataFrame,
    root: str,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    staleness_max: float = IVFPQ_STALENESS_MAX,
    decision_log: str | None = None,
    **build_params,
) -> dict:
    """Ingest ``batch`` into the versioned IVF-PQ index at ``root``;
    rebuild (recluster over ``corpus``) when the append telemetry's
    ``staleness_ratio`` exceeds ``staleness_max`` — the drifting-corpus
    trigger ``append_to_ivfpq_index`` documents but nothing consumed.
    Returns the decision record including the raw telemetry.
    """
    try:
        vdir = snapshots.current_dir(root)
    except FileNotFoundError:
        # meta is JSON — record rotated-ness as a bool, not the matrix
        meta_params = {
            k: v for k, v in build_params.items() if k != "rotation"
        }
        version = snapshots.publish_dir_snapshot(
            root,
            lambda d: S.write_ivfpq_index(
                spark, corpus, d, dim=dim, id_col=id_col, vec_col=vec_col,
                **build_params,
            ),
            meta={
                "built_from": "bootstrap", "dim": dim,
                "rotated": build_params.get("rotation") is not None,
                **meta_params,
            },
        )
        rec = {
            "index": "ivfpq", "action": "bootstrap", "version": int(version),
            "appended": 0, "staleness_ratio": 0.0,
        }
        if decision_log:
            record_decision(spark, decision_log, rec)
        return rec

    tel = snapshots.append_into_snapshot(
        root,
        lambda d: S.append_to_ivfpq_index(
            spark, batch, d, dim=dim, id_col=id_col, vec_col=vec_col
        ),
    )
    action = "append"
    version = snapshots.latest_version(root)
    if tel["staleness_ratio"] > staleness_max:
        # Carry the live index's OPQ rotation through the rebuild: the
        # docstring contract is that appends/probes "transparently
        # rotate", so a rotation=R index must NOT silently become
        # unrotated after its first staleness rebuild (ADVICE r9).
        # An explicit caller-supplied rotation in build_params wins.
        rebuild_params = dict(build_params)
        if "rotation" not in rebuild_params:
            stored_rot = S.read_ivfpq_rotation(spark, vdir)
            if stored_rot is not None:
                rebuild_params["rotation"] = stored_rot
        version = snapshots.publish_dir_snapshot(
            root,
            lambda d: S.write_ivfpq_index(
                spark, corpus, d, dim=dim, id_col=id_col, vec_col=vec_col,
                **rebuild_params,
            ),
            meta={
                "built_from": "staleness_rebuild",
                "staleness_ratio": tel["staleness_ratio"],
                "rotated": rebuild_params.get("rotation") is not None,
            },
        )
        action = "rebuild"
    rec = {
        "index": "ivfpq", "action": action, "version": int(version), **tel,
    }
    if decision_log:
        record_decision(spark, decision_log, rec)
    return rec


# --- CLI ---------------------------------------------------------------------


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--work", required=True, help="index roots live here")
    ap.add_argument("--batch-frac", type=float, default=0.2,
                    help="fraction of docs treated as today's ingest")
    args = ap.parse_args(argv)

    spark = (
        SparkSession.builder.master("local[*]")
        .appName("maintain_indexes")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))
    # deterministic batch split: md5 coin on the id, like sample_systematic
    coin = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") / F.lit(float(0xFFFFFFFF))
    )
    batch_docs = docs.filter(coin < args.batch_frac)
    coin_e = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long") / F.lit(float(0xFFFFFFFF))
    )
    batch_emb = emb.filter(coin_e < args.batch_frac)

    dlog = os.path.join(args.work, "_decisions")
    out = [
        maintain_dedup_ledger(
            spark, batch_docs, os.path.join(args.work, "dedup_ledger"),
            decision_log=dlog,
        ),
        maintain_lsh_index(
            spark, docs, batch_docs, os.path.join(args.work, "lsh"),
            decision_log=dlog,
        ),
        maintain_ivfpq_index(
            spark, emb, batch_emb, os.path.join(args.work, "ivfpq"),
            decision_log=dlog,
        ),
    ]
    for rec in out:
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
