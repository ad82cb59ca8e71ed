"""Content-addressed incremental recompute (SURVEY.md §3 DAG parity).

Reference: opentimes orchestrates its pipeline with DVC — every stage
declares deps/outs, and DVC skips a stage when the md5 fingerprints of
its dependencies match ``dvc.lock`` (data/dvc.yaml:3-151). Here the same
semantics wrap the Spark stage functions: each stage's parquet
checkpoint carries a sidecar lock JSON recording the input fingerprint
that produced it; a re-run with unchanged inputs READS the checkpoint
instead of recomputing the lineage.

Fingerprints: files hash as (rel_path, size, mtime_ns) by default —
DVC's own large-file shortcut (it trusts the stat cache and only
re-hashes content when the stat changes); ``content=True`` forces full
md5 for byte-level certainty on small inputs. Params join the hash so a
config change invalidates like a data change. At 100 TB the stat walk
is one listing round-trip, never a data scan.
"""

from __future__ import annotations

import hashlib
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

LOCK_SUFFIX = ".lock.json"


def file_fingerprint(path: str, content: bool = False) -> str:
    """Fingerprint of one file or directory tree (sorted walk)."""
    h = hashlib.md5()
    if os.path.isdir(path):
        entries = []
        for dirpath, _, files in os.walk(path):
            for fn in files:
                entries.append(os.path.join(dirpath, fn))
        entries.sort()
    else:
        entries = [path]
    for p in entries:
        rel = os.path.relpath(p, path) if os.path.isdir(path) else os.path.basename(p)
        h.update(rel.encode())
        if content:
            with open(p, "rb") as fh:
                for chunk in iter(lambda: fh.read(1 << 20), b""):
                    h.update(chunk)
        else:
            st = os.stat(p)
            h.update(f"|{st.st_size}|{st.st_mtime_ns}".encode())
    return h.hexdigest()


def stage_fingerprint(
    deps: list[str], params: dict | None = None, content: bool = False
) -> str:
    """Combined fingerprint of dependency paths + stage params — the
    dvc.lock entry equivalent."""
    h = hashlib.md5()
    for d in sorted(deps):
        h.update(d.encode())
        h.update(file_fingerprint(d, content).encode())
    if params:
        h.update(json.dumps(params, sort_keys=True, default=str).encode())
    return h.hexdigest()


def _lock_path(out_path: str) -> str:
    return out_path.rstrip("/") + LOCK_SUFFIX


def is_stage_fresh(out_path: str, fingerprint: str) -> bool:
    """True iff the checkpoint exists (committed `_SUCCESS`) and was
    built from inputs with this exact fingerprint."""
    lock = _lock_path(out_path)
    if not (
        os.path.exists(lock)
        and os.path.exists(os.path.join(out_path, "_SUCCESS"))
    ):
        return False
    try:
        with open(lock) as fh:
            return json.load(fh).get("fingerprint") == fingerprint
    except (OSError, json.JSONDecodeError):
        return False


def run_stage(
    spark: SparkSession,
    name: str,
    deps: list[str],
    out_path: str,
    build: Callable[[], DataFrame],
    params: dict | None = None,
    content: bool = False,
) -> tuple[DataFrame, bool]:
    """DVC-stage semantics for one checkpoint: returns ``(df, skipped)``.

    If ``out_path``'s lock matches the current fingerprint of ``deps``
    (+ ``params``), the stage is SKIPPED — ``build`` is never invoked,
    no lineage is recomputed, and the returned DataFrame simply scans
    the checkpoint. Otherwise ``build()`` runs, its result is written
    to ``out_path``, and the lock is committed AFTER the write (a
    crashed write leaves a stale fingerprint, never a fresh one over
    bad data). Downstream stages naturally re-fire because their dep —
    this stage's out_path — changes mtime on rewrite, exactly the DVC
    propagation rule."""
    fp = stage_fingerprint(deps, params, content)
    if is_stage_fresh(out_path, fp):
        return spark.read.parquet(out_path), True
    df = build()
    df.write.mode("overwrite").parquet(out_path)
    with open(_lock_path(out_path), "w") as fh:
        json.dump(
            {"stage": name, "fingerprint": fp, "deps": sorted(deps)},
            fh,
            indent=2,
        )
    return spark.read.parquet(out_path), False
