"""Small-file compaction — the standing maintenance job every large
partitioned dataset needs (the reference's create_public_files.py IS a
compaction pass: many per-chunk files → few size-capped sorted files).

At 100 TB the failure mode is thousands of KB-sized files per partition
(streaming foreachBatch epochs, per-chunk matrix outputs, retried
tasks): listing cost explodes and scans pay per-file open overhead.
Compaction = read one partition directory, re-sort, rewrite with a
bounded file count, atomically swap. Sorting is preserved so the
row-group zone-map guarantee (SCALE.md storage layout) survives
compaction.

Crash safety: the swap is two renames (path → __precompact, tmp →
path), so a crash can strand the dataset mid-swap or leave stale temp
dirs. ``compact_dir`` therefore begins with a recovery pass that rolls
an interrupted swap back (or finishes its cleanup) and removes orphaned
``__compact_*`` temps; the rewrite itself is wrapped so a failed write
never leaves its temp dir behind. (On a real object store, swap =
atomic prefix rename or a metadata-layer commit; same structure.)
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

from pyspark.sql import SparkSession

from opentimes_spark.io.write import write_sorted_partitioned


def recover_compaction(path: str) -> list[str]:
    """Repair leftovers of an interrupted ``compact_dir`` run on
    ``path``. Returns a list of human-readable actions taken.

    States handled:
    - ``path`` missing but ``path__precompact`` present → the crash hit
      between the two swap renames; roll back (restore the backup).
    - both present → the swap completed but cleanup didn't; finish it
      (remove the stale backup).
    - any ``path__compact_*`` temp dirs → a write crashed before the
      swap; remove them (the original is intact).
    """
    actions: list[str] = []
    backup = f"{path}__precompact"
    if os.path.exists(backup):
        if os.path.exists(path):
            shutil.rmtree(backup)
            actions.append(f"removed stale backup {backup}")
        else:
            os.rename(backup, path)
            actions.append(f"rolled back interrupted swap from {backup}")
    for tmp in glob.glob(f"{path}__compact_*"):
        shutil.rmtree(tmp)
        actions.append(f"removed orphaned temp {tmp}")
    return actions


def compact_dir(
    spark: SparkSession,
    path: str,
    order_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    target_files: int | None = None,
) -> tuple[int, int]:
    """Rewrite one parquet directory with a bounded file count.
    Returns (n_files_before, n_files_after).

    Starts with :func:`recover_compaction` so a directory left mid-swap
    by a previous crash is repaired before (and instead of silently
    breaking) the new run. The rewrite goes to a sibling temp dir first
    and swaps in only after success — a crashed compaction leaves the
    original intact, and a failed write cleans up its temp dir.

    Single-compactor-per-path, enforced by an O_EXCL ``__compact.lock``
    sibling (the snapshots publish-lock contract): without it a second
    overlapping run's recovery pass would delete the first run's live
    temp dir or roll the dataset back between its two swap renames.
    A crash while holding the lock leaves a stale lock file (content
    names pid + host); remove it manually once no compactor runs."""
    # a trailing slash would make every sibling (f"{path}__...") resolve
    # INSIDE the dataset and the swap rename fail after the full rewrite
    path = os.path.normpath(path)
    lock = f"{path}__compact.lock"
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise RuntimeError(
            f"another compaction holds {lock} (or crashed holding it — "
            "remove the stale lock once no compactor is running)"
        ) from None
    try:
        os.write(fd, f"{os.getpid()}@{os.uname().nodename}\n".encode())
        os.close(fd)
        recover_compaction(path)
        # a Hive-partitioned root (key=value subdirs) would be silently
        # FLATTENED by this whole-dir rewrite — the partition column
        # becomes a data column and downstream pruning dies.  Compact
        # the leaf directories individually instead.
        parts = [
            d for d in os.listdir(path)
            if "=" in d and os.path.isdir(os.path.join(path, d))
        ]
        if parts:
            raise ValueError(
                f"{path} is Hive-partitioned ({parts[0]}, ...) — "
                "compact_dir would flatten the layout; compact each "
                "leaf partition directory instead"
            )
        before = [f for f in os.listdir(path) if f.endswith(".parquet")]
        df = spark.read.parquet(path)
        if target_files and not order_by:
            # with order_by the file count comes from range partitioning
            # inside write_sorted_partitioned; coalescing here too would
            # just narrow the scan's parallelism for no benefit
            df = df.coalesce(target_files)
        tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
        try:
            write_sorted_partitioned(
                df,
                tmp,
                order_by=order_by,
                max_records_per_file=max_records_per_file,
                num_range_partitions=target_files if order_by else None,
            )
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        backup = f"{path}__precompact"
        os.rename(path, backup)
        os.rename(tmp, path)
        shutil.rmtree(backup)
        after = [f for f in os.listdir(path) if f.endswith(".parquet")]
        return len(before), len(after)
    finally:
        os.unlink(lock)
