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
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession

from opentimes_spark.io.write import write_sorted_partitioned


def compact_dir(
    spark: SparkSession,
    path: str,
    order_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    target_files: int | None = None,
) -> tuple[int, int]:
    """Rewrite one parquet directory with a bounded file count.
    Returns (n_files_before, n_files_after).

    The rewrite goes to a sibling temp dir first and swaps in only after
    success — a crashed compaction leaves the original intact. (On a
    real object store, swap = atomic prefix rename or a metadata-layer
    commit; same structure.)"""
    before = [f for f in os.listdir(path) if f.endswith(".parquet")]
    df = spark.read.parquet(path)
    if target_files:
        df = df.coalesce(target_files)
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    write_sorted_partitioned(
        df,
        tmp,
        order_by=order_by,
        max_records_per_file=max_records_per_file,
        num_range_partitions=target_files if order_by else None,
    )
    backup = f"{path}__precompact"
    os.rename(path, backup)
    os.rename(tmp, path)
    shutil.rmtree(backup)
    after = [f for f in os.listdir(path) if f.endswith(".parquet")]
    return len(before), len(after)
