"""Public-site index renderer (SURVEY.md S13 consumer artifact).

Reference: opentimes renders an nginx-style ``index.html`` per bucket
directory — a table of (Item link, Last Modified, Size) where directory
rows show the subtree's total size and max mtime — from the walked
bucket tree (data/src/create_public_site.py:74-150, utils/utils.py:31-36
``format_size``, site/templates/index.html).

Spark-first shape: the per-directory page CONTENTS are computed
distributed — one ancestor-explode + groupBy for directory totals
(bounded ×depth fan-out, nothing like the file count), one groupBy for
per-directory file entries, one join by parent — and only the final
HTML strings are written driver-side via ``toLocalIterator`` (bounded
memory: one directory page at a time). The reference walks the whole
bucket into a driver dict first; at 100 TB that dict is the bottleneck,
the grouped DataFrame is not.
"""

from __future__ import annotations

import html
import json
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def format_size(size: float) -> str:
    """Human-readable size, reference display parity (utils.py:31-36)."""
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if size < 1024:
            return f"{size:.2f} {unit}"
        size /= 1024
    return f"{size:.2f} PB"


def _iso(mtime_ms: int) -> str:
    return (
        datetime.fromtimestamp(mtime_ms / 1000, tz=timezone.utc)
        .replace(microsecond=0)
        .isoformat(timespec="seconds")
    )


def directory_totals(listing: DataFrame) -> DataFrame:
    """(dir_path, total_size, max_mtime_ms, n_files) for EVERY directory
    in the listing (including the root as ''): each file contributes to
    each of its ancestors via a bounded explode (depth ≤ path depth),
    then one groupBy — the distributed form of the reference's recursive
    total propagation (utils/cloudflare.py:22-33)."""
    parts = F.split(F.col("rel_path"), "/")
    # ancestors of a/b/c.parquet = '' , 'a', 'a/b'
    ancestors = F.transform(
        F.sequence(F.lit(0), F.size(parts) - 1),
        lambda i: F.array_join(F.slice(parts, 1, i), "/"),
    )
    exploded = listing.select(
        F.explode(ancestors).alias("dir_path"), "size", "mtime_ms"
    )
    return exploded.groupBy("dir_path").agg(
        F.sum("size").alias("total_size"),
        F.max("mtime_ms").alias("max_mtime_ms"),
        F.count(F.lit(1)).alias("n_files"),
    )


def _dirname(col):
    parts = F.split(col, "/")
    return F.array_join(F.slice(parts, 1, F.size(parts) - 1), "/")


def _basename(col):
    return F.element_at(F.split(col, "/"), -1)


def directory_pages(listing: DataFrame) -> DataFrame:
    """One row per directory: (dir_path, files, subdirs) where files =
    [(name, size, mtime_ms)] directly in the directory and subdirs =
    [(name, total_size, max_mtime_ms, n_files)] of immediate children —
    everything a page render needs, grouped cluster-side."""
    totals = directory_totals(listing)
    files = (
        listing.select(
            _dirname(F.col("rel_path")).alias("dir_path"),
            F.struct(
                _basename(F.col("rel_path")).alias("name"),
                F.col("size"),
                F.col("mtime_ms"),
            ).alias("f"),
        )
        .groupBy("dir_path")
        .agg(F.array_sort(F.collect_list("f")).alias("files"))
    )
    subdirs = (
        totals.filter(F.col("dir_path") != "")
        .select(
            _dirname(F.col("dir_path")).alias("dir_path"),
            F.struct(
                _basename(F.col("dir_path")).alias("name"),
                F.col("total_size"),
                F.col("max_mtime_ms"),
                F.col("n_files"),
            ).alias("d"),
        )
        .groupBy("dir_path")
        .agg(F.array_sort(F.collect_list("d")).alias("subdirs"))
    )
    return (
        files.join(subdirs, "dir_path", "full_outer")
        .join(totals, "dir_path", "left")
        .select(
            "dir_path", "files", "subdirs", "total_size", "max_mtime_ms",
            "n_files",
        )
    )


_PAGE = """<!DOCTYPE html>
<html>
<head><meta charset="utf-8"><title>Index of /{folder}</title></head>
<body>
<h1>Index of /{folder}</h1>
<table>
<tr><th>Item</th><th>Last Modified</th><th>Size</th></tr>
{parent_row}{rows}
</table>
<p>{total_note}</p>
</body>
</html>
"""


def render_site_index(listing: DataFrame, out_dir: str) -> int:
    """Write an ``index.html`` per directory under ``out_dir`` mirroring
    the listing's tree (reference create_public_site.py:74-112 without
    the bucket upload): directory rows link to child index pages and
    show subtree totals, file rows show size + UTC mtime. Returns the
    number of pages written. Driver memory stays bounded — pages stream
    one at a time from the cluster."""
    n = 0
    for row in directory_pages(listing).toLocalIterator():
        d = row["dir_path"] or ""
        rows = []
        for sd in row["subdirs"] or []:
            rows.append(
                "<tr><td><a href=\"{0}/index.html\">{0}/</a></td>"
                "<td>{1}</td><td>{2}</td></tr>".format(
                    html.escape(sd["name"]),
                    _iso(sd["max_mtime_ms"]),
                    format_size(sd["total_size"]),
                )
            )
        for f in row["files"] or []:
            rows.append(
                "<tr><td><a href=\"{0}\">{0}</a></td>"
                "<td>{1}</td><td>{2}</td></tr>".format(
                    html.escape(f["name"]), _iso(f["mtime_ms"]), format_size(f["size"])
                )
            )
        parent_row = (
            "<tr><td><a href=\"../index.html\">../</a></td><td></td><td></td></tr>\n"
            if d
            else ""
        )
        # both numbers cover the SUBTREE (directory_totals): pairing the
        # subtree size with only the direct file count read as
        # "10 GB (2 files)" on nested layouts
        total_note = "Total: {0} ({1} files)".format(
            format_size(row["total_size"] or 0), row["n_files"] or 0
        )
        page_dir = os.path.join(out_dir, d) if d else out_dir
        os.makedirs(page_dir, exist_ok=True)
        with open(os.path.join(page_dir, "index.html"), "w") as fh:
            fh.write(
                _PAGE.format(
                    folder=html.escape(d),
                    parent_row=parent_row,
                    rows="\n".join(rows),
                    total_note=total_note,
                )
            )
        n += 1
    return n


def write_file_count_index(
    listing: DataFrame, key_levels: list[int], path: str
) -> dict:
    """S14 artifact form of ``file_count_index``: the per-key file
    counts as one JSON object (reference create_tiles.sh:36-57 emits the
    awk count[$1]++ table for the tile job matrix). Keys are the path
    level values joined by '/'; returns and writes the mapping."""
    from opentimes_spark.operators.catalog import file_count_index

    counts = file_count_index(listing, key_levels)
    cols = [f"l{i}" for i in key_levels]
    mapping = {
        "/".join(str(r[c]) for c in cols): r["n_files"]
        for r in counts.collect()
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        json.dump(mapping, fh, indent=2, sort_keys=True)
    return mapping
