"""Public-site index renderer (operators/site.py): per-directory
index.html pages with subtree totals + the file-count JSON artifact."""

from __future__ import annotations

import json
import os
import re

from opentimes_spark.operators.catalog import list_tree
from opentimes_spark.operators.site import (
    directory_totals,
    format_size,
    render_site_index,
    write_file_count_index,
)


def _make_tree(root):
    files = {
        "version=0.0.1/mode=car/times.parquet": 3000,
        "version=0.0.1/mode=car/extra.parquet": 1024,
        "version=0.0.1/mode=bike/times.parquet": 2048,
        "databases/0.0.1.duckdb": 512,
        "_SUCCESS": 0,
    }
    for rel, size in files.items():
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p) or root, exist_ok=True)
        with open(p, "wb") as fh:
            fh.write(b"x" * size)
    return files


def test_directory_totals_match_listing(spark, tmp_path):
    """Every directory's rendered total must equal the sum over the
    listing DataFrame for that subtree (the reference's recursive
    propagation, computed as one explode+groupBy)."""
    src = tmp_path / "bucket"
    src.mkdir()
    files = _make_tree(str(src))
    listing = list_tree(spark, str(src))
    totals = {r["dir_path"]: r for r in directory_totals(listing).collect()}
    assert totals[""]["total_size"] == sum(files.values())
    assert totals[""]["n_files"] == len(files)
    assert totals["version=0.0.1"]["total_size"] == 3000 + 1024 + 2048
    assert totals["version=0.0.1/mode=car"]["n_files"] == 2
    assert totals["databases"]["total_size"] == 512


def test_render_site_index_pages(spark, tmp_path):
    src = tmp_path / "bucket"
    out = tmp_path / "site"
    src.mkdir()
    _make_tree(str(src))
    listing = list_tree(spark, str(src))
    n_pages = render_site_index(listing, str(out))
    # one page per directory: root, version=0.0.1, car, bike, databases
    assert n_pages == 5
    root_page = (out / "index.html").read_text()
    # root page: subdir rows carry the subtree totals the DataFrame says
    assert format_size(3000 + 1024 + 2048) in root_page
    assert 'href="version=0.0.1/index.html"' in root_page
    assert "_SUCCESS" in root_page and "../index.html" not in root_page
    car_page = (out / "version=0.0.1" / "mode=car" / "index.html").read_text()
    assert 'href="times.parquet"' in car_page
    assert format_size(3000) in car_page and format_size(1024) in car_page
    assert "../index.html" in car_page  # non-root pages link up
    # ISO-8601 UTC timestamps like the reference's bucket listing
    assert re.search(r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\+00:00", car_page)


def test_file_count_index_artifact(spark, tmp_path):
    src = tmp_path / "bucket"
    src.mkdir()
    _make_tree(str(src))
    listing = list_tree(spark, str(src))
    path = str(tmp_path / "tile_counts.json")
    mapping = write_file_count_index(
        listing.filter("rel_path LIKE 'version=%'"), [0, 1], path
    )
    assert mapping == {
        "version=0.0.1/mode=car": 2,
        "version=0.0.1/mode=bike": 1,
    }
    assert json.load(open(path)) == mapping


def test_format_size_reference_parity():
    assert format_size(0) == "0.00 B"
    assert format_size(1023) == "1023.00 B"
    assert format_size(1024) == "1.00 KB"
    assert format_size(3000) == "2.93 KB"
    assert format_size(5 * 1024**3) == "5.00 GB"
