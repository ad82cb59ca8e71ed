"""W1 chunking — reference edge cases from opentimes
data/src/utils/utils.py:55-138 (FIXTURES.md operator-edge-case list)."""

from __future__ import annotations

from opentimes_spark.operators.chunking import chunk_bounds, with_chunk_id


def test_small_n_single_chunk():
    # n below n_chunks*min_chunk_size → one chunk holding everything
    assert chunk_bounds(7, n_chunks=4, min_chunk_size=10) == [(0, 7)]


def test_remainder_folds_into_last():
    # size = max(5, 23//4=5) = 5 → 4 full chunks, remainder 3 folds in
    assert chunk_bounds(23, 4, 5) == [(0, 5), (5, 10), (10, 15), (15, 23)]


def test_exact_division():
    assert chunk_bounds(20, 4, 5) == [(0, 5), (5, 10), (10, 15), (15, 20)]


def test_empty():
    assert chunk_bounds(0, 4, 5) == []


def test_labels_and_assignment(spark):
    df = spark.range(0, 23).withColumnRenamed("id", "k")
    out = with_chunk_id(df, "k", n_chunks=4, min_chunk_size=5, label_width=4)
    got = {r["k"]: (r["chunk_idx"], r["chunk_label"]) for r in out.collect()}
    assert got[0] == (0, "0000-0005")
    assert got[4] == (0, "0000-0005")
    assert got[5] == (1, "0005-0010")
    assert got[22] == (3, "0015-0023")  # remainder chunk
    assert len({v for v in got.values()}) == 4


def test_chunk_bounds_remainder_never_exceeds_n_chunks():
    """n=11, chunks=4, size 2: 11//2 = 5 ranges would exceed the
    contract; the cap folds the excess into the last chunk."""
    from opentimes_spark.operators.chunking import chunk_bounds

    b = chunk_bounds(11, 4, 1)
    assert b == [(0, 2), (2, 4), (4, 6), (6, 11)]
    assert len(b) <= 4 and b[-1][1] == 11
