"""Property-based tests (hypothesis) for the driver-side kernels —
pure functions whose edge cases (remainders, tiny n, degenerate chunk
params) are exactly where example-based tests go stale. Mirrors the
reference's own parametrized testing of split_range (SURVEY.md §5)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from opentimes_spark.io.external import normalize_shapefile_columns
from opentimes_spark.operators.chunking import chunk_bounds


@given(
    n=st.integers(min_value=0, max_value=100_000),
    n_chunks=st.integers(min_value=1, max_value=64),
    min_chunk=st.integers(min_value=1, max_value=25_000),
)
@settings(max_examples=300, deadline=None)
def test_chunk_bounds_partition_exactly(n, n_chunks, min_chunk):
    bounds = chunk_bounds(n, n_chunks, min_chunk)
    if n == 0:
        assert bounds == []
        return
    # contiguous, complete, non-overlapping cover of [0, n)
    assert bounds[0][0] == 0 and bounds[-1][1] == n
    for (s1, e1), (s2, e2) in zip(bounds, bounds[1:]):
        assert e1 == s2
    # the chunk-count and size contracts (remainder folds into the last)
    assert len(bounds) <= max(n_chunks, 1)
    for s, e in bounds[:-1]:
        assert e - s >= min(min_chunk, n)
    assert all(e > s for s, e in bounds)


@given(
    n=st.integers(min_value=1, max_value=100_000),
    n_chunks=st.integers(min_value=1, max_value=64),
    min_chunk=st.integers(min_value=1, max_value=25_000),
)
@settings(max_examples=200, deadline=None)
def test_chunk_bounds_last_chunk_absorbs_remainder(n, n_chunks, min_chunk):
    bounds = chunk_bounds(n, n_chunks, min_chunk)
    sizes = [e - s for s, e in bounds]
    # every chunk except the last has the uniform computed size
    if len(sizes) > 1:
        assert len(set(sizes[:-1])) == 1
        assert sizes[-1] >= sizes[0]


@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7F
            ),
            min_size=1,
            max_size=12,
        ),
        max_size=8,
    )
)
@settings(max_examples=200, deadline=None)
def test_normalize_shapefile_columns_idempotent(names):
    once = normalize_shapefile_columns(names)
    assert normalize_shapefile_columns(once) == once
    assert all(c == c.lower() for c in once)
    assert all(not c or not c[-1].isdigit() for c in once)
