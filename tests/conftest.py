from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from opentimes_spark.session import get_spark

    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s


def rows(df, *order_cols):
    """Collect to a sorted list of tuples for order-insensitive equality."""
    out = [tuple(r) for r in df.collect()]
    return sorted(out) if not order_cols else sorted(
        out, key=lambda t: tuple(t[df.columns.index(c)] for c in order_cols)
    )
