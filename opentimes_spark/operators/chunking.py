"""Row-range chunking (SURVEY.md W1).

Reference: opentimes data/src/utils/utils.py:55-138 (``split_range``,
``split_file_to_str``) — split N sorted rows into at most ``n_chunks``
contiguous ranges of at least ``min_chunk_size`` rows, the remainder
folded into the last chunk, each labelled ``"<start>-<end>"`` with
zero-padded bounds. The reference computes ranges driver-side and slices
with ``iloc``; in Spark the chunk id is a column derived from
``row_number`` so it can drive ``repartition`` (chunk == unit of work for
the matrix operator).

Note the window over a global ORDER BY is a single-partition sort — fine
for the dimension-sized origin/destination tables this is applied to
(≤ millions of rows); the 100-TB fact tables never pass through here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_bounds(n: int, n_chunks: int, min_chunk_size: int) -> list[tuple[int, int]]:
    """Driver-side range computation, reference-faithful: chunk size =
    max(min_chunk_size, n // n_chunks); remainder rows fold into the last
    chunk (utils.py:134-137). Returns [(start, end_exclusive), ...]."""
    if n <= 0:
        return []
    size = max(min_chunk_size, n // max(n_chunks, 1))
    # cap at n_chunks: when the remainder (n mod n_chunks) is >= size,
    # n // size alone would emit MORE than n_chunks chunks (n=11, c=4:
    # size 2, 11//2 = 5) — the excess folds into the last chunk with
    # the rest of the remainder
    n_full = max(min(n // size, max(n_chunks, 1)), 1)
    bounds = [(i * size, (i + 1) * size) for i in range(n_full)]
    start, _ = bounds[-1]
    bounds[-1] = (start, n)  # fold remainder into last chunk
    return bounds


def with_chunk_id(
    df: DataFrame,
    order_col: str,
    n_chunks: int,
    min_chunk_size: int,
    total: int | None = None,
    label_width: int = 8,
) -> DataFrame:
    """Add ``chunk_idx`` and zero-padded ``chunk_label`` ("start-end",
    end exclusive) columns matching the reference's labels."""
    n = total if total is not None else df.count()
    if len(str(n)) > label_width:
        # lpad TRUNCATES over-width strings, silently corrupting (and
        # potentially colliding) chunk labels — fail loudly instead
        raise ValueError(
            f"label_width={label_width} cannot represent bounds up to "
            f"{n}; pass label_width >= {len(str(n))}"
        )
    bounds = chunk_bounds(n, n_chunks, min_chunk_size)
    rn = F.row_number().over(Window.orderBy(order_col)) - 1
    out = df.withColumn("_rn", rn)
    idx = F.lit(len(bounds) - 1)
    for i in range(len(bounds) - 2, -1, -1):
        idx = F.when(F.col("_rn") < bounds[i][1], F.lit(i)).otherwise(idx)
    out = out.withColumn("chunk_idx", idx)
    starts = F.array(*[F.lit(b[0]) for b in bounds])
    ends = F.array(*[F.lit(b[1]) for b in bounds])
    label = F.concat_ws(
        "-",
        F.lpad(starts[F.col("chunk_idx")].cast("string"), label_width, "0"),
        F.lpad(ends[F.col("chunk_idx")].cast("string"), label_width, "0"),
    )
    return out.withColumn("chunk_label", label).drop("_rn")
