"""Z-order (Morton) keys for multi-dimensional layout locality.

``write_sorted_partitioned`` gives perfect 1-D locality on the leading
sort key (origin_id), which is exactly what the reference's point-lookup
needs. But a workload that also filters on destination_id alone gets no
row-group skipping from that layout. Interleaving the two keys' bits
into one Morton key and range-partitioning/sorting on IT gives BOTH
dimensions partial locality: a predicate on either key maps to a bounded
set of Z-curve segments, so parquet min/max stats prune on either
column. This is the standard lakehouse technique (Delta OPTIMIZE ZORDER,
Iceberg sort orders) expressed with plain Spark expressions — no engine
extension needed.

The interleave works at NIBBLE granularity over fixed-width hex
renderings (4 bits per step, pure JVM-side string ops) — coarser than
per-bit Morton but preserves the locality property (each hex digit =
one 4-bit level of the quadtree) while staying a cheap codegen-friendly
expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex_fixed(col: Column, width: int) -> Column:
    """Lower-case zero-padded hex of a non-negative integral column.

    RAISES (raise_error, at execution) when a value needs more than
    ``width`` hex digits: lpad would otherwise silently TRUNCATE to the
    high-order digits, colliding distinct keys and breaking Z-curve
    order (2³² would sort before 2³²−1) — a silent wrong layout is
    strictly worse than a loud failure telling the caller to raise
    ``nibbles``."""
    v = col.cast("bigint")
    if width >= 16:  # any non-negative bigint fits 16 hex digits
        fits = v >= 0
    else:
        fits = (v >= 0) & (v < F.lit(16**width))
    # NULL in → NULL key out (SQL propagation): without the explicit
    # branch a NULL value falls into the raise_error arm with a NULL
    # message ([USER_RAISED_EXCEPTION] null) — found by the null-row
    # corpus probe.  Overflow on PRESENT values still raises loudly.
    return F.when(
        v.isNull(), F.lit(None).cast("string")
    ).when(
        fits, F.lpad(F.lower(F.hex(v)), width, "0")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("morton key overflow: value "),
                v.cast("string"),
                F.lit(f" does not fit {width} hex digits — raise nibbles"),
            )
        )
    )


def morton_key(a: Column, b: Column, nibbles: int = 8) -> Column:
    """Interleave the low ``nibbles`` hex digits of two non-negative
    integer columns: key = a0 b0 a1 b1 ... (most-significant first).
    Lexicographic order on the result is Z-curve order over (a, b)."""
    ah, bh = _hex_fixed(a, nibbles), _hex_fixed(b, nibbles)
    parts = []
    for i in range(1, nibbles + 1):
        parts.append(F.substring(ah, i, 1))
        parts.append(F.substring(bh, i, 1))
    return F.concat(*parts)


def with_morton_key(
    df: DataFrame,
    col_a: str,
    col_b: str,
    key_name: str = "zkey",
    nibbles: int = 8,
) -> DataFrame:
    """Attach the Z-order key column. Write with
    ``write_sorted_partitioned(df, path, order_by=[key_name])`` to get
    two-dimensional row-group locality on (col_a, col_b)."""
    return df.withColumn(key_name, morton_key(F.col(col_a), F.col(col_b), nibbles))
