"""Mergeable quantile sketch — incremental percentile monitoring
without rescans (round 8).

``agg_percentiles`` gives EXACT percentiles (a sort-bound global pass)
and ``hist_equidepth_price`` gives fixed-grid histograms; what a 100 TB
*daily* pipeline additionally needs is a tiny, MERGEABLE summary: build
one sketch per ingest (one pass over that day's data), persist it, and
answer "p95 over the last N days" by merging N sketches — never
rescanning history.  The same contract as the exact-dedup ledger and
the LSH/IVF-PQ appends (O(batch) per day), applied to order statistics.

The sketch is the deterministic MRL/KLL-style compactor ladder:

- level-0 buffer collects raw values (weight 1); when a level's buffer
  exceeds capacity ``k`` it is sorted and every SECOND element (even
  ranks after an id-free value sort) is promoted to the next level with
  doubled weight — deterministic, no RNG, so a fixed input partition
  layout reproduces bit-identical sketches;
- a sketch is a bag of (level, value) rows, size O(k log(n/k));
- merging = concatenating level lists and re-compacting — the
  associative/commutative monoid that makes per-partition partials and
  per-day persistence work;
- quantile answers interpolate the weighted CDF of retained values.

Determinism caveat (disclosed, inherent to compacting sketches): the
retained VALUES depend on how the input was split (per-partition
partials compact in different orders), so unlike the registry's exact
queries this operator is certified by ERROR BOUNDS and fixed-layout
reproducibility, not cross-engine value hashes: deterministic-compaction
MRL gives rank error <= log2(n/k)/2 * (k/2)^-1 ~ eps*n with
eps ~ log2(n/k)/k; tests assert a conservative bound on shuffled
layouts and exact reproducibility on fixed layouts.

Scale story: the heavy pass is `mapInPandas` over value batches (one
numpy sort per compaction, amortized O(log) compactions per element);
each partition emits <= k*levels rows; the driver-side merge touches
only those rows (bytes per partition, like the k-means codebook
collects).  Persisted sketches are plain parquet (level, value, weight)
— `read_sketch`/`merge_sketches` reassemble them across days.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

SKETCH_SCHEMA = "level int, value double"


class _Compactors:
    """The in-memory ladder: list of python lists per level."""

    def __init__(self, k: int) -> None:
        if k < 4 or k % 2:
            raise ValueError("capacity k must be even and >= 4")
        self.k = k
        self.levels: list[list[float]] = [[]]
        self.offsets: list[int] = [0]  # per-level alternating parity

    def add(self, v: float, level: int = 0) -> None:
        while level >= len(self.levels):
            self.levels.append([])
            self.offsets.append(0)
        self.levels[level].append(v)
        while any(len(b) > self.k for b in self.levels):
            self._compact()

    def _compact(self) -> None:
        for lvl, buf in enumerate(self.levels):
            if len(buf) > self.k:
                buf.sort()
                # compact an EVEN body so weight is conserved exactly
                # (2m rows -> m rows at double weight); an odd buffer
                # retains its max at this level
                if len(buf) % 2:
                    body, keep = buf[:-1], [buf[-1]]
                else:
                    body, keep = buf, []
                # alternate the kept parity per level per compaction —
                # deterministic (no RNG) but debiased: a fixed even
                # offset would skew every estimate low by one rank per
                # compaction
                off = self.offsets[lvl]
                promoted = body[off::2]
                self.offsets[lvl] = 1 - off
                self.levels[lvl] = keep
                if lvl + 1 >= len(self.levels):
                    self.levels.append([])
                    self.offsets.append(0)
                self.levels[lvl + 1].extend(promoted)
                break

    def rows(self) -> list[tuple[int, float]]:
        return [
            (lvl, float(v))
            for lvl, buf in enumerate(self.levels)
            for v in buf
        ]


def build_sketch(df: DataFrame, col: str, k: int = 128) -> DataFrame:
    """One pass over ``col`` → sketch rows (level, value); each row
    represents 2^level original values.  Per-partition compaction via
    mapInPandas; output is <= k*log2(n/k) rows per partition."""
    from opentimes_spark.session import ship_package

    ship_package(df.sparkSession)  # closure references _Compactors

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = _Compactors(k)
        for pdf in batches:
            for v in pdf[col].dropna().to_numpy():
                c.add(float(v))
        rows = c.rows()
        yield pd.DataFrame(
            {
                "level": pd.Series([r[0] for r in rows], dtype="int32"),
                "value": pd.Series([r[1] for r in rows], dtype="float64"),
            }
        )

    return df.select(col).mapInPandas(per_partition, SKETCH_SCHEMA)


def merge_sketch_rows(rows_df: DataFrame, k: int = 128) -> list[tuple[int, float]]:
    """Driver-side monoid merge: feed every (level, value) row into a
    fresh ladder at its level.  Input is sketch rows (bounded — k*log n
    per constituent sketch), NEVER raw data."""
    c = _Compactors(k)
    for r in rows_df.select("level", "value").collect():
        c.add(float(r["value"]), level=int(r["level"]))
    return c.rows()


def quantiles_from_rows(
    rows: list[tuple[int, float]], qs: list[float]
) -> dict[float, float]:
    """Weighted-CDF quantile answers from sketch rows."""
    if not rows:
        return {q: float("nan") for q in qs}
    arr = sorted((v, 1 << lvl) for lvl, v in rows)
    vals = np.array([a[0] for a in arr])
    wts = np.array([a[1] for a in arr], dtype=np.float64)
    cum = np.cumsum(wts)
    total = cum[-1]
    out = {}
    for q in qs:
        target = q * total
        idx = int(np.searchsorted(cum, target, side="left"))
        idx = min(idx, len(vals) - 1)
        out[q] = float(vals[idx])
    return out


def sketch_quantiles(
    df: DataFrame, col: str, qs: list[float], k: int = 128
) -> dict[float, float]:
    """End-to-end: build per-partition sketches, merge, answer."""
    return quantiles_from_rows(
        merge_sketch_rows(build_sketch(df, col, k), k), qs
    )


def write_sketch(df: DataFrame, col: str, path: str, k: int = 128) -> None:
    """Persist one ingest's sketch — the daily artifact a monitoring
    job merges across days."""
    build_sketch(df, col, k).write.mode("overwrite").parquet(path)


def merged_quantiles(
    spark, paths: list[str], qs: list[float], k: int = 128
) -> dict[float, float]:
    """Percentiles over the UNION of the ingests whose sketches live at
    ``paths`` — touches only sketch rows, never the original data."""
    df = spark.read.parquet(*paths)
    return quantiles_from_rows(merge_sketch_rows(df, k), qs)
