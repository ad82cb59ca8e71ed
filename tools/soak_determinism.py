"""Spark-vs-Spark determinism soak: run each query under TWO different
shuffle-partition settings (different partial-aggregation merge orders)
and compare values EXACTLY.

The DuckDB differential (tools/check.py) certifies cross-engine parity
for one Spark execution; this gate certifies the Spark side is
execution-plan-stable — a grouped double SUM whose rounding sits on a
boundary can hash green against the oracle in one run and red in the
driver's run, and only shows up by varying the physical partitioning.

Usage: python tools/soak_determinism.py [sf_dir] [query ...]
       (default: every query NOT yet driver-certified)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(names: list[str] | None, sf_dir: str) -> int:
    import pandas as pd
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from tools.check import normalize

    qs = entrymod.queries()
    if not names:
        names = [n for n in qs if n not in entrymod._CERTIFIED]

    def collect(shuffle_parts: int) -> dict[str, pd.DataFrame]:
        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", str(shuffle_parts))
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.ui.enabled", "false")
            .appName(f"soak-{shuffle_parts}")
            .getOrCreate()
        )
        out = {}
        try:
            for n in names:
                out[n] = normalize(qs[n](spark, sf_dir).toPandas())
        finally:
            spark.stop()
        return out

    a = collect(32)
    b = collect(7)
    n_fail = 0
    for n in names:
        try:
            pd.testing.assert_frame_equal(a[n], b[n], check_exact=True)
            print(f"OK    {n}")
        except AssertionError as e:
            n_fail += 1
            print(f"FAIL  {n}: values differ across shuffle settings\n{e}")
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} NONDETERMINISTIC'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    raise SystemExit(run(sys.argv[2:] or None, sf))
