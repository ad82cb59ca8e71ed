"""Local differential harness mimicking the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, column names, and
values (columns sorted by name, rows sorted) — flagging any float column
that matches only approximately, since the driver hashes exact values.

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df):
    """pandas frame → (columns sorted by name, rows sorted) for compare."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")
    return df


def compare(name: str, sdf, ddf) -> list[str]:
    problems: list[str] = []
    if sorted(sdf.columns) != sorted(ddf.columns):
        return [f"columns differ: spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"]
    if len(sdf) != len(ddf):
        return [f"row count differs: spark={len(sdf)} duck={len(ddf)}"]
    s, d = normalize(sdf), normalize(ddf)
    # Dtype parity FIRST: the driver hashes serialized values, so an
    # integer column on one side materializing as float on the other
    # (e.g. DuckDB HUGEINT -> pandas float64) breaks the hash even when
    # every value compares equal after coercion.  r4 shipped 4 such
    # failures that the value-coercing loop below could not see.
    # The r5 driver failure was one kind over: Spark DecimalType →
    # pandas object column of decimal.Decimal, DuckDB float64 — equal
    # values, different serialized hash.  So any kind split where one
    # side is numeric and the other is object (or numeric of a
    # different kind) is a hash failure, not a value question.
    for col in s.columns:
        sk, dk = s[col].dtype.kind, d[col].dtype.kind
        if sk != dk and ({sk, dk} <= {"i", "u", "f"} or "O" in {sk, dk}):
            problems.append(
                f"col {col}: DTYPE KIND MISMATCH (hash would fail): "
                f"spark={s[col].dtype} duck={d[col].dtype}"
            )
    if problems:
        return problems
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        exact = all(_eq(a, b) for a, b in zip(sv, dv))
        if exact:
            continue
        approx = all(_approx(a, b) for a, b in zip(sv, dv))
        bad = next((a, b) for a, b in zip(sv, dv) if not _eq(a, b))
        if approx:
            problems.append(f"col {col}: APPROX ONLY (hash would fail) e.g. {bad}")
        else:
            problems.append(f"col {col}: MISMATCH e.g. {bad}")
    return problems


def _eq(a, b) -> bool:
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
        na = a is None or (isinstance(a, float) and math.isnan(a))
        nb = b is None or (isinstance(b, float) and math.isnan(b))
        return na == nb
    # A decimal.Decimal on one side and a float on the other serialize
    # differently even when numerically equal — the driver hash fails.
    if isinstance(a, decimal.Decimal) != isinstance(b, decimal.Decimal):
        return False
    if isinstance(a, float) or isinstance(b, float):
        return float(a) == float(b)
    return a == b


def _approx(a, b) -> bool:
    if _eq(a, b):
        return True
    try:
        return math.isclose(float(a), float(b), rel_tol=1e-6, abs_tol=1e-9)
    except (TypeError, ValueError):
        return False


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from opentimes_spark.session import get_spark

    spark = get_spark("check")
    con = duck_connect(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            n_fail += 1
            print(f"FAIL  {name}: [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"OK    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
