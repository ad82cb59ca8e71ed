"""Static lint for the oracle registry: flag cross-engine flake
patterns before the driver's value hash does.

Checks, each a defect class found live during round 5:

1. ``ROUND(SUM|AVG(<float>))`` without a DECIMAL accumulator — a float
   sum's last ulp depends on summation order, so a .xx5 boundary can
   round apart between engines (the ``unpivot_balance_metrics`` flake,
   caught only at sf0.001).  Sites listed here are CANDIDATES: many are
   empirically stable across three scale-factor sweeps — fix on first
   flake with the decimal-sum + stable_round rule rather than churning
   certified queries.
2. ``ORDER BY`` on an unrounded float aggregate inside ROW_NUMBER —
   rank plateaus split nondeterministically (the PageRank flake).
3. Integer ``SUM(CASE ...)`` without ``CAST(... AS BIGINT)`` — DuckDB
   types it HUGEINT, pandas materializes float64, and the driver hash
   fails on equal values (the round-4 failure class).
4. (``--schemas`` mode) Any registered Spark query whose resolved
   output schema contains DecimalType — ``toPandas()`` materializes
   decimal.Decimal objects while DuckDB materializes float64, so the
   driver hash fails on equal values (the round-5 failure class,
   ``events_weekday_uplift``).  Needs a SparkSession for schema
   analysis, so it is opt-in.

5. (``--windows`` mode) Any registered query whose optimized plan has a
   Window with EMPTY partitioning consuming a non-aggregated FACT-table
   scan — a single-partition global sort over the whole fact table at
   100 TB (the ``window_ntile`` weak from VERDICT r6).  Unpartitioned
   windows over aggregate-first frames (week/part/vocab grain) are the
   deliberate sorted-fold determinism idiom and pass; the two disclosed
   oracle twins (``window_ntile``, ``hist_equidepth_price``, which
   document their percentile-cutpoint production paths) are allowlisted.
   Needs a SparkSession, so it is opt-in; exits 1 on any non-allowlisted
   violation.

Usage: python tools/lint_oracles.py [--schemas [sf_dir]] [--windows [sf_dir]]
       (static checks exit 0 always — informational;
        --schemas exits 1 on any DecimalType output column;
        --windows exits 1 on any undisclosed global-sort Window)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def lint_schemas(sf_dir: str) -> int:
    """Build every registered query's DataFrame (schema analysis only —
    no job runs unless the query's *construction* executes one) and flag
    DecimalType anywhere in the output schema."""
    from pyspark.sql.types import DecimalType

    import __spark_entry__ as entrymod
    from opentimes_spark.session import get_spark

    spark = get_spark("lint-schemas")
    n_dec = 0
    for name, fn in sorted(entrymod.queries().items()):
        try:
            schema = fn(spark, sf_dir).schema
        except Exception as e:  # surface, don't mask, a broken query
            print(f"[schema-err]  {name}: {e}")
            n_dec += 1
            continue
        dec_cols = [f.name for f in schema.fields if isinstance(f.dataType, DecimalType)]
        if dec_cols:
            print(f"[decimal-out] {name}: {dec_cols} — driver hash will fail "
                  "(cast to double before the final projection)")
            n_dec += 1
    print(f"\n{n_dec} DecimalType-emitting queries")
    return 1 if n_dec else 0


# Big tables at production scale — a global sort over any of these is a
# single-task bottleneck.  region/nation/customer/supplier are
# dimension-sized (the chunking operator's documented domain); part
# joined the fact set in round 13 (VERDICT r12 nit #1: TPC-H part
# scales with SF — 20k rows at sf0.1 is ~2e10 at 100 TB).
FACT_TABLES = {"orders", "lineitem", "events", "documents", "embeddings",
               "part"}

# Logical nodes that bound cardinality / change grain between the fact
# scan and the window: anything above them sorts an aggregate or a
# bounded row set, not the fact table.  Distinct and limits both appear
# as these in the optimized plan.
_GRAIN_BOUNDING = {"Aggregate", "GlobalLimit"}

# Disclosed oracle twins: each documents in its docstring that the exact
# global-NTILE form exists for DuckDB replay and names its sort-free
# production path (operators/histogram.py equidepth cutpoints,
# operators/chunking.py range-partitioned ranks, or — for the decile
# composition query — quantile-sketch boundaries joined as a broadcast
# range join, per its docstring).
WINDOW_ALLOWLIST = {
    "window_ntile", "hist_equidepth_price", "orders_decile_mix",
}


def unpartitioned_fact_windows(jplan) -> list[str]:
    """Walk an optimized logical plan (py4j); return the fact-table names
    reached by a Window with empty partitionSpec with no grain-bounding
    node (Aggregate/GlobalLimit) in between."""
    hits: list[str] = []

    def facts_below(node):
        cls = node.getClass().getSimpleName()
        if cls in _GRAIN_BOUNDING:
            return
        if cls == "LogicalRelation":
            try:
                path = node.relation().location().rootPaths().apply(0).toString()
            except Exception:
                return
            name = path.rstrip("/").rsplit("/", 1)[-1].split(".")[0]
            if name in FACT_TABLES:
                hits.append(name)
            return
        for i in range(node.children().size()):
            facts_below(node.children().apply(i))

    def walk(node):
        cls = node.getClass().getSimpleName()
        if cls == "Window" and node.partitionSpec().size() == 0:
            for i in range(node.children().size()):
                facts_below(node.children().apply(i))
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(jplan)
    return hits


def lint_windows(sf_dir: str) -> int:
    """Build every registered query and flag undisclosed global-sort
    Windows over non-aggregated fact scans (VERDICT r6 'kill the class'
    item for the 174-warning blind spot)."""
    import __spark_entry__ as entrymod
    from opentimes_spark.session import get_spark

    spark = get_spark("lint-windows")
    n_bad = n_allow = 0
    for name, fn in sorted(entrymod.queries().items()):
        try:
            jplan = fn(spark, sf_dir)._jdf.queryExecution().optimizedPlan()
            facts = unpartitioned_fact_windows(jplan)
        except Exception as e:  # surface, don't mask, a broken query
            print(f"[plan-err]     {name}: {e}")
            n_bad += 1
            continue
        if facts:
            if name in WINDOW_ALLOWLIST:
                n_allow += 1
                print(f"[global-sort:allowed] {name}: {sorted(set(facts))} "
                      "(disclosed oracle twin)")
            else:
                n_bad += 1
                print(f"[global-sort] {name}: unpartitioned Window over raw "
                      f"fact scan {sorted(set(facts))} — disclose + add a "
                      "production twin, or partition/aggregate first")
    print(f"\n{n_bad} undisclosed global-sort windows, {n_allow} allowlisted")
    return 1 if n_bad else 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--schemas":
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
        return lint_schemas(sf_dir)
    if len(sys.argv) > 1 and sys.argv[1] == "--windows":
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
        return lint_windows(sf_dir)
    from opentimes_spark.plans.queries import ORACLE_SQL

    n1 = n2 = n3 = 0
    for name, sql in sorted(ORACLE_SQL.items()):
        for m in re.finditer(
            r"ROUND\(\s*(SUM|AVG)\(([^()]*(?:\([^()]*\))?[^()]*)\)", sql, re.I
        ):
            inner = m.group(2).upper()
            if "DECIMAL" not in inner and "BIGINT" not in inner:
                print(f"[float-round] {name}: {m.group(0)[:80]}")
                n1 += 1
        for m in re.finditer(
            r"ROW_NUMBER\(\)\s*OVER\s*\([^)]*ORDER\s+BY\s+(SUM|AVG)\(",
            sql,
            re.I | re.S,
        ):
            print(f"[float-rank]  {name}: {m.group(0)[:80]}")
            n2 += 1
        for m in re.finditer(
            r"SUM\(\s*CASE\s+WHEN[^)]*THEN\s+1\s+ELSE\s+0\s+END\s*\)", sql, re.I
        ):
            before = sql[max(0, m.start() - 12) : m.start()].upper()
            after = sql[m.end() : m.end() + 40].upper()
            if "CAST" not in before or "BIGINT" not in after:
                print(f"[hugeint]     {name}: {m.group(0)[:80]}")
                n3 += 1
    print(
        f"\n{n1} float-round candidates, {n2} float-rank sites, "
        f"{n3} uncast integer CASE sums"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
