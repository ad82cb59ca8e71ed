"""Driver-contract guards: the registry invariants the correctness gate
depends on (names, ordering, column-alias parity conventions)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry


def test_registry_shapes():
    qs, osql = entry.queries(), entry.oracle_sql()
    assert len(qs) >= 145
    # every registered query now carries a DuckDB oracle (the former
    # rows-only trio gained real oracles in round 5)
    assert set(osql) == set(qs)
    # both dicts enumerate in the same order (the driver may zip them)
    assert list(qs) == list(osql)


def test_uncertified_queries_lead_the_gate_window():
    """The driver records the FIRST 50 entries; every query without a
    prior hash-green CORRECTNESS row must sit inside that window.
    Rows-only records (err=no_oracle) and hash_match=false rows do NOT
    count as certified — those names must re-enter the window."""
    import glob

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    certified = set()
    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        with open(p, encoding="utf-8") as fh:
            rows = json.load(fh)
        certified |= {
            n for n, v in rows.items() if v.get("hash_match") is True
        }
    names = list(entry.queries())
    stragglers = [n for n in names[50:] if n not in certified]
    assert stragglers == [], f"uncertified beyond the gate window: {stragglers}"


def test_every_query_is_callable_with_the_driver_signature():
    import inspect

    for name, fn in entry.queries().items():
        params = [
            p
            for p in inspect.signature(fn).parameters.values()
            if p.default is inspect.Parameter.empty
        ]
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"


def test_gopher_pass_matches_registered_flags_query(spark):
    """gopher_pass (the curation-job verdict) and docs_gopher_flags
    (the certified per-rule query) duplicate the rule logic by design;
    this pins them together so neither drifts."""
    from pyspark.sql import functions as F

    from opentimes_spark.functions.text import gopher_pass
    from opentimes_spark.plans.queries import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    flags = {
        r["doc_id"]: r["passes_gopher"]
        for r in QUERIES["docs_gopher_flags"](spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    verdicts = {
        r["doc_id"]: int(r["ok"])
        for r in docs.select(
            "doc_id", gopher_pass(F.col("text")).alias("ok")
        ).collect()
        if r["doc_id"] in flags
    }
    assert verdicts == flags and len(flags) > 0
