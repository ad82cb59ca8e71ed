"""materialize.py (r16): the lineage-cut strategy switch keeps values
identical under every strategy, defaults to the r15 localCheckpoint
behavior, and the classification tool stays green (every site reviewed).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from opentimes_spark.materialize import mz_grid, mz_proxy

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _frame(spark):
    return spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(autouse=True)
def _clean_env():
    saved = {
        k: os.environ.pop(k, None)
        for k in ("SPARK_GRAFT_MATERIALIZE", "SPARK_GRAFT_MATERIALIZE_PROXY")
    }
    yield
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


def test_default_is_local_checkpoint(spark):
    df = _frame(spark)
    out = mz_grid(df)
    # localCheckpoint truncates lineage to an ExistingRDD scan
    assert "ExistingRDD" in out._jdf.queryExecution().executedPlan().toString()
    assert _rows(out) == _rows(df)


def test_off_is_identity(spark):
    os.environ["SPARK_GRAFT_MATERIALIZE"] = "off"
    df = _frame(spark)
    out = mz_proxy(df)
    assert out is df


def test_persist_keeps_lineage_and_values(spark):
    os.environ["SPARK_GRAFT_MATERIALIZE"] = "persist"
    df = _frame(spark)
    out = mz_grid(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemory" in plan  # cached, lineage kept (recomputable)
    assert _rows(out) == _rows(df)
    out.unpersist()


def test_proxy_override_splits_classes(spark):
    os.environ["SPARK_GRAFT_MATERIALIZE_PROXY"] = "off"
    df = _frame(spark)
    assert mz_proxy(df) is df  # proxy: off
    out = mz_grid(df)  # grid: still the local default
    assert out is not df
    assert _rows(out) == _rows(df)


def test_invalid_strategy_raises(spark):
    os.environ["SPARK_GRAFT_MATERIALIZE"] = "bogus"
    with pytest.raises(ValueError, match="bogus"):
        mz_grid(_frame(spark))


def test_strategies_agree_on_values(spark):
    base = None
    for strat in ("local", "persist", "off"):
        os.environ["SPARK_GRAFT_MATERIALIZE"] = strat
        rows = _rows(
            mz_proxy(_frame(spark)).groupBy("k").agg(F.sum("v").alias("s"))
        )
        if base is None:
            base = rows
        assert rows == base, strat
    spark.catalog.clearCache()


def test_classification_tool_green():
    """Every materialization site is classified and every
    heuristic-vs-committed mismatch has a recorded review."""
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "classify_materialize.py")],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stdout[-2000:]
    assert "0 suspect" in r.stdout


def test_bm25_scores_lazy_opt_out(spark):
    """materialize=False keeps the helper lazy: constructing the frame
    must not execute a Spark job (no ExistingRDD in the plan)."""
    from opentimes_spark.functions.text import bm25_scores

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lazy = bm25_scores(docs, ["beta"], materialize=False)
    # the tf projection still hangs off the parquet scan — no job ran
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in plan and "ExistingRDD" not in plan
    eager = bm25_scores(docs, ["beta"])  # default materializes
    assert _rows(lazy) == _rows(eager)
