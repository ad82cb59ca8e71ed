"""Query registry: every operator from SURVEY.md §2 exposed as a
(spark, sf_dir) -> DataFrame callable plus an equivalent ANSI-SQL oracle
string for the DuckDB differential gate.

Conventions (driver contract):
- every computed column is aliased identically in Spark and SQL;
- every double-valued output is ``round``-ed the same on both sides so
  the order-insensitive value hash is FP-stable;
- ordering never matters (driver sorts), but ties in top-k queries are
  broken deterministically by a key column.

Each query's docstring cites the reference operator row (SURVEY.md §2)
it demonstrates.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opentimes_spark.io.read import read_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, sql: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship: pricing summary (TPC-H Q1 shape) — scan + filter + groupBy/agg
# (SURVEY.md §2.4 Ext: partial+final agg is Catalyst-automatic; the filter
# and the 7-column projection push into the parquet scan.)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    """
    SELECT
        l_returnflag,
        l_linestatus,
        ROUND(SUM(l_quantity), 2)                                       AS sum_qty,
        ROUND(SUM(l_extendedprice), 2)                                  AS sum_base_price,
        ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
        ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        ROUND(AVG(l_quantity), 4)                                       AS avg_qty,
        ROUND(AVG(l_extendedprice), 4)                                  AS avg_price,
        ROUND(AVG(l_discount), 6)                                       AS avg_disc,
        COUNT(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
