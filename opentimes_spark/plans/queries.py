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


# ---------------------------------------------------------------------------
# Projections / filters / predicates (SURVEY.md §2.2)
# ---------------------------------------------------------------------------


@query(
    "filter_prefix",
    """
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS total_price
    FROM orders
    WHERE o_orderpriority LIKE '1-%' AND o_orderstatus = 'F'
    """,
)
def filter_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 prefix predicate (reference: origin_id LIKE '17031%',
    opentimes README.md:97,177) + P2 equality filter."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderpriority").startswith("1-"))
        .filter(F.col("o_orderstatus") == "F")
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("total_price"),
        )
    )


@query(
    "filter_isin",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE') AND c_nationkey IN (1, 5, 9)
    """,
)
def filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 membership filter (reference: create_destpoint.py:72-75)."""
    c = _t(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
        & F.col("c_nationkey").isin(1, 5, 9)
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "filter_range_date",
    """
    SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1995-04-01'
      AND l_quantity BETWEEN 10 AND 20
    """,
)
def filter_range_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 range predicates → parquet row-group stat skipping (reference
    zone-map pruning: site/assets/js/map.js:702-724)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-04-01").cast("timestamp"))
        & F.col("l_quantity").between(10, 20)
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price"),
    )


@query(
    "distinct_pairs",
    """
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 deduplicate (reference: coordinate-set dedup,
    utils/times.py:438-442)."""
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# Joins (SURVEY.md §2.3)
# ---------------------------------------------------------------------------


@query(
    "join_left_agg",
    """
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey)              AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS total_spend
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 left equi-join (reference: blockloc ← population,
    create_blockloc.py:85-86) + A2 count aggregates."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0)), 2).alias("total_spend"),
        )
    )


@query(
    "join_inner_topk",
    """
    SELECT o.o_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def join_inner_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 inner equi-joins + O-Ext top-k (TPC-H Q3 shape). The customer
    side is dimension-sized → Catalyst broadcasts it; revenue ties broken
    by o_orderkey for determinism."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        F.broadcast(c)
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "join_region_revenue",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way dimension join (TPC-H Q5 shape): region/nation/customer
    broadcast up the chain; only orders⋈lineitem shuffles — at 100 TB that
    one shuffle is on the co-partitionable orderkey."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dims = F.broadcast(
        r.join(n, n.n_regionkey == r.r_regionkey).select(
            "n_nationkey", F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
    )
    cust = F.broadcast(c.join(dims, c.c_nationkey == dims.n_nationkey).select("c_custkey", "region", "nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .groupBy("region", "nation")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "join_semi",
    """
    SELECT s_suppkey, s_name, ROUND(s_acctbal, 2) AS acctbal
    FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_quantity > 45)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 semi-join (reference: keep geographies whose centroid matched,
    create_destpoint.py:72-75)."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal")
    )


@query(
    "join_anti",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    )
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 anti-join — the reference's missing-pairs complement semantics
    (expected minus routed, utils/utils.py:9-28, calculate_times.py:71-76).
    Filtered right side keeps the complement non-empty at every sf."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_cross",
    """
    SELECT r1.r_name AS region_a, r2.r_name AS region_b
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey < r2.r_regionkey
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 cross join — the OD-matrix core (reference many_to_many,
    utils/times.py:588-642); here the unordered-pair variant."""
    r1 = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k1"), F.col("r_name").alias("region_a")
    )
    r2 = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k2"), F.col("r_name").alias("region_b")
    )
    return r1.crossJoin(r2).filter(F.col("k1") < F.col("k2")).select("region_a", "region_b")


@query(
    "join_nonequi_range",
    """
    SELECT p.p_partkey, p.p_brand, COUNT(*) AS n_lines
    FROM part p
    JOIN lineitem l
      ON l.l_partkey = p.p_partkey
     AND l.l_quantity BETWEEN p.p_size - 5 AND p.p_size + 5
    GROUP BY p.p_partkey, p.p_brand
    """,
)
def join_nonequi_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ext range/theta join (SURVEY.md §2.3 Ext): equi key + range band.
    The equi component keeps it a hash join (band is a post-filter), so it
    scales; a pure theta join would be a broadcast nested loop."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(
            F.broadcast(p),
            (li.l_partkey == p.p_partkey)
            & li.l_quantity.between(p.p_size - 5, p.p_size + 5),
        )
        .groupBy("p_partkey", "p_brand")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


# ---------------------------------------------------------------------------
# Aggregations (SURVEY.md §2.4)
# ---------------------------------------------------------------------------


@query(
    "agg_weighted_mean",
    """
    SELECT l_returnflag,
           ROUND(CASE WHEN SUM(l_quantity) = 0 THEN AVG(l_extendedprice)
                      ELSE SUM(l_extendedprice * l_quantity) / SUM(l_quantity)
                 END, 4) AS weighted_avg_price,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 grouped weighted mean with zero-weight fallback (reference
    calculate_weighted_mean, utils/census.py:9-47) — pure SQL, no UDF."""
    from opentimes_spark.operators.weighted_mean import grouped_weighted_mean

    li = _t(spark, sf_dir, "lineitem")
    return grouped_weighted_mean(
        li,
        group_cols=["l_returnflag"],
        value_col="l_extendedprice",
        weight_col="l_quantity",
        out_col="weighted_avg_price",
        round_to=4,
    ).withColumn("n", F.col("n"))


@query(
    "agg_rollup",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           ROUND(SUM(c.c_acctbal), 2) AS total_acctbal,
           COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 hierarchical totals (reference: per-directory rollup of the
    bucket tree, utils/cloudflare.py:22-33,96-114) via native rollup."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.select(F.col("r_name").alias("region"), F.col("n_name").alias("nation"), "c_acctbal")
        .rollup("region", "nation")
        .agg(
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@query(
    "agg_stats",
    """
    SELECT o_orderpriority,
           COUNT(*)                      AS n_orders,
           COUNT(DISTINCT o_custkey)     AS n_customers,
           ROUND(MIN(o_totalprice), 2)   AS min_price,
           ROUND(MAX(o_totalprice), 2)   AS max_price,
           ROUND(AVG(o_totalprice), 4)   AS avg_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A6 count + min/max statistics (reference: metadata counts,
    calculate_times.py:107-133; zone-map min/max)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY.md §2.7)
# ---------------------------------------------------------------------------


@query(
    "set_union_distinct",
    """
    SELECT n_nationkey AS nationkey FROM (
        SELECT c_nationkey AS n_nationkey FROM customer
        UNION
        SELECT s_nationkey AS n_nationkey FROM supplier
    )
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 union + distinct of match sets (reference:
    create_destpoint.py:72-75)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "set_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-Ext intersect."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_suppkey <= 20
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 difference — the missing-pairs complement as a set op
    (reference: calculate_times.py:71-76). EXCEPT is distinct-set
    semantics: subtract() after distinct() on both sides."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= 20)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.distinct().subtract(s.distinct())
