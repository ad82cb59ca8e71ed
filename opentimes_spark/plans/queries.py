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


# ---------------------------------------------------------------------------
# Window functions / ordered computation (SURVEY.md §2.5)
# ---------------------------------------------------------------------------


@query(
    "window_rank",
    """
    SELECT nation, c_custkey, ROUND(c_acctbal, 2) AS acctbal, rnk
    FROM (
        SELECT n.n_name AS nation, c.c_custkey, c.c_acctbal,
               ROW_NUMBER() OVER (
                   PARTITION BY n.n_name
                   ORDER BY c.c_acctbal DESC, c.c_custkey
               ) AS rnk
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    WHERE rnk <= 3
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ext row_number window, top-3 per group (SURVEY.md §2.5 Ext);
    tie-break by key for determinism."""
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("nation").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), "c_custkey", "c_acctbal")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("nation", "c_custkey", F.round("c_acctbal", 2).alias("acctbal"), "rnk")
    )


@query(
    "window_lag_lead",
    """
    SELECT event_id, user_id,
           ROUND(value, 4) AS value,
           ROUND(LAG(value)  OVER w, 4) AS prev_value,
           ROUND(LEAD(value) OVER w, 4) AS next_value
    FROM events
    WHERE user_id <= 50
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ext lag/lead over per-user event sequences (SURVEY.md §2.5 Ext)."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").filter(F.col("user_id") <= 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round("value", 4).alias("value"),
        F.round(F.lag("value").over(w), 4).alias("prev_value"),
        F.round(F.lead("value").over(w), 4).alias("next_value"),
    )


@query(
    "window_moving_sum",
    """
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), 4) AS moving_sum_3,
           ROUND(SUM(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 4) AS running_sum
    FROM events
    WHERE user_id <= 50
    """,
)
def window_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ext frame-spec windows: 3-row moving sum + running sum
    (SURVEY.md §2.5 Ext rowsBetween)."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").filter(F.col("user_id") <= 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w.rowsBetween(-2, 0)), 4).alias("moving_sum_3"),
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4).alias(
            "running_sum"
        ),
    )


@query(
    "window_ntile",
    """
    SELECT o_orderkey,
           NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS price_quartile
    FROM orders
    WHERE o_orderstatus = 'O'
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ext ntile — the reference's chunk-splitting shape (W1) expressed as
    a built-in window (utils/utils.py:55-138 analogue)."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return o.select("o_orderkey", F.ntile(4).over(w).alias("price_quartile"))


@query(
    "chunk_ranges",
    """
    WITH numbered AS (
        SELECT c_custkey,
               ROW_NUMBER() OVER (ORDER BY c_custkey) - 1 AS rn,
               COUNT(*) OVER () AS n
        FROM customer
    ),
    sized AS (
        SELECT c_custkey, rn, n,
               GREATEST(100, n // 8) AS chunk_size
        FROM numbered
    )
    SELECT c_custkey,
           CAST(LEAST(rn // chunk_size, GREATEST(n // chunk_size, 1) - 1) AS INT)
               AS chunk_idx,
           LPAD(CAST(LEAST(rn // chunk_size, GREATEST(n // chunk_size, 1) - 1)
                     * chunk_size AS VARCHAR), 8, '0')
           || '-' ||
           LPAD(CAST(CASE WHEN LEAST(rn // chunk_size, GREATEST(n // chunk_size, 1) - 1)
                               = GREATEST(n // chunk_size, 1) - 1
                          THEN n
                          ELSE (LEAST(rn // chunk_size, GREATEST(n // chunk_size, 1) - 1) + 1)
                               * chunk_size
                     END AS VARCHAR), 8, '0') AS chunk_label
    FROM sized
    """,
)
def chunk_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 row-range chunking with zero-padded labels (reference
    split_range/split_file_to_str, utils/utils.py:55-138): ≤8 chunks of
    ≥100 rows, remainder folded into the last chunk."""
    from opentimes_spark.operators.chunking import with_chunk_id

    c = _t(spark, sf_dir, "customer").select("c_custkey")
    return with_chunk_id(
        c, order_col="c_custkey", n_chunks=8, min_chunk_size=100
    ).select("c_custkey", "chunk_idx", "chunk_label")


# ---------------------------------------------------------------------------
# Scalar functions (SURVEY.md §2.8)
# ---------------------------------------------------------------------------


@query(
    "geoid_split",
    """
    WITH geoids AS (
        SELECT LPAD(CAST(c_custkey % 100 AS VARCHAR), 2, '0')
               || LPAD(CAST(c_custkey % 1000 AS VARCHAR), 3, '0')
               || LPAD(CAST(c_custkey * 37 % 1000000 AS VARCHAR), 6, '0')
               || LPAD(CAST(c_custkey * 7919 % 10000 AS VARCHAR), 4, '0')
               AS geoid
        FROM customer WHERE c_custkey <= 500
        UNION ALL
        SELECT LPAD(CAST(n_nationkey % 100 AS VARCHAR), 2, '0') AS geoid
        FROM nation
        UNION ALL
        SELECT LPAD(CAST(s_suppkey % 100 AS VARCHAR), 2, '0')
               || LPAD(CAST(s_suppkey * 13 % 1000 AS VARCHAR), 3, '0') AS geoid
        FROM supplier WHERE s_suppkey <= 50
    )
    SELECT geoid,
           CASE LENGTH(geoid) WHEN 2 THEN 'state' WHEN 5 THEN 'county'
                WHEN 11 THEN 'tract' WHEN 12 THEN 'block_group'
                WHEN 15 THEN 'block' END AS geography,
           CASE WHEN LENGTH(geoid) >= 2  THEN SUBSTRING(geoid, 1, 2) END AS state,
           CASE WHEN LENGTH(geoid) >= 5  THEN SUBSTRING(geoid, 3, 3) END AS county,
           CASE WHEN LENGTH(geoid) >= 11 THEN SUBSTRING(geoid, 6, 6) END AS tract,
           CASE WHEN LENGTH(geoid) >= 12 THEN SUBSTRING(geoid, 12, 1) END AS block_group,
           CASE WHEN LENGTH(geoid) >= 15 THEN SUBSTRING(geoid, 12, 4) END AS block
    FROM geoids
    """,
)
def geoid_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 GEOID substring decomposition dispatched on length (reference
    split_geoid, utils/census.py:110-156) over synthetic zero-padded
    GEOIDs of lengths 15, 2, and 5 built from corpus keys."""
    from opentimes_spark.functions.geoid import split_geoid

    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 500)
        .select(
            F.concat(
                F.lpad((F.col("c_custkey") % 100).cast("string"), 2, "0"),
                F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0"),
                F.lpad((F.col("c_custkey") * 37 % 1000000).cast("string"), 6, "0"),
                F.lpad((F.col("c_custkey") * 7919 % 10000).cast("string"), 4, "0"),
            ).alias("geoid")
        )
    )
    n = _t(spark, sf_dir, "nation").select(
        F.lpad((F.col("n_nationkey") % 100).cast("string"), 2, "0").alias("geoid")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= 50)
        .select(
            F.concat(
                F.lpad((F.col("s_suppkey") % 100).cast("string"), 2, "0"),
                F.lpad((F.col("s_suppkey") * 13 % 1000).cast("string"), 3, "0"),
            ).alias("geoid")
        )
    )
    geoids = c.unionByName(n).unionByName(s)
    parts = split_geoid(F.col("geoid"))
    return geoids.select("geoid", *[expr.alias(name) for name, expr in parts.items()])


@query(
    "scalar_strings",
    """
    SELECT p_partkey,
           UPPER(p_brand)                                   AS brand_upper,
           LOWER(p_type)                                    AS type_lower,
           SUBSTRING(p_name, 1, 10)                         AS name_prefix,
           LENGTH(p_name)                                   AS name_len,
           CONCAT(p_brand, ':', CAST(p_size AS VARCHAR))    AS brand_size,
           LPAD(CAST(p_partkey AS VARCHAR), 10, '0')        AS padded_key,
           REPLACE(p_type, ' ', '_')                        AS type_snake
    FROM part
    WHERE p_partkey <= 1000
    """,
)
def scalar_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F5/F6 string surface: case transforms, substring, concat,
    zero-pad (reference lpad: utils/utils.py:70-74), replace."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 1000)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded_key"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
    )


@query(
    "scalar_datetime",
    """
    SELECT o_orderkey,
           CAST(EXTRACT(year  FROM o_orderdate) AS INT)     AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INT)     AS order_month,
           CAST(EXTRACT(day   FROM o_orderdate) AS INT)     AS order_day,
           STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(FLOOR(EXTRACT(year FROM o_orderdate) / 10) * 10 AS INT) AS decade
    FROM orders
    WHERE o_orderkey <= 2000
    """,
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 date/time surface incl. the reference's decennial floor
    (create_blockloc.py:35 floor(year/10)*10); truncated month formatted
    to string on both sides for a stable hash."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        (F.floor(F.year("o_orderdate") / 10) * 10).cast("int").alias("decade"),
    )


@query(
    "scalar_conditional",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount >= 0.05 THEN 'high'
                WHEN l_discount >= 0.02 THEN 'mid'
                ELSE 'low' END                              AS discount_band,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none')      AS return_state,
           ROUND(GREATEST(l_extendedprice * (1 - l_discount), 900.0), 4) AS floor_price,
           CAST(l_quantity AS INT)                          AS qty_int
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9/F12 conditionals + coalesce/nullif + casts (reference coalesce
    of snapped coords, utils/times.py:680-681)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_discount") >= 0.05, "high")
        .when(F.col("l_discount") >= 0.02, "mid")
        .otherwise("low")
        .alias("discount_band"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias(
            "return_state"
        ),
        F.round(
            F.greatest(F.col("l_extendedprice") * (1 - F.col("l_discount")), F.lit(900.0)),
            4,
        ).alias("floor_price"),
        F.col("l_quantity").cast("int").alias("qty_int"),
    )


# ---------------------------------------------------------------------------
# Events: batch windowed aggregation (SURVEY.md §2.10 extension surface)
# ---------------------------------------------------------------------------


@query(
    "events_hourly",
    """
    SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type,
           COUNT(*)            AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over the events table — batch twin of
    the Structured Streaming recipe in streaming/events.py (same window
    semantics, F.window 1-hour tumble)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n_events",
            "n_users",
            "total_value",
        )
    )
