"""Known-value checks for the round-12 statistics batteries.

The DuckDB differential certifies Spark ⟷ SQL agreement; these pin a
handful of statistics to HAND-COMPUTED textbook values on corpora tiny
enough to verify on paper — the failure mode the oracle cannot see is a
formula misconception shared by both implementations."""

from __future__ import annotations

from datetime import datetime

import pytest

from opentimes_spark.plans.queries import QUERIES


def _write_orders(spark, path, month_counts):
    """orders rows with exact per-(priority, year-month) counts."""
    rows = []
    key = 1
    for (prio, yr, mo), c in month_counts.items():
        for _ in range(c):
            rows.append(
                (key, key, "F", 100.0, datetime(yr, mo, 15), prio)
            )
            key += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_lineitem(spark, path, qty_flags):
    rows = [
        (i + 1, 1, 1, 1, float(q), 10.0, 0.0, 0.0, f, "O",
         datetime(2024, 1, 2))
        for i, (q, f) in enumerate(qty_flags)
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")


def test_kendall_w_perfect_concordance(spark, tmp_path):
    """Two priorities ranking three months identically → W = 1 and
    Friedman chi2 = k(n−1)W = 4."""
    sf = str(tmp_path)
    _write_orders(spark, sf, {
        ("1-URGENT", 2024, 1): 1, ("1-URGENT", 2024, 2): 2,
        ("1-URGENT", 2024, 3): 3,
        ("2-HIGH", 2024, 1): 2, ("2-HIGH", 2024, 2): 4,
        ("2-HIGH", 2024, 3): 6,
    })
    row = QUERIES["orders_kendall_w_priority"](spark, sf).collect()[0]
    assert row["n_months"] == 3 and row["n_priorities"] == 2
    assert row["kendall_w"] == 1.0
    assert row["friedman_chi2"] == 4.0


def test_cochran_q_textbook(spark, tmp_path):
    """G = (3,3,1), L = (2,1,3,1), k = 3:
    Q = 2·(3·19 − 49)/(3·7 − 15) = 8/3."""
    sf = str(tmp_path)
    t0 = datetime(2024, 1, 1)
    pats = {1: ["t1", "t2"], 2: ["t1"], 3: ["t1", "t2", "t3"], 4: ["t2"]}
    rows = [
        (u * 10 + i, t0, u, t, 1.0, "{}")
        for u, ts in pats.items()
        for i, t in enumerate(ts)
    ]
    _write_events(spark, sf, rows)
    row = QUERIES["events_cochran_q"](spark, sf).collect()[0]
    assert row["n_users"] == 4 and row["n_items"] == 3
    assert row["cochran_q"] == pytest.approx(8.0 / 3.0, abs=1e-6)


def test_wasserstein_point_masses(spark, tmp_path):
    """A = {1, 1}, R = {3}: every unit of mass moves 2 → W₁ = 2."""
    sf = str(tmp_path)
    _write_lineitem(spark, sf, [(1, "A"), (1, "A"), (3, "R")])
    row = QUERIES["lineitem_wasserstein_flags"](spark, sf).collect()[0]
    assert row["wasserstein_1"] == 2.0


def test_gini_mean_difference_123(spark, tmp_path):
    """Values {1,2,3}: GMD = 2(1+2+1)/6 = 4/3, RMD = 2/3, Gini = 1/3."""
    sf = str(tmp_path)
    _write_lineitem(spark, sf, [(1, "N"), (2, "N"), (3, "N")])
    row = QUERIES["lineitem_gini_mean_difference"](spark, sf).collect()[0]
    assert row["gini_mean_diff"] == pytest.approx(4.0 / 3.0, abs=1e-6)
    assert row["relative_mean_diff"] == pytest.approx(2.0 / 3.0, abs=1e-6)
    assert row["gini_coefficient"] == pytest.approx(1.0 / 3.0, abs=1e-6)


def test_ansari_bradley_scores(spark, tmp_path):
    """A = {1,2,3}, R = {0,4}: N = 5, scores (1,2,3,2,1), AB(A) =
    2+3+2 = 7; with the tie case A = {1,1}, R = {1,2} the rank-1..3
    block averages to 5/3 so AB(A) = 10/3."""
    sf = str(tmp_path)
    _write_lineitem(
        spark, sf,
        [(1, "A"), (2, "A"), (3, "A"), (0, "R"), (4, "R")],
    )
    row = QUERIES["lineitem_ansari_bradley"](spark, sf).collect()[0]
    assert row["ab_stat"] == 7.0
    _write_lineitem(
        spark, sf, [(1, "A"), (1, "A"), (1, "R"), (2, "R")]
    )
    row = QUERIES["lineitem_ansari_bradley"](spark, sf).collect()[0]
    assert row["ab_stat"] == pytest.approx(10.0 / 3.0, abs=1e-4)


def test_ks_exact_disjoint_supports(spark, tmp_path):
    """Fully separated samples → KS distance exactly 1 (integer-exact,
    no float sup)."""
    sf = str(tmp_path)
    rows = [
        (1, "a", 1, 100.0, "BUILDING"),
        (2, "b", 1, 200.0, "BUILDING"),
        (3, "c", 1, 900.0, "MACHINERY"),
    ]
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{sf}/customer.parquet"
    )
    row = QUERIES["cust_ks_exact_segments"](spark, sf).collect()[0]
    assert row["ks_distance"] == 1.0


def test_durbin_watson_hand_computed(spark, tmp_path):
    """y = (1,3,2) over t = 1..3: scaled residuals (−3, 6, −3),
    DW = (9² + 9²)/(9 + 36 + 9)·(1/…) = 162/54 = 3."""
    sf = str(tmp_path)
    _write_orders(spark, sf, {
        ("1-URGENT", 2024, 1): 1,
        ("1-URGENT", 2024, 2): 3,
        ("1-URGENT", 2024, 3): 2,
    })
    row = QUERIES["orders_durbin_watson_monthly"](spark, sf).collect()[0]
    assert row["n_months"] == 3
    assert row["durbin_watson"] == 3.0


def test_theil_sen_single_month_zero_pairs(spark, tmp_path):
    """A <2-month grid has zero pairwise slopes: n_pairs must be 0
    (not NULL) — the round-12 regression fix."""
    sf = str(tmp_path)
    _write_orders(spark, sf, {("1-URGENT", 2024, 1): 3})
    row = QUERIES["orders_theil_sen_monthly"](spark, sf).collect()[0]
    assert row["n_months"] == 1
    assert row["n_pairs"] == 0
    assert row["ts_slope"] is None


def test_page_l_single_year_increasing(spark, tmp_path):
    """Strictly increasing months in one year: ranks equal month
    numbers → L = Σm² = 650, E[L] = 507, z = 143/√1859."""
    import math

    sf = str(tmp_path)
    _write_orders(
        spark, sf,
        {("1-URGENT", 2024, m): m for m in range(1, 13)},
    )
    row = QUERIES["orders_page_l_trend"](spark, sf).collect()[0]
    assert row["page_l"] == 650 and row["expected_l"] == 507
    assert row["z_score"] == pytest.approx(143.0 / math.sqrt(1859.0),
                                           abs=1e-6)


def test_kuiper_opposite_shifts_exceed_ks(spark, tmp_path):
    """A sits inside R's support: F_A leads at the bottom AND lags at
    the top, so V = D⁺ + D⁻ = 1 while KS alone would report 0.5."""
    sf = str(tmp_path)
    _write_lineitem(
        spark, sf,
        [(2, "A"), (2, "A"), (1, "R"), (3, "R")],
    )
    row = QUERIES["lineitem_kuiper_flags"](spark, sf).collect()[0]
    assert row["d_plus"] == 0.5 and row["d_minus"] == 0.5
    assert row["kuiper_v"] == 1.0
