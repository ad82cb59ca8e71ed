"""Known-value checks for the round-13 statistics battery G.

Same contract as test_stats_battery.py: the DuckDB differential
certifies Spark <-> SQL agreement; these pin each statistic to
hand-computed values on paper-verifiable corpora, catching the
formula misconception both implementations could share (the r12
lesson: runs-up-down's N-vs-N-1 moments were certified green for six
rounds).  The two normal-scores tests additionally recompute the full
pipeline in pure Python from the SAME Acklam inverse-CDF
(functions/normal.py:ppf_py) — the approximation is part of the
statistic's definition (disclosed), the pipeline around it is what
these tests pin.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from opentimes_spark.functions.normal import ppf_py
from opentimes_spark.plans.queries import QUERIES


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


def _write_orders(spark, path, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")


def _write_customer(spark, path, rows):
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/customer.parquet")


def _write_order_pair(spark, path, pairs):
    """One order per pair: o_totalprice = x dollars; one lineitem whose
    extendedprice = y dollars."""
    orows, lrows = [], []
    for i, (x, y) in enumerate(pairs, start=1):
        orows.append((i, i, "F", float(x), datetime(2024, 1, 15),
                      "1-URGENT"))
        lrows.append((i, 1, 1, 1, 1.0, float(y), 0.0, 0.0, "N", "O",
                      datetime(2024, 1, 2)))
    _write_orders(spark, path, orows)
    spark.createDataFrame(
        lrows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")


def test_siegel_tukey_no_ties(spark, tmp_path):
    """A={1,4}, R={2,3}: ST scores over sorted 1,2,3,4 are 1,4,3,2, so
    W_A = 1+2 = 3, E = 5, Var = (4/12)(30-25) = 5/3,
    z = -2/sqrt(5/3) = -1.549193."""
    sf = str(tmp_path)
    _write_lineitem(spark, sf, [(1, "A"), (4, "A"), (2, "R"), (3, "R")])
    row = QUERIES["lineitem_siegel_tukey"](spark, sf).collect()[0]
    assert row["n_flag_a"] == 2 and row["n_flag_r"] == 2
    assert row["st_stat"] == 3.0
    assert row["expected"] == 5.0
    assert row["z_score"] == pytest.approx(-1.549193, abs=1e-6)


def test_siegel_tukey_tie_block(spark, tmp_path):
    """A={2,2}, R={1,3}: the tied pair occupies positions 2-3 whose ST
    scores 4,3 average to 3.5 -> W_A = 7, E = 5,
    Var = (4/12)(29.5-25) = 1.5, z = 2/sqrt(1.5) = 1.632993."""
    sf = str(tmp_path)
    _write_lineitem(spark, sf, [(2, "A"), (2, "A"), (1, "R"), (3, "R")])
    row = QUERIES["lineitem_siegel_tukey"](spark, sf).collect()[0]
    assert row["st_stat"] == 7.0
    assert row["expected"] == 5.0
    assert row["z_score"] == pytest.approx(1.632993, abs=1e-6)


def test_moses_spans(spark, tmp_path):
    """A={1,4} spans the whole order (4); R={2,3} spans 2."""
    sf = str(tmp_path)
    _write_lineitem(spark, sf, [(1, "A"), (4, "A"), (2, "R"), (3, "R")])
    rows = {r["returnflag"]: r
            for r in QUERIES["lineitem_moses_spans"](spark, sf).collect()}
    assert rows["A"]["span"] == 4 and rows["R"]["span"] == 2
    assert rows["A"]["first_pos"] == 1 and rows["A"]["last_pos"] == 4


def test_quade_two_treatments(spark, tmp_path):
    """3 blocks (months), k=2; U<H in every block with block ranges
    1,2,4 -> Q ranks 1,2,3; S_U=-3, S_H=+3, A=7, B=6,
    F = (b-1)B/(A-B) = 12."""
    sf = str(tmp_path)
    rows = []
    key = 1
    vals = {(1, "1-URGENT"): 1.00, (1, "2-HIGH"): 2.00,
            (2, "1-URGENT"): 1.00, (2, "2-HIGH"): 3.00,
            (3, "1-URGENT"): 1.00, (3, "2-HIGH"): 5.00}
    for (mo, prio), price in vals.items():
        rows.append((key, key, "F", price, datetime(2024, mo, 15), prio))
        key += 1
    _write_orders(spark, sf, rows)
    out = {r["priority"]: r
           for r in QUERIES["orders_quade_priority"](spark, sf).collect()}
    assert out["1-URGENT"]["s_j"] == -3.0
    assert out["2-HIGH"]["s_j"] == 3.0
    assert out["2-HIGH"]["quade_f"] == pytest.approx(12.0, abs=1e-9)
    assert out["2-HIGH"]["n_blocks"] == 3


def test_gwet_scott_hand(spark, tmp_path):
    """5 orders, rater1=priority in top-2, rater2=status F:
    3x(1,1), 1x(1,0), 1x(0,0): po=0.8, pi_mean=0.7 ->
    Scott pe=0.58, pi=0.523810; AC1 pe=0.42, ac1=0.655172."""
    sf = str(tmp_path)
    rows = [(i + 1, i + 1, s, 10.0, datetime(2024, 1, 10), p)
            for i, (p, s) in enumerate(
                [("1-URGENT", "F")] * 3
                + [("1-URGENT", "O"), ("5-LOW", "O")])]
    _write_orders(spark, sf, rows)
    row = QUERIES["orders_gwet_scott_agreement"](spark, sf).collect()[0]
    assert row["n_orders"] == 5
    assert row["po"] == pytest.approx(0.8)
    assert row["scott_pi"] == pytest.approx(0.523810, abs=1e-6)
    assert row["gwet_ac1"] == pytest.approx(0.655172, abs=1e-6)


def test_icc_hand(spark, tmp_path):
    """Groups {1,2,3} and {5,7} (dollars): SSW=4, SSB=19.2, MSW=4/3,
    MSB=19.2, k0=2.4 -> ICC(1,1) = 17.8667/21.0667 = 0.848101."""
    sf = str(tmp_path)
    rows = [(1, "a", 1, 1.0, "B"), (2, "b", 1, 2.0, "B"),
            (3, "c", 1, 3.0, "B"), (4, "d", 2, 5.0, "B"),
            (5, "e", 2, 7.0, "B")]
    _write_customer(spark, sf, rows)
    row = QUERIES["cust_icc_nation"](spark, sf).collect()[0]
    assert row["n_groups"] == 2 and row["n_total"] == 5
    assert row["k0"] == pytest.approx(2.4, abs=1e-9)
    assert row["icc_1_1"] == pytest.approx(0.8481013, abs=1e-6)


def test_lin_ccc_perfect_linear(spark, tmp_path):
    """Pairs (1,1),(2,3),(3,5) dollars: y=2x-1 so r=1 but CCC penalizes
    the scale/location shift: CCC = 2*sxy/(sxx+syy+(mx-my)^2)
    = 0.615385, Cb = CCC/r = 0.615385."""
    sf = str(tmp_path)
    _write_order_pair(spark, sf, [(1.0, 1.0), (2.0, 3.0), (3.0, 5.0)])
    row = QUERIES["orders_lin_ccc"](spark, sf).collect()[0]
    assert row["n_pairs"] == 3
    assert row["pearson_r"] == pytest.approx(1.0, abs=1e-9)
    assert row["lin_ccc"] == pytest.approx(0.615385, abs=1e-6)


def test_bland_altman_hand(spark, tmp_path):
    """d = x-y = {0,-1,-2} dollars: mean_d=-1, sd=1 (sample),
    LoA = -1 +/- 1.96 -> [-2.96, 0.96], nothing outside."""
    sf = str(tmp_path)
    _write_order_pair(spark, sf, [(1.0, 1.0), (2.0, 3.0), (3.0, 5.0)])
    row = QUERIES["orders_bland_altman"](spark, sf).collect()[0]
    assert row["mean_diff"] == pytest.approx(-1.0)
    assert row["sd_diff"] == pytest.approx(1.0)
    assert row["loa_lo"] == pytest.approx(-2.96)
    assert row["loa_hi"] == pytest.approx(0.96)
    assert row["n_outside"] == 0


def test_conover_squared_ranks_hand(spark, tmp_path):
    """A={1,3} (|dev|=1,1), R={2,6} (|dev|=2,2): squared midranks
    T = 2*(1.5)^2 = 4.5, E = 14.5, Var = (4/12)(310.25-210.25) =
    100/3, z = -10/sqrt(100/3) = -1.732051."""
    sf = str(tmp_path)
    _write_lineitem(spark, sf, [(1, "A"), (3, "A"), (2, "R"), (6, "R")])
    row = QUERIES["lineitem_conover_squared_ranks"](spark, sf).collect()[0]
    assert row["t_stat"] == pytest.approx(4.5)
    assert row["expected"] == pytest.approx(14.5)
    assert row["z_score"] == pytest.approx(-1.732051, abs=1e-6)


def test_van_der_waerden_singletons(spark, tmp_path):
    """Three singleton groups: T = (N-1) * (sum_g S_g^2/n_g) / sum a^2
    collapses to exactly N-1 = 2 whatever the scores are."""
    sf = str(tmp_path)
    _write_lineitem(spark, sf, [(1, "A"), (2, "R"), (3, "N")])
    row = QUERIES["lineitem_van_der_waerden"](spark, sf).collect()[0]
    assert row["n_groups"] == 3
    assert row["vdw_stat"] == pytest.approx(2.0, abs=1e-9)


def test_van_der_waerden_pipeline_vs_python(spark, tmp_path):
    """A={1,3}, R={2,4}: recompute the full statistic in pure Python
    from the same Acklam ppf (midranks r/(N+1), quantized 1e9)."""
    sf = str(tmp_path)
    _write_lineitem(spark, sf, [(1, "A"), (3, "A"), (2, "R"), (4, "R")])
    n = 4
    scores = {q: round(ppf_py(r / (n + 1)) * 1e9)
              for q, r in [(1, 1), (2, 2), (3, 3), (4, 4)]}
    sa = scores[1] + scores[3]
    sr = scores[2] + scores[4]
    s2 = sum(v * v for v in scores.values())
    expected = (n - 1) * ((sa * sa / 2 + sr * sr / 2) / s2)
    row = QUERIES["lineitem_van_der_waerden"](spark, sf).collect()[0]
    assert row["vdw_stat"] == pytest.approx(expected, abs=1e-6)


def test_fligner_killeen_pipeline_vs_python(spark, tmp_path):
    """A={1,5} (devs 2,2 about median 1... lower median of {1,5} is 1,
    devs {0,4}), R={2,4} (median 2, devs {0,2}): combined |dev| grid
    {0,0,2,4} -> midranks {1.5,1.5,3,4}; scores a=ppf(.5+r/(2(N+1)));
    X^2 = sum n_g (Abar_g - abar)^2 / V with V the sample variance."""
    sf = str(tmp_path)
    _write_lineitem(spark, sf, [(1, "A"), (5, "A"), (2, "R"), (4, "R")])
    n = 4
    # groups: A devs {0,4}, R devs {0,2}; combined sorted: 0,0,2,4
    ranks = {("A", 0): 1.5, ("R", 0): 1.5, ("R", 2): 3.0, ("A", 4): 4.0}
    q = {k: round(ppf_py(0.5 + r / (2 * (n + 1))) * 1e9)
         for k, r in ranks.items()}
    sa = q[("A", 0)] + q[("A", 4)]
    sr = q[("R", 0)] + q[("R", 2)]
    s_all = sa + sr
    s2_all = sum(v * v for v in q.values())
    abar = s_all / n
    num = 2 * (sa / 2 - abar) ** 2 + 2 * (sr / 2 - abar) ** 2
    var = (s2_all - s_all * s_all / n) / (n - 1)
    expected = num / var
    row = QUERIES["lineitem_fligner_killeen"](spark, sf).collect()[0]
    assert row["n_groups"] == 2
    assert row["fk_stat"] == pytest.approx(expected, abs=1e-6)


def test_klotz_pipeline_vs_python(spark, tmp_path):
    """A={1,4}, R={2,3}: Klotz scores are squared VdW scores quantized
    at 1e9 AFTER squaring; recompute T, E, z from the same Acklam ppf
    in pure Python."""
    sf = str(tmp_path)
    _write_lineitem(spark, sf, [(1, "A"), (4, "A"), (2, "R"), (3, "R")])
    n = 4
    kq = {r: round(ppf_py(r / (n + 1)) ** 2 * 1e9) for r in (1, 2, 3, 4)}
    t = kq[1] + kq[4]          # group A holds ranks 1 and 4
    s1 = sum(kq.values())
    s2 = sum(v * v for v in kq.values())
    e = 2 * (s1 / n)
    var = (2 * 2 / (n * (n - 1.0))) * (s2 - s1 * s1 / n)
    row = QUERIES["lineitem_klotz_dispersion"](spark, sf).collect()[0]
    assert row["klotz_t"] == pytest.approx(t / 1e9, abs=1e-6)
    assert row["expected"] == pytest.approx(e / 1e9, abs=1e-6)
    assert row["z_score"] == pytest.approx(
        (t - e) / var ** 0.5, abs=1e-6)
