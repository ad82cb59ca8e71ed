"""Known-value checks for the round-14 statistics battery H.

Same contract as test_stats_battery.py / _g.py: the DuckDB differential
certifies Spark <-> SQL agreement; these pin each statistic to
hand-computed (or independently re-derived Python) values on
paper-verifiable corpora, catching the formula misconception both
implementations could share (the r12 lesson: runs-up-down's N-vs-N-1
moments were certified green for six rounds).  Tests are written FIRST,
before the queries they pin (the r13 discipline).
"""

from __future__ import annotations

import math
from datetime import datetime

import pytest

from opentimes_spark.plans.queries import QUERIES


def _write_lineitem(spark, path, rows):
    """rows: (quantity, discount, returnflag) triples."""
    data = [
        (i + 1, 1, 1, 1, float(q), 10.0, float(d), 0.0, f, "O",
         datetime(2024, 1, 2))
        for i, (q, d, f) in enumerate(rows)
    ]
    spark.createDataFrame(
        data,
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


# --- 1. Tukey HSD pairwise contrasts --------------------------------------


def test_tukey_hsd_three_groups(spark, tmp_path):
    """Groups 1-URGENT={1,2}, 2-HIGH={3,5}, 3-MEDIUM={9,11} dollars:
    means 1.5/4/10, SSW = 0.5+2+2 = 4.5, df = 3, MSW = 1.5;
    q_ij = |m_i-m_j| / sqrt(MSW/2 * (1/2+1/2)) = diff/0.8660254.
    q(3, inf) cutpoint = 3.314: only the 1-2 pair is below it."""
    sf = str(tmp_path)
    rows, key = [], 1
    for prio, vals in [("1-URGENT", [1, 2]), ("2-HIGH", [3, 5]),
                       ("3-MEDIUM", [9, 11])]:
        for v in vals:
            rows.append((key, key, "F", float(v), datetime(2024, 1, 5), prio))
            key += 1
    _write_orders(spark, sf, rows)
    out = {(r["prio_a"], r["prio_b"]): r
           for r in QUERIES["orders_tukey_hsd_priority"](spark, sf).collect()}
    assert len(out) == 3
    r12 = out[("1-URGENT", "2-HIGH")]
    assert r12["mean_diff"] == pytest.approx(2.5, abs=1e-9)
    assert r12["q_stat"] == pytest.approx(2.886751, abs=1e-6)
    assert r12["q_crit"] == pytest.approx(3.314, abs=1e-9)
    assert bool(r12["significant"]) is False
    r13 = out[("1-URGENT", "3-MEDIUM")]
    assert r13["q_stat"] == pytest.approx(9.814955, abs=1e-6)
    assert bool(r13["significant"]) is True
    r23 = out[("2-HIGH", "3-MEDIUM")]
    assert r23["q_stat"] == pytest.approx(6.928203, abs=1e-6)
    assert bool(r23["significant"]) is True


# --- 2. Jonckheere pairwise follow-up contrasts ----------------------------


def test_jonckheere_pairwise_no_ties(spark, tmp_path):
    """A={1,2}, R={3,4}: U(A,R) = 4 (every a < r), E = 2,
    Var = n1*n2*(N+1)/12 = 5/3, z = 2/sqrt(5/3) = 1.549193."""
    sf = str(tmp_path)
    _write_lineitem(spark, sf, [(1, 0.0, "A"), (2, 0.0, "A"),
                                (3, 0.0, "R"), (4, 0.0, "R")])
    rows = {(r["flag_lo"], r["flag_hi"]): r
            for r in QUERIES["lineitem_jonckheere_pairwise"](
                spark, sf).collect()}
    r = rows[("A", "R")]
    assert r["u_stat"] == pytest.approx(4.0, abs=1e-9)
    assert r["z_score"] == pytest.approx(1.549193, abs=1e-6)


def test_jonckheere_pairwise_with_tie(spark, tmp_path):
    """A={1,2}, N={2,3}: U = 3 + 0.5 = 3.5 (one cross-group tie at 2);
    tie-corrected Var = (4/12)*[5 - 6/12] = 1.5,
    z = 1.5/sqrt(1.5) = 1.224745."""
    sf = str(tmp_path)
    _write_lineitem(spark, sf, [(1, 0.0, "A"), (2, 0.0, "A"),
                                (2, 0.0, "N"), (3, 0.0, "N")])
    rows = {(r["flag_lo"], r["flag_hi"]): r
            for r in QUERIES["lineitem_jonckheere_pairwise"](
                spark, sf).collect()}
    r = rows[("A", "N")]
    assert r["u_stat"] == pytest.approx(3.5, abs=1e-9)
    assert r["z_score"] == pytest.approx(1.224745, abs=1e-6)


# --- 3. Cucconi location-scale test ----------------------------------------


def test_cucconi_hand_no_ties(spark, tmp_path):
    """A={1,3}, R={2,4}: ranks of R in combined = {2,4},
    U = (6*20 - 2*5*9)/sqrt(2*2*5*9*43/5) = 30/sqrt(1548) = 0.762493,
    V (contra-ranks {3,1}) = -0.762493,
    rho = 2*(16-4)/(9*43) - 1 = -0.937984,
    C = (U^2+V^2-2*rho*U*V) / (2*(1-rho^2)) = 0.300107."""
    sf = str(tmp_path)
    _write_lineitem(spark, sf, [(1, 0.0, "A"), (3, 0.0, "A"),
                                (2, 0.0, "R"), (4, 0.0, "R")])
    r = QUERIES["lineitem_cucconi_flags"](spark, sf).collect()[0]
    assert r["n_flag_a"] == 2 and r["n_flag_r"] == 2
    assert r["u_stat"] == pytest.approx(0.762493, abs=1e-6)
    assert r["v_stat"] == pytest.approx(-0.762493, abs=1e-6)
    assert r["rho"] == pytest.approx(-0.937984, abs=1e-6)
    u, v, rho = 30 / math.sqrt(1548), -30 / math.sqrt(1548), 24 / 387 - 1
    c = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
    assert r["c_stat"] == pytest.approx(round(c, 6), abs=1e-6)


def test_cucconi_pipeline_vs_python(spark, tmp_path):
    """Midrank-tie case replayed by an independent per-observation
    Python loop over the textbook definition (ranks of sample R in the
    combined midranked sequence)."""
    sf = str(tmp_path)
    data = [(1, "A"), (2, "A"), (2, "R"), (3, "R"), (3, "R"), (5, "A")]
    _write_lineitem(spark, sf, [(q, 0.0, f) for q, f in data])
    vals = sorted(q for q, _ in data)
    # midrank of each value in the combined sample
    mid = {}
    for v in set(vals):
        pos = [i + 1 for i, x in enumerate(vals) if x == v]
        mid[v] = sum(pos) / len(pos)
    nn = len(data)
    ranks_r = [mid[q] for q, f in data if f == "R"]
    m, n = len(ranks_r), nn - len(ranks_r)
    s2 = sum(r * r for r in ranks_r)
    s2c = sum((nn + 1 - r) ** 2 for r in ranks_r)
    den = math.sqrt(m * n * (nn + 1) * (2 * nn + 1) * (8 * nn + 11) / 5.0)
    u = (6 * s2 - m * (nn + 1) * (2 * nn + 1)) / den
    v = (6 * s2c - m * (nn + 1) * (2 * nn + 1)) / den
    rho = 2.0 * (nn * nn - 4) / ((2 * nn + 1) * (8 * nn + 11)) - 1
    c = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
    r = QUERIES["lineitem_cucconi_flags"](spark, sf).collect()[0]
    assert r["u_stat"] == pytest.approx(u, abs=1e-6)
    assert r["v_stat"] == pytest.approx(v, abs=1e-6)
    assert r["c_stat"] == pytest.approx(c, abs=1e-6)


# --- 4. Cuzick trend test ---------------------------------------------------


def test_cuzick_trend_hand(spark, tmp_path):
    """Groups A={1}, N={2}, R={3} with scores 1,2,3: ranks 1,2,3,
    T = 1+4+9 = 14, L1 = 6, L2 = 14, E = 2*6 = 12,
    Var = (N+1)/12 * (N*L2 - L1^2) = (4/12)*(42-36) = 2,
    z = 2/sqrt(2) = 1.414214."""
    sf = str(tmp_path)
    _write_lineitem(spark, sf, [(1, 0.0, "A"), (2, 0.0, "N"),
                                (3, 0.0, "R")])
    r = QUERIES["lineitem_cuzick_trend"](spark, sf).collect()[0]
    assert r["t_stat"] == pytest.approx(14.0, abs=1e-9)
    assert r["expected"] == pytest.approx(12.0, abs=1e-9)
    assert r["z_score"] == pytest.approx(1.414214, abs=1e-6)


def test_cuzick_trend_tie_correction(spark, tmp_path):
    """A={1,2}, N={2}, R={3}: midranks 1, 2.5, 2.5, 4;
    T = 1*(1+2.5) + 2*2.5 + 3*4 = 20.5; L1 = 1+1+2+3 = 7,
    L2 = 1+1+4+9 = 15; E = (5/2)*7 = 17.5;
    tie factor = 1 - (8-2)/(64-4) = 0.9;
    Var = (5/12)*(4*15-49)*0.9 = 4.125; z = 3/sqrt(4.125) = 1.477098."""
    sf = str(tmp_path)
    _write_lineitem(spark, sf, [(1, 0.0, "A"), (2, 0.0, "A"),
                                (2, 0.0, "N"), (3, 0.0, "R")])
    r = QUERIES["lineitem_cuzick_trend"](spark, sf).collect()[0]
    assert r["t_stat"] == pytest.approx(20.5, abs=1e-9)
    assert r["expected"] == pytest.approx(17.5, abs=1e-9)
    assert r["z_score"] == pytest.approx(1.477098, abs=1e-6)


# --- 5. Goodman-Kruskal lambda + Theil's U ----------------------------------


def test_goodman_kruskal_perfect(spark, tmp_path):
    """Diagonal 2x2 grid (10 URGENT/F + 10 LOW/O): lambda = 1 both
    directions, uncertainty coefficient = 1."""
    sf = str(tmp_path)
    rows = [(i + 1, i + 1, "F", 10.0, datetime(2024, 1, 5), "1-URGENT")
            for i in range(10)]
    rows += [(i + 11, i + 11, "O", 10.0, datetime(2024, 1, 5), "5-LOW")
             for i in range(10)]
    _write_orders(spark, sf, rows)
    r = QUERIES["orders_goodman_kruskal_lambda"](spark, sf).collect()[0]
    assert r["lambda_status_given_prio"] == pytest.approx(1.0, abs=1e-9)
    assert r["lambda_prio_given_status"] == pytest.approx(1.0, abs=1e-9)
    assert r["lambda_symmetric"] == pytest.approx(1.0, abs=1e-9)
    assert r["uncertainty_status_given_prio"] == pytest.approx(1.0, abs=1e-9)


def test_goodman_kruskal_independent(spark, tmp_path):
    """Uniform 2x2 grid: lambda = 0, U = 0."""
    sf = str(tmp_path)
    rows, key = [], 1
    for prio in ("1-URGENT", "5-LOW"):
        for status in ("F", "O"):
            for _ in range(5):
                rows.append((key, key, status, 10.0,
                             datetime(2024, 1, 5), prio))
                key += 1
    _write_orders(spark, sf, rows)
    r = QUERIES["orders_goodman_kruskal_lambda"](spark, sf).collect()[0]
    assert r["lambda_status_given_prio"] == pytest.approx(0.0, abs=1e-9)
    assert r["lambda_symmetric"] == pytest.approx(0.0, abs=1e-9)
    assert r["uncertainty_status_given_prio"] == pytest.approx(0.0, abs=1e-9)


def test_goodman_kruskal_asymmetric_hand(spark, tmp_path):
    """Grid [[6,2],[3,9]]: n=20, col margins {9,11}.
    lambda_c|r = (6+9-11)/(20-11) = 4/9; row margins {8,12}:
    lambda_r|c = (6+9-12)/(20-12) = 3/8."""
    sf = str(tmp_path)
    rows, key = [], 1
    for prio, status, k in [("1-URGENT", "F", 6), ("1-URGENT", "O", 2),
                            ("5-LOW", "F", 3), ("5-LOW", "O", 9)]:
        for _ in range(k):
            rows.append((key, key, status, 10.0, datetime(2024, 1, 5), prio))
            key += 1
    _write_orders(spark, sf, rows)
    r = QUERIES["orders_goodman_kruskal_lambda"](spark, sf).collect()[0]
    assert r["lambda_status_given_prio"] == pytest.approx(4 / 9, abs=1e-6)
    assert r["lambda_prio_given_status"] == pytest.approx(3 / 8, abs=1e-6)


# --- 6. D'Agostino-Pearson K^2 ---------------------------------------------


def _dagostino_python(xs):
    """Independent re-derivation of D'Agostino (1970) skewness z,
    Anscombe-Glynn (1983) kurtosis z, and the K^2 omnibus — transcribed
    from the published formulas, NOT from the query code."""
    n = len(xs)
    mean = sum(xs) / n
    m2 = sum((x - mean) ** 2 for x in xs) / n
    m3 = sum((x - mean) ** 3 for x in xs) / n
    m4 = sum((x - mean) ** 4 for x in xs) / n
    g1 = m3 / m2 ** 1.5
    g2 = m4 / m2 ** 2 - 3.0
    # skewness (D'Agostino 1970)
    y = g1 * math.sqrt((n + 1) * (n + 3) / (6.0 * (n - 2)))
    beta2 = (3.0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3)
             / ((n - 2) * (n + 5) * (n + 7) * (n + 9)))
    w2 = -1.0 + math.sqrt(2.0 * (beta2 - 1.0))
    delta = 1.0 / math.sqrt(math.log(math.sqrt(w2)))
    alpha = math.sqrt(2.0 / (w2 - 1.0))
    z1 = delta * math.log(y / alpha + math.sqrt((y / alpha) ** 2 + 1.0))
    # kurtosis (Anscombe-Glynn 1983)
    eg2 = -6.0 / (n + 1)  # E[g2]
    vg2 = (24.0 * n * (n - 2) * (n - 3)) / ((n + 1) ** 2 * (n + 3) * (n + 5))
    x = (g2 - eg2) / math.sqrt(vg2)
    sqrtb1 = (6.0 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9))
              * math.sqrt(6.0 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3))))
    a = 6.0 + 8.0 / sqrtb1 * (2.0 / sqrtb1
                              + math.sqrt(1.0 + 4.0 / (sqrtb1 ** 2)))
    inner = (1.0 - 2.0 / a) / (1.0 + x * math.sqrt(2.0 / (a - 4.0)))
    cb = math.copysign(abs(inner) ** (1.0 / 3.0), inner)
    z2 = ((1.0 - 2.0 / (9.0 * a)) - cb) / math.sqrt(2.0 / (9.0 * a))
    k2 = z1 * z1 + z2 * z2
    return g1, g2, z1, z2, k2, math.exp(-k2 / 2.0)


def test_dagostino_k2_pipeline_vs_python(spark, tmp_path):
    """Per-customer order counts {1x8, 2x6, 3x3, 5x2, 9x1}: the query
    must reproduce the independent Python evaluation of the published
    formulas (moments additionally hand-checkable from the count
    grid)."""
    sf = str(tmp_path)
    counts = [1] * 8 + [2] * 6 + [3] * 3 + [5] * 2 + [9]
    rows, key = [], 1
    for cust, k in enumerate(counts, start=1):
        for _ in range(k):
            rows.append((key, cust, "F", 10.0, datetime(2024, 1, 5),
                         "1-URGENT"))
            key += 1
    _write_orders(spark, sf, rows)
    g1, g2, z1, z2, k2, p = _dagostino_python([float(c) for c in counts])
    r = QUERIES["orders_dagostino_k2"](spark, sf).collect()[0]
    assert r["n_customers"] == len(counts)
    assert r["skew_g1"] == pytest.approx(g1, abs=1e-6)
    assert r["kurt_g2"] == pytest.approx(g2, abs=1e-6)
    assert r["z_skew"] == pytest.approx(z1, abs=1e-5)
    assert r["z_kurt"] == pytest.approx(z2, abs=1e-5)
    assert r["k2_stat"] == pytest.approx(k2, abs=1e-5)
    assert r["p_value"] == pytest.approx(p, abs=1e-6)


# --- 7. MRPP with rank commensuration ---------------------------------------


def test_mrpp_rank_hand(spark, tmp_path):
    """Discounts A={0.00,0.01}, R={0.02,0.03}: midranks 1,2,3,4.
    delta_within = avg(|1-2|, |3-4|) = 1; all-pairs avg
    |r_i-r_j| over 6 pairs = (1+2+3+1+2+1)/6 = 5/3;
    A = 1 - 1/(5/3) = 0.4."""
    sf = str(tmp_path)
    _write_lineitem(spark, sf, [(1, 0.00, "A"), (1, 0.01, "A"),
                                (1, 0.02, "R"), (1, 0.03, "R")])
    r = QUERIES["lineitem_mrpp_rank_discount"](spark, sf).collect()[0]
    assert r["delta_observed"] == pytest.approx(1.0, abs=1e-9)
    assert r["delta_expected"] == pytest.approx(5 / 3, abs=1e-6)
    assert r["agreement_a"] == pytest.approx(0.4, abs=1e-6)


def test_mrpp_rank_with_ties_vs_python(spark, tmp_path):
    """Tie-heavy case replayed per-observation in Python (midranks over
    the combined discount sample; the house MRPP convention — weights
    n_g/N over ALL groups, ordered pairs, matching
    lineitem_mrpp_flags)."""
    sf = str(tmp_path)
    data = [(0.00, "A"), (0.01, "A"), (0.01, "A"), (0.01, "R"),
            (0.02, "R"), (0.05, "R"), (0.05, "N"), (0.06, "N")]
    _write_lineitem(spark, sf, [(1, d, f) for d, f in data])
    vals = sorted(d for d, _ in data)
    mid = {}
    for v in set(vals):
        pos = [i + 1 for i, x in enumerate(vals) if abs(x - v) < 1e-12]
        mid[v] = sum(pos) / len(pos)
    groups: dict[str, list[float]] = {}
    for d, f in data:
        groups.setdefault(f, []).append(mid[d])
    n_tot = len(data)
    observed = 0.0
    for rs in groups.values():
        w = sum(abs(a - b) for a in rs for b in rs)  # ordered pairs
        observed += w / (n_tot * (len(rs) - 1))
    allr = [mid[d] for d, _ in data]
    w_all = sum(abs(a - b) for a in allr for b in allr)
    expected = w_all / (n_tot * (n_tot - 1))
    r = QUERIES["lineitem_mrpp_rank_discount"](spark, sf).collect()[0]
    assert r["delta_observed"] == pytest.approx(observed, abs=1e-6)
    assert r["delta_expected"] == pytest.approx(expected, abs=1e-6)
    assert r["agreement_a"] == pytest.approx(1 - observed / expected,
                                             abs=1e-6)


def test_mrpp_rank_singleton_group_null(spark, tmp_path):
    """A group of size 1 makes within-group delta undefined — NULL, not
    a fake 0 (the lineitem_mrpp_flags convention)."""
    sf = str(tmp_path)
    _write_lineitem(spark, sf, [(1, 0.00, "A"), (1, 0.01, "A"),
                                (1, 0.02, "R")])
    r = QUERIES["lineitem_mrpp_rank_discount"](spark, sf).collect()[0]
    assert r["delta_observed"] is None
    assert r["agreement_a"] is None


# --- 8. Freeman-Tukey + Hellinger on the segment grid -----------------------


def test_freeman_tukey_hand(spark, tmp_path):
    """Grid [[3,1],[1,3]] (segment x balance-sign), e = 2 everywhere:
    FT = 4*[2*(sqrt3-sqrt2)^2 + 2*(1-sqrt2)^2] = 2.180697;
    Hellinger distance vs the independence product = 0.184593."""
    sf = str(tmp_path)
    rows, key = [], 1
    for seg, bal, k in [("AUTOMOBILE", 10.0, 3), ("AUTOMOBILE", -10.0, 1),
                        ("BUILDING", 10.0, 1), ("BUILDING", -10.0, 3)]:
        for _ in range(k):
            rows.append((key, f"c{key}", 1, bal, seg))
            key += 1
    _write_customer(spark, sf, rows)
    ft = 4 * (2 * (math.sqrt(3) - math.sqrt(2)) ** 2
              + 2 * (1 - math.sqrt(2)) ** 2)
    bc = 2 * math.sqrt(3 / 8 * 1 / 4) + 2 * math.sqrt(1 / 8 * 1 / 4)
    hell = math.sqrt(1 - bc)
    r = QUERIES["cust_freeman_tukey_segments"](spark, sf).collect()[0]
    assert r["n_cells"] == 4
    assert r["ft_stat"] == pytest.approx(ft, abs=1e-6)
    assert r["hellinger"] == pytest.approx(hell, abs=1e-6)


def test_freeman_tukey_zero_cell(spark, tmp_path):
    """A structurally-present zero cell (margins positive) contributes
    4e to FT: grid [[2,0],[1,1]] -> e for the zero cell = 2*1/4 = ...
    n=4, row {2,2}, col {3,1}; e11=1.5, e12=0.5, e21=1.5, e22=0.5;
    FT = 4[(sqrt2-sqrt1.5)^2 + (0-sqrt0.5)^2 + (1-sqrt1.5)^2
         + (1-sqrt0.5)^2]."""
    sf = str(tmp_path)
    rows, key = [], 1
    for seg, bal, k in [("AUTOMOBILE", 10.0, 2), ("BUILDING", 10.0, 1),
                        ("BUILDING", -10.0, 1)]:
        for _ in range(k):
            rows.append((key, f"c{key}", 1, bal, seg))
            key += 1
    _write_customer(spark, sf, rows)
    ft = 4 * ((math.sqrt(2) - math.sqrt(1.5)) ** 2
              + (0 - math.sqrt(0.5)) ** 2
              + (1 - math.sqrt(1.5)) ** 2
              + (1 - math.sqrt(0.5)) ** 2)
    r = QUERIES["cust_freeman_tukey_segments"](spark, sf).collect()[0]
    assert r["n_cells"] == 4  # zero cell rebuilt from the margins
    assert r["ft_stat"] == pytest.approx(ft, abs=1e-6)


# --- 9. Kendall tau-b z-test -------------------------------------------------


def test_taub_ztest_perfect_concordance(spark, tmp_path):
    """(q,d) = (1,0.00),(2,0.01),(3,0.02): S = C - D = 3, no ties,
    tau_b = 1; Var(S) = n(n-1)(2n+5)/18 = 11/3,
    z = 3/sqrt(11/3) = 1.566699."""
    sf = str(tmp_path)
    _write_lineitem(spark, sf, [(1, 0.00, "N"), (2, 0.01, "N"),
                                (3, 0.02, "N")])
    r = QUERIES["lineitem_taub_ztest"](spark, sf).collect()[0]
    assert r["s_stat"] == 3
    assert r["tau_b"] == pytest.approx(1.0, abs=1e-9)
    assert r["z_score"] == pytest.approx(3 / math.sqrt(11 / 3), abs=1e-6)


def test_taub_ztest_ties_vs_python(spark, tmp_path):
    """Tied case checked against an independent per-pair Python loop
    computing S, tau-b, and the full tie-corrected Var(S) (Kendall
    1970, eq. 4.4-4.7)."""
    sf = str(tmp_path)
    data = [(1, 0.00), (1, 0.01), (2, 0.01), (2, 0.02), (3, 0.02),
            (3, 0.00), (4, 0.03)]
    _write_lineitem(spark, sf, [(q, d, "N") for q, d in data])
    n = len(data)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = data[j][0] - data[i][0]
            dy = data[j][1] - data[i][1]
            prod = dx * dy
            s += (prod > 1e-15) - (prod < -1e-15) if dx != 0 and abs(
                dy) > 1e-15 else 0
    from collections import Counter

    tx = Counter(q for q, _ in data)
    ty = Counter(round(d * 100) for _, d in data)
    n0 = n * (n - 1) // 2
    n1 = sum(t * (t - 1) // 2 for t in tx.values())
    n2 = sum(t * (t - 1) // 2 for t in ty.values())
    tau = s / math.sqrt((n0 - n1) * (n0 - n2))
    v0 = n * (n - 1) * (2 * n + 5)
    vt = sum(t * (t - 1) * (2 * t + 5) for t in tx.values())
    vu = sum(t * (t - 1) * (2 * t + 5) for t in ty.values())
    v1 = (sum(t * (t - 1) for t in tx.values())
          * sum(t * (t - 1) for t in ty.values())) / (2.0 * n * (n - 1))
    v2 = (sum(t * (t - 1) * (t - 2) for t in tx.values())
          * sum(t * (t - 1) * (t - 2) for t in ty.values())
          ) / (9.0 * n * (n - 1) * (n - 2))
    var_s = (v0 - vt - vu) / 18.0 + v1 + v2
    z = s / math.sqrt(var_s)
    r = QUERIES["lineitem_taub_ztest"](spark, sf).collect()[0]
    assert r["s_stat"] == s
    assert r["tau_b"] == pytest.approx(tau, abs=1e-6)
    assert r["z_score"] == pytest.approx(z, abs=1e-6)


# --- 10. Brown-Mood k-sample median test ------------------------------------


def test_brown_mood_hand(spark, tmp_path):
    """A={1,2}, N={3,4}, R={5,6}: grand lower median = 3 (position 3
    of 6); counts above: A=0, N=1, R=2; E = 1 per group each side;
    chi2 = (1+0+1) + (1+0+1) = 4, df = 2."""
    sf = str(tmp_path)
    _write_lineitem(spark, sf, [(1, 0.0, "A"), (2, 0.0, "A"),
                                (3, 0.0, "N"), (4, 0.0, "N"),
                                (5, 0.0, "R"), (6, 0.0, "R")])
    r = QUERIES["lineitem_brown_mood_median"](spark, sf).collect()[0]
    assert r["grand_median"] == pytest.approx(3.0, abs=1e-9)
    assert r["n_groups"] == 3
    assert r["chi2"] == pytest.approx(4.0, abs=1e-6)
    assert r["df"] == 2


def test_brown_mood_single_group_null(spark, tmp_path):
    """One group only: no between-group contrast, chi2 = 0, df = 0 ->
    the query reports NULL chi2 (df < 1 guard) rather than a fake 0."""
    sf = str(tmp_path)
    _write_lineitem(spark, sf, [(1, 0.0, "A"), (2, 0.0, "A")])
    r = QUERIES["lineitem_brown_mood_median"](spark, sf).collect()[0]
    assert r["n_groups"] == 1
    assert r["chi2"] is None
