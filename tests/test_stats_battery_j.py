"""Known-value checks for the round-15 statistics battery J.

Same contract as batteries D-I: tests written FIRST, expectations
hand-computed or re-derived by independent per-observation Python
loops (never the query's own algebra).
"""

from __future__ import annotations

import math
from datetime import datetime

import pytest

from opentimes_spark.plans.queries import QUERIES


def _write_orders(spark, path, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")


def _write_monthly_counts(spark, path, counts, prio="1-URGENT"):
    """One order row per count unit: month i (1-based) of 2023 onward
    gets counts[i-1] orders, producing the monthly series y = counts."""
    rows, key = [], 1
    for i, c in enumerate(counts):
        yr, mo = 2023 + i // 12, i % 12 + 1
        for _ in range(c):
            rows.append((key, key, "F", 10.0, datetime(yr, mo, 10), prio))
            key += 1
    _write_orders(spark, path, rows)


def _write_lineitem_quant(spark, path, rows):
    """rows: (orderkey, quantity, returnflag, linestatus)."""
    data = [
        (ok, 1, 1, 1, float(q), 10.0, 0.0, 0.0, f, s, datetime(2024, 1, 2))
        for ok, q, f, s in rows
    ]
    spark.createDataFrame(
        data,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")


def _write_events(spark, path, rows):
    """rows: (event_id, ts, user_id, event_type, value)."""
    data = [(i, ts, u, et, float(v), "{}") for i, ts, u, et, v in rows]
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _midranks(y):
    n = len(y)
    return [
        sum(1 for v in y if v < x) + (sum(1 for v in y if v == x) + 1) / 2
        for x in y
    ]


# --- 1. Pettitt changepoint --------------------------------------------------


def _pettitt_python(y):
    """Defining double loop: U_t = sum_{i<=t} sum_{j>t} sgn(y_i - y_j)."""
    n = len(y)
    best_k, best_t = -1, None
    for t in range(1, n):
        u = sum(
            (y[i] > y[j]) - (y[i] < y[j])
            for i in range(t)
            for j in range(t, n)
        )
        if abs(u) > best_k:
            best_k, best_t = abs(u), t
    p = min(1.0, 2.0 * math.exp(-6.0 * best_k * best_k / (n**3 + n**2)))
    return best_k, best_t, p


def test_pettitt_level_shift(spark, tmp_path):
    """Series 2,3,2,3,8,9,8,9: a clean shift after month 4 — the
    defining U_t double loop peaks at t=4 with K = 16."""
    sf = str(tmp_path)
    y = [2, 3, 2, 3, 8, 9, 8, 9]
    _write_monthly_counts(spark, sf, y)
    k, t, p = _pettitt_python(y)
    assert (k, t) == (16, 4)
    r = QUERIES["orders_pettitt_changepoint"](spark, sf).collect()[0]
    assert r["n_months"] == 8
    assert r["k_stat"] == k
    # cp month = 4th month of 2023
    assert r["cp_month"] == 2023 * 12 + 4
    assert r["p_approx"] == pytest.approx(p, abs=1e-6)


def test_pettitt_with_ties_matches_sign_definition(spark, tmp_path):
    sf = str(tmp_path)
    y = [5, 5, 5, 1, 1, 9]
    _write_monthly_counts(spark, sf, y)
    k, t, p = _pettitt_python(y)
    r = QUERIES["orders_pettitt_changepoint"](spark, sf).collect()[0]
    assert r["k_stat"] == k
    assert r["cp_month"] == 2023 * 12 + t
    assert r["p_approx"] == pytest.approx(p, abs=1e-6)


# --- 2. SNHT (standard normal homogeneity test) ------------------------------


def _snht_python(y):
    n = len(y)
    mean = sum(y) / n
    s = math.sqrt(sum((v - mean) ** 2 for v in y) / (n - 1))
    best, best_k = None, None
    for k in range(1, n):
        z1 = sum((v - mean) / s for v in y[:k]) / k
        z2 = sum((v - mean) / s for v in y[k:]) / (n - k)
        t = k * z1 * z1 + (n - k) * z2 * z2
        if best is None or t > best + 1e-12:
            best, best_k = t, k
    return best, best_k


def test_snht_level_shift(spark, tmp_path):
    sf = str(tmp_path)
    y = [4, 5, 4, 5, 11, 12, 11, 12]
    _write_monthly_counts(spark, sf, y)
    t0, k = _snht_python(y)
    r = QUERIES["orders_snht_changepoint"](spark, sf).collect()[0]
    assert r["n_months"] == 8
    assert r["t0"] == pytest.approx(t0, abs=1e-5)
    assert r["cp_month"] == 2023 * 12 + k


def test_snht_constant_series_is_null(spark, tmp_path):
    sf = str(tmp_path)
    _write_monthly_counts(spark, sf, [3, 3, 3, 3])
    r = QUERIES["orders_snht_changepoint"](spark, sf).collect()[0]
    assert r["t0"] is None


# --- 3. Buishand range -------------------------------------------------------


def _buishand_python(y):
    n = len(y)
    mean = sum(y) / n
    s = math.sqrt(sum((v - mean) ** 2 for v in y) / (n - 1))
    partial = [0.0]
    for v in y:
        partial.append(partial[-1] + (v - mean))
    rng = max(partial) - min(partial)
    return rng, rng / s, rng / s / math.sqrt(n)


def test_buishand_range(spark, tmp_path):
    sf = str(tmp_path)
    y = [3, 1, 4, 1, 5, 9, 2, 6]
    _write_monthly_counts(spark, sf, y)
    rng, ros, rosn = _buishand_python(y)
    r = QUERIES["orders_buishand_range"](spark, sf).collect()[0]
    assert r["n_months"] == 8
    assert r["r_range"] == pytest.approx(rng, abs=1e-5)
    assert r["r_over_s"] == pytest.approx(ros, abs=1e-5)
    assert r["r_over_s_sqrt_n"] == pytest.approx(rosn, abs=1e-5)


# --- 4. KPSS level stationarity ---------------------------------------------


def _kpss_python(y, lag=4):
    n = len(y)
    mean = sum(y) / n
    e = [v - mean for v in y]
    s, ssum = 0.0, 0.0
    for v in e:
        s += v
        ssum += s * s
    g0 = sum(v * v for v in e) / n
    lrv = g0
    for ell in range(1, lag + 1):
        gl = sum(e[t] * e[t - ell] for t in range(ell, n)) / n
        lrv += 2.0 * (1.0 - ell / (lag + 1.0)) * gl
    return ssum / (n * n * lrv)


def test_kpss_level(spark, tmp_path):
    sf = str(tmp_path)
    y = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    _write_monthly_counts(spark, sf, y)
    eta = _kpss_python(y)
    r = QUERIES["orders_kpss_level"](spark, sf).collect()[0]
    assert r["n_months"] == 12
    assert r["lag_l"] == 4
    assert r["kpss_eta"] == pytest.approx(eta, abs=1e-6)


def test_kpss_trending_series_is_larger(spark, tmp_path):
    """A strong trend inflates the partial sums: eta(trend) >>
    eta(alternating)."""
    sf = str(tmp_path)
    trend = list(range(1, 13))
    alt = [5, 6] * 6
    _write_monthly_counts(spark, sf, trend)
    r1 = QUERIES["orders_kpss_level"](spark, sf).collect()[0]["kpss_eta"]
    _write_monthly_counts(spark, sf, alt)
    r2 = QUERIES["orders_kpss_level"](spark, sf).collect()[0]["kpss_eta"]
    assert r1 == pytest.approx(_kpss_python(trend), abs=1e-6)
    assert r2 == pytest.approx(_kpss_python(alt), abs=1e-6)
    # the alternating series' negative lag-autocovariances shrink its
    # long-run variance (inflating eta), so the gap is ~2x, not 10x
    assert r1 > 1.5 * r2


# --- 5. Laplace trend test ---------------------------------------------------


def test_laplace_trend_centroid(spark, tmp_path):
    """Five clicks at seconds 0,10,20,30,100 of a 100 s window:
    u = (mean(t) - T/2) / (T * sqrt(1/(12 n)))."""
    sf = str(tmp_path)
    secs = [0, 10, 20, 30, 100]
    rows = [
        (i, datetime(2024, 1, 1, 0, s // 60, s % 60), 1, "click", 1.0)
        for i, s in enumerate(secs)
    ]
    _write_events(spark, sf, rows)
    n, t = len(secs), 100.0
    u = (sum(secs) / n - t / 2) / (t * math.sqrt(1.0 / (12 * n)))
    r = QUERIES["events_laplace_trend"](spark, sf).collect()
    assert len(r) == 1
    assert r[0]["event_type"] == "click"
    assert r[0]["n_events"] == n
    assert r[0]["u_stat"] == pytest.approx(u, abs=1e-6)


def test_laplace_per_type_and_zero_window(spark, tmp_path):
    """Types are tested independently; a single-instant type (T = 0)
    yields NULL, not a crash."""
    sf = str(tmp_path)
    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 1, "click", 1.0),
        (2, datetime(2024, 1, 1, 0, 1, 0), 1, "click", 1.0),
        (3, datetime(2024, 1, 1, 0, 2, 0), 1, "click", 1.0),
        (4, datetime(2024, 1, 1, 0, 0, 30), 2, "view", 1.0),
        (5, datetime(2024, 1, 1, 0, 0, 30), 2, "view", 1.0),
    ]
    _write_events(spark, sf, rows)
    out = {r["event_type"]: r for r in
           QUERIES["events_laplace_trend"](spark, sf).collect()}
    # clicks at 0,60,120 are perfectly centred: u = 0
    assert out["click"]["u_stat"] == pytest.approx(0.0, abs=1e-9)
    assert out["view"]["u_stat"] is None


# --- 6. MIL-HDBK-189 (Crow/AMSAA) trend test --------------------------------


def test_mil_hdbk_chi2(spark, tmp_path):
    """Orders on days 1,2,5,9 after a day-0 first order, window ends at
    the last order: chi2 = 2*sum ln(T/t_i) over 0 < t_i, df = 2n
    (the day-0 arrivals pin T but are excluded from the sum)."""
    sf = str(tmp_path)
    rows = [
        (1, 1, "F", 10.0, datetime(2024, 1, 1), "1-URGENT"),   # day 0
        (2, 2, "F", 10.0, datetime(2024, 1, 2), "1-URGENT"),   # t=1
        (3, 3, "F", 10.0, datetime(2024, 1, 3), "1-URGENT"),   # t=2
        (4, 4, "F", 10.0, datetime(2024, 1, 6), "1-URGENT"),   # t=5
        (5, 5, "F", 10.0, datetime(2024, 1, 10), "1-URGENT"),  # t=9
    ]
    _write_orders(spark, sf, rows)
    ts, tt = [1, 2, 5, 9], 9.0
    chi2 = 2.0 * sum(math.log(tt / t) for t in ts)
    n = len(ts)
    z = (chi2 - 2 * n) / math.sqrt(4.0 * n)
    r = QUERIES["orders_mil_hdbk_trend"](spark, sf).collect()[0]
    assert r["n_times"] == n
    assert r["df"] == 2 * n
    assert r["chi2_mil"] == pytest.approx(chi2, abs=1e-5)
    assert r["z_score"] == pytest.approx(z, abs=1e-5)


# --- 7. Wilcoxon signed-rank (year-over-year paired months) ------------------


def _signed_rank_python(diffs):
    d = [x for x in diffs if x != 0]
    n = len(d)
    absd = [abs(x) for x in d]
    r = _midranks(absd)
    w_plus = sum(ri for ri, di in zip(r, d) if di > 0)
    e_w = n * (n + 1) / 4.0
    # tie correction over tied |d| groups
    from collections import Counter
    tie = sum(t**3 - t for t in Counter(absd).values())
    var = n * (n + 1) * (2 * n + 1) / 24.0 - tie / 48.0
    z = (w_plus - e_w) / math.sqrt(var) if var > 0 else None
    return n, w_plus, z


def test_wilcoxon_signed_rank_yoy(spark, tmp_path):
    """24 months spanning 2023-2024: pairs are (month m of 2023,
    month m of 2024); the query must reproduce the defining midrank
    W+ and tie-corrected z."""
    sf = str(tmp_path)
    y23 = [5, 7, 6, 8, 5, 9, 7, 6, 8, 5, 7, 6]
    y24 = [8, 7, 9, 6, 8, 12, 9, 9, 11, 8, 9, 9]
    _write_monthly_counts(spark, sf, y23 + y24)
    diffs = [b - a for a, b in zip(y23, y24)]
    n, w_plus, z = _signed_rank_python(diffs)
    r = QUERIES["orders_wilcoxon_signed_rank_yoy"](spark, sf).collect()[0]
    assert r["n_pairs"] == n
    assert r["w_plus_2x"] == round(2 * w_plus)
    assert r["z_score"] == pytest.approx(z, abs=1e-5)


def test_wilcoxon_signed_rank_all_zero_diffs(spark, tmp_path):
    sf = str(tmp_path)
    y = [4, 5, 6, 4, 5, 6]  # would need 12+ months for a yoy pair
    _write_monthly_counts(spark, sf, y)
    r = QUERIES["orders_wilcoxon_signed_rank_yoy"](spark, sf).collect()[0]
    assert r["n_pairs"] == 0 or r["n_pairs"] is None
    assert r["z_score"] is None


# --- 8. Fisher-Pitman permutation test (normal approximation) ---------------


def test_fisher_pitman_moments(spark, tmp_path):
    """Defining finite-population moments: T = sum of group-R values,
    E[T] = n1*xbar, Var[T] = n1*n2/(N(N-1)) * sum (x - xbar)^2."""
    sf = str(tmp_path)
    r_vals = [10, 12, 14, 9]
    a_vals = [5, 6, 7, 8, 4]
    rows = [(i + 1, q, "R", "O") for i, q in enumerate(r_vals)] + [
        (100 + i, q, "A", "O") for i, q in enumerate(a_vals)
    ]
    _write_lineitem_quant(spark, sf, rows)
    allv = r_vals + a_vals
    n1, n2, n = len(r_vals), len(a_vals), len(allv)
    xbar = sum(allv) / n
    t = sum(r_vals)
    var = n1 * n2 / (n * (n - 1)) * sum((x - xbar) ** 2 for x in allv)
    z = (t - n1 * xbar) / math.sqrt(var)
    r = QUERIES["lineitem_fisher_pitman"](spark, sf).collect()[0]
    assert r["n_r"] == n1
    assert r["n_a"] == n2
    assert r["t_sum"] == t
    assert r["z_score"] == pytest.approx(z, abs=1e-5)


# --- 9. Baumgartner-Weiss-Schindler (BWS) -----------------------------------


def _bws_python(x, y):
    """Baumgartner-Weiss-Schindler B via the defining per-sample sums;
    combined ranks are midranks, within-sample index by sorted order."""
    n, m = len(x), len(y)
    allv = sorted(x + y)

    def rank_of(v):
        less = sum(1 for a in allv if a < v)
        eq = sum(1 for a in allv if a == v)
        return less + (eq + 1) / 2

    def b_one(sample, n_s, m_o):
        tot = n_s + m_o
        s = 0.0
        for i, v in enumerate(sorted(sample), start=1):
            ri = rank_of(v)
            num = (ri - tot / n_s * i) ** 2
            den = (i / (n_s + 1)) * (1 - i / (n_s + 1)) * (
                m_o * tot / n_s)
            s += num / den
        return s / n_s

    return (b_one(x, n, m) + b_one(y, m, n)) / 2.0


def test_bws_known_samples(spark, tmp_path):
    sf = str(tmp_path)
    bld = [120.5, 89.25, 130.0, 95.75, 110.0, 101.5]
    mch = [140.25, 150.0, 135.5, 160.75, 148.0]
    rows = [(i + 1, f"c{i}", 1, v, "BUILDING") for i, v in enumerate(bld)]
    rows += [(100 + i, f"d{i}", 1, v, "MACHINERY")
             for i, v in enumerate(mch)]
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{str(tmp_path)}/customer.parquet")
    b = _bws_python(bld, mch)
    r = QUERIES["cust_bws_segments"](spark, sf).collect()[0]
    assert r["n_building"] == len(bld)
    assert r["n_machinery"] == len(mch)
    assert r["bws_b"] == pytest.approx(b, abs=1e-5)


# --- 10. Vargha-Delaney A ----------------------------------------------------


def test_vargha_delaney_a(spark, tmp_path):
    """A = (#(x>y) + 0.5 #(x=y)) / (n1 n2) over all cross pairs —
    computed here by the defining double loop."""
    sf = str(tmp_path)
    o_vals = [5, 8, 8, 11, 3]
    f_vals = [4, 8, 2, 7]
    rows = [(i + 1, q, "N", "O") for i, q in enumerate(o_vals)] + [
        (100 + i, q, "N", "F") for i, q in enumerate(f_vals)
    ]
    _write_lineitem_quant(spark, sf, rows)
    wins = sum(1 for a in o_vals for b in f_vals if a > b)
    ties = sum(1 for a in o_vals for b in f_vals if a == b)
    a_meas = (wins + 0.5 * ties) / (len(o_vals) * len(f_vals))
    r = QUERIES["lineitem_vargha_delaney"](spark, sf).collect()[0]
    assert r["n_o"] == len(o_vals)
    assert r["n_f"] == len(f_vals)
    assert r["vd_a"] == pytest.approx(a_meas, abs=1e-6)
    assert r["magnitude"] == (
        "large" if abs(a_meas - 0.5) >= 0.474 else
        "medium" if abs(a_meas - 0.5) >= 0.33 else
        "small" if abs(a_meas - 0.5) >= 0.147 else "negligible")


# --- 11. Dunn post-hoc pairwise z after Kruskal-Wallis ----------------------


def _dunn_python(groups):
    """groups: dict label -> values. Returns {(l1,l2): z} with midranks
    and the tie-corrected pooled variance."""
    from collections import Counter
    allv = [v for vs in groups.values() for v in vs]
    n = len(allv)
    r = _midranks(allv)
    idx = 0
    rbar = {}
    for lab, vs in groups.items():
        k = len(vs)
        rbar[lab] = sum(r[idx:idx + k]) / k
        idx += k
    tie = sum(t**3 - t for t in Counter(allv).values())
    base = n * (n + 1) / 12.0 - tie / (12.0 * (n - 1))
    out = {}
    labs = sorted(groups)
    for i, l1 in enumerate(labs):
        for l2 in labs[i + 1:]:
            se = math.sqrt(base * (1 / len(groups[l1])
                                   + 1 / len(groups[l2])))
            out[(l1, l2)] = (rbar[l1] - rbar[l2]) / se
    return out


def test_dunn_posthoc_pairs(spark, tmp_path):
    sf = str(tmp_path)
    groups = {
        "A": [5, 7, 7, 9, 11],
        "N": [4, 4, 6, 8],
        "R": [10, 12, 12, 14, 9, 11],
    }
    rows, ok = [], 1
    for f, vs in groups.items():
        for q in vs:
            rows.append((ok, q, f, "O"))
            ok += 1
    _write_lineitem_quant(spark, sf, rows)
    exp = _dunn_python(groups)
    got = {(r["flag_a"], r["flag_b"]): r
           for r in QUERIES["lineitem_dunn_posthoc"](spark, sf).collect()}
    assert set(got) == set(exp)
    for pair, z in exp.items():
        assert got[pair]["z_dunn"] == pytest.approx(z, abs=1e-5), pair
        assert got[pair]["n_a"] == len(groups[pair[0]])
        assert got[pair]["n_b"] == len(groups[pair[1]])


# --- 12. Wald-Wolfowitz two-sample runs test --------------------------------


def test_wald_wolfowitz_runs(spark, tmp_path):
    """Clicks 1,2,3,10,11 vs purchases 5,6,7: sorted by (value, type)
    the label sequence is C C C P P P C C -> 3 runs."""
    sf = str(tmp_path)
    clicks = [1, 2, 3, 10, 11]
    purch = [5, 6, 7]
    rows = [(i, datetime(2024, 1, 1, 0, 0, i), 1, "click", v)
            for i, v in enumerate(clicks)]
    rows += [(100 + i, datetime(2024, 1, 1, 0, 0, 30 + i), 1, "purchase", v)
             for i, v in enumerate(purch)]
    _write_events(spark, sf, rows)
    n1, n2 = len(clicks), len(purch)
    nn = n1 + n2
    runs = 3
    e_r = 2.0 * n1 * n2 / nn + 1
    var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - nn)) / (nn * nn * (nn - 1))
    z = (runs - e_r) / math.sqrt(var)
    r = QUERIES["events_wald_wolfowitz"](spark, sf).collect()[0]
    assert r["n_click"] == n1
    assert r["n_purchase"] == n2
    assert r["n_runs"] == runs
    assert r["z_score"] == pytest.approx(z, abs=1e-5)


def test_wald_wolfowitz_tie_convention(spark, tmp_path):
    """Cross-group ties: clicks at value 5 sort before purchases at 5
    (label order click < purchase inside a tie block) — deterministic,
    documented, and replicated here."""
    sf = str(tmp_path)
    clicks = [5, 5, 9]
    purch = [5, 7]
    rows = [(i, datetime(2024, 1, 1, 0, 0, i), 1, "click", v)
            for i, v in enumerate(clicks)]
    rows += [(100 + i, datetime(2024, 1, 1, 0, 0, 30 + i), 1, "purchase", v)
             for i, v in enumerate(purch)]
    _write_events(spark, sf, rows)
    # sequence: click5 click5 purchase5 purchase7 click9 -> C C P P C = 3
    r = QUERIES["events_wald_wolfowitz"](spark, sf).collect()[0]
    assert r["n_runs"] == 3


# --- 13. Page's L (month blocks x priority treatments) ----------------------


def _page_l_python(blocks):
    """blocks: list of dicts treatment(1..5) -> count; rank within
    block by (count, treatment) row_number (tie-free), L = sum j*rank."""
    k = 5
    b = len(blocks)
    l_stat = 0
    for cells in blocks:
        order = sorted(range(1, k + 1),
                       key=lambda j: (cells.get(j, 0), j))
        for rank, j in enumerate(order, start=1):
            l_stat += j * rank
    e_l = b * k * (k + 1) ** 2 / 4
    var = b * k * k * (k + 1) * (k * k - 1) / 144.0
    z = (l_stat - e_l) / math.sqrt(var)
    return b, l_stat, int(e_l), z


def test_page_l_priority_months(spark, tmp_path):
    """3 month blocks; two have counts perfectly increasing in
    priority index, one mixed — replicated by the defining loop."""
    sf = str(tmp_path)
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    blocks = [
        {1: 1, 2: 2, 3: 3, 4: 4, 5: 5},
        {1: 2, 2: 3, 3: 4, 4: 5, 5: 6},
        {1: 4, 2: 1, 3: 3, 4: 2, 5: 5},
    ]
    rows, key = [], 1
    for mo, cells in enumerate(blocks, start=1):
        for j, c in cells.items():
            for _ in range(c):
                rows.append((key, key, "F", 10.0,
                             datetime(2024, mo, 10), prios[j - 1]))
                key += 1
    _write_orders(spark, sf, rows)
    b, l_stat, e_l, z = _page_l_python(blocks)
    r = QUERIES["orders_page_l_priority"](spark, sf).collect()[0]
    assert r["n_blocks"] == b
    assert r["page_l"] == l_stat
    assert r["expected_l"] == e_l
    assert r["z_score"] == pytest.approx(z, abs=1e-5)


def test_page_l_zero_fill_missing_cells(spark, tmp_path):
    """A month with no 5-LOW orders still ranks 5 treatments: the
    missing cell densifies to count 0 (lowest rank by (0, j))."""
    sf = str(tmp_path)
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    blocks = [{1: 2, 2: 3, 3: 4, 4: 5}]  # treatment 5 absent
    rows, key = [], 1
    for mo, cells in enumerate(blocks, start=1):
        for j, c in cells.items():
            for _ in range(c):
                rows.append((key, key, "F", 10.0,
                             datetime(2024, mo, 10), prios[j - 1]))
                key += 1
    _write_orders(spark, sf, rows)
    full = [{j: blocks[0].get(j, 0) for j in range(1, 6)}]
    b, l_stat, e_l, z = _page_l_python(full)
    r = QUERIES["orders_page_l_priority"](spark, sf).collect()[0]
    assert r["page_l"] == l_stat
    assert r["z_score"] == pytest.approx(z, abs=1e-5)


# --- 14. Durbin incomplete-block test ---------------------------------------


def _durbin_python(blocks, t=5):
    """blocks: list of dicts treatment -> count for PRESENT cells only
    (the design drops (i+j) % 5 == 0).  Ranks by (count, j) within
    block; T1 = 12(t-1)/(r t (k-1)(k+1)) * sum R_j^2
               - 3 r (t-1)(k+1)/(k-1)."""
    b = len(blocks)
    k = len(next(iter(blocks)))
    r_cnt = b * k // t
    r_j = {j: 0 for j in range(1, t + 1)}
    for cells in blocks:
        order = sorted(cells, key=lambda j: (cells[j], j))
        for rank, j in enumerate(order, start=1):
            r_j[j] += rank
    s = sum(v * v for v in r_j.values())
    t1 = (12.0 * (t - 1)) / (r_cnt * t * (k - 1) * (k + 1)) * s \
        - 3.0 * r_cnt * (t - 1) * (k + 1) / (k - 1)
    return b, k, r_cnt, t1


def test_durbin_incomplete_blocks(spark, tmp_path):
    """5 months -> each (month_index + treatment) % 5 == 0 cell is
    dropped by design: every block keeps k=4 of t=5 treatments and
    each treatment appears r=4 times."""
    sf = str(tmp_path)
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    raw = [
        {1: 3, 2: 1, 3: 4, 4: 1, 5: 5},
        {1: 9, 2: 2, 3: 6, 4: 5, 5: 3},
        {1: 5, 2: 8, 3: 9, 4: 7, 5: 9},
        {1: 3, 2: 2, 3: 3, 4: 8, 5: 4},
        {1: 6, 2: 2, 3: 6, 4: 4, 5: 3},
    ]
    rows, key = [], 1
    for mo, cells in enumerate(raw, start=1):
        for j, c in cells.items():
            for _ in range(c):
                rows.append((key, key, "F", 10.0,
                             datetime(2024, mo, 10), prios[j - 1]))
                key += 1
    _write_orders(spark, sf, rows)
    design = [
        {j: raw[i - 1][j] for j in range(1, 6) if (i + j) % 5 != 0}
        for i in range(1, 6)
    ]
    b, k, r_cnt, t1 = _durbin_python(design)
    assert (b, k, r_cnt) == (5, 4, 4)
    r = QUERIES["orders_durbin_incomplete"](spark, sf).collect()[0]
    assert r["n_blocks"] == b
    assert r["k_per_block"] == k
    assert r["r_per_treatment"] == r_cnt
    assert r["durbin_t1"] == pytest.approx(t1, abs=1e-5)


# --- 15. Shapiro-Francia W' --------------------------------------------------


def test_shapiro_francia_wprime(spark, tmp_path):
    """W' = corr^2 of order statistics vs Blom scores, replicated with
    the shared Acklam ppf on the SAME 1e-9 quantization grid."""
    from opentimes_spark.functions.normal import ppf_py

    sf = str(tmp_path)
    y = [4, 7, 5, 9, 6, 8, 5, 7, 6, 7]
    _write_monthly_counts(spark, sf, y)
    n = len(y)
    ys = sorted(y)
    aq = [
        math.floor(ppf_py((i - 0.375) / (n + 0.25)) * 1e9 + 0.5)
        for i in range(1, n + 1)
    ]
    ybar = sum(ys) / n
    sxx = sum((v - ybar) ** 2 for v in ys)
    num = sum(a * v for a, v in zip(aq, ys)) ** 2
    den = sum(a * a for a in aq) * sxx
    wprime = num / den
    r = QUERIES["orders_shapiro_francia"](spark, sf).collect()[0]
    assert r["n_months"] == n
    assert r["w_prime"] == pytest.approx(wprime, abs=1e-6)


def test_shapiro_francia_normalish_beats_bimodal(spark, tmp_path):
    sf = str(tmp_path)
    normal_ish = [5, 6, 6, 7, 7, 7, 8, 8, 9]
    bimodal = [1, 1, 1, 1, 20, 20, 20, 20, 1]
    _write_monthly_counts(spark, sf, normal_ish)
    w1 = QUERIES["orders_shapiro_francia"](spark, sf).collect()[0]["w_prime"]
    _write_monthly_counts(spark, sf, bimodal)
    w2 = QUERIES["orders_shapiro_francia"](spark, sf).collect()[0]["w_prime"]
    assert w1 > w2


# --- 16. Power-divergence extended members (lang x source) ------------------


def _write_documents(spark, path, rows):
    """rows: (doc_id, lang, source)."""
    data = [(i, f"text {i}", lg, src, 7) for i, lg, src in rows]
    spark.createDataFrame(
        data,
        "doc_id long, text string, lang string, source string, "
        "n_chars int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/documents.parquet")


def test_power_divergence_ext_members(spark, tmp_path):
    sf = str(tmp_path)
    grid = {("en", "web"): 20, ("en", "book"): 10, ("de", "web"): 5,
            ("de", "book"): 15}
    rows, i = [], 1
    for (lg, src), c in grid.items():
        for _ in range(c):
            rows.append((i, lg, src))
            i += 1
    _write_documents(spark, sf, rows)
    n = sum(grid.values())
    langs = {lg for lg, _ in grid}
    srcs = {s for _, s in grid}
    rt = {lg: sum(c for (l2, _), c in grid.items() if l2 == lg)
          for lg in langs}
    ct = {s: sum(c for (_, s2), c in grid.items() if s2 == s)
          for s in srcs}
    half = three = neg32 = 0.0
    for lg in langs:
        for s in srcs:
            o = grid.get((lg, s), 0)
            e = rt[lg] * ct[s] / n
            if o > 0:
                half += o * (math.sqrt(o / e) - 1.0)
                three += o * ((o / e) ** 3 - 1.0)
                neg32 += o * ((e / o) ** 1.5 - 1.0)
    half *= 8.0 / 3.0
    three /= 6.0
    neg32 *= 8.0 / 3.0
    r = QUERIES["docs_power_divergence_ext"](spark, sf).collect()[0]
    assert r["n_obs"] == n
    assert r["df"] == (len(langs) - 1) * (len(srcs) - 1)
    assert r["pd_half"] == pytest.approx(half, abs=1e-5)
    assert r["pd_three"] == pytest.approx(three, abs=1e-5)
    assert r["pd_neg32"] == pytest.approx(neg32, abs=1e-5)


# --- 17/18. Weighted logrank: Tarone-Ware and Peto-Peto ---------------------


def _weighted_logrank_python(subjects, weight):
    """subjects: (grp 1|2, t, ev).  weight: 'tw' (sqrt n) or 'pp'
    (modified survival estimator incl. current time)."""
    times = sorted({t for _, t, e in subjects if e == 1})
    num = den = 0.0
    s_tilde = 1.0
    n_times = 0
    for t in times:
        n1 = sum(1 for g, ti, _ in subjects if g == 1 and ti >= t)
        n2 = sum(1 for g, ti, _ in subjects if g == 2 and ti >= t)
        d1 = sum(1 for g, ti, e in subjects
                 if g == 1 and ti == t and e == 1)
        d = sum(1 for _, ti, e in subjects if ti == t and e == 1)
        nn = n1 + n2
        if d == 0:
            continue
        n_times += 1
        ome = d1 - d * n1 / nn
        v = (d * (n1 / nn) * (n2 / nn) * (nn - d)) / (nn - 1) \
            if nn > 1 else 0.0
        if weight == "tw":
            w = math.sqrt(nn)
        else:
            s_tilde *= 1.0 - d / (nn + 1.0)
            w = s_tilde
        num += w * ome
        den += w * w * v
    chi2 = num * num / den if den > 0 else None
    return n_times, num, den, chi2


def _write_survival_events(spark, path, subjects):
    """subjects: (grp 1|2, t_days, ev).  grp1 users click; grp2 never
    do.  First event day 0; purchase at day t (ev) or non-purchase
    activity at day t (censored)."""
    rows, eid = [], 1
    for uid, (grp, t, ev) in enumerate(subjects, start=1):
        first = "click" if grp == 1 else "view"
        rows.append((eid, datetime(2024, 1, 1 + 0), uid, first, 1.0))
        eid += 1
        last = "purchase" if ev else first
        rows.append((eid, datetime(2024, 1, 1 + t), uid, last, 1.0))
        eid += 1
    _write_events(spark, path, rows)


SUBJECTS = [
    (1, 3, 1), (1, 5, 1), (1, 7, 0), (1, 9, 1), (1, 9, 0),
    (2, 2, 1), (2, 3, 1), (2, 5, 0), (2, 8, 1), (2, 9, 1), (2, 9, 0),
]


def test_tarone_ware_weighted_logrank(spark, tmp_path):
    sf = str(tmp_path)
    _write_survival_events(spark, sf, SUBJECTS)
    n_times, num, den, chi2 = _weighted_logrank_python(SUBJECTS, "tw")
    r = QUERIES["events_logrank_tarone_ware"](spark, sf).collect()[0]
    assert r["n_g1"] == sum(1 for g, _, _ in SUBJECTS if g == 1)
    assert r["n_g2"] == sum(1 for g, _, _ in SUBJECTS if g == 2)
    assert r["n_times"] == n_times
    assert r["w_o_minus_e"] == pytest.approx(num, abs=1e-5)
    assert r["w_var_sum"] == pytest.approx(den, abs=1e-5)
    assert r["tarone_ware_chi2"] == pytest.approx(chi2, abs=1e-5)


def test_peto_peto_weighted_logrank(spark, tmp_path):
    sf = str(tmp_path)
    _write_survival_events(spark, sf, SUBJECTS)
    n_times, num, den, chi2 = _weighted_logrank_python(SUBJECTS, "pp")
    r = QUERIES["events_logrank_peto_peto"](spark, sf).collect()[0]
    assert r["n_times"] == n_times
    assert r["w_o_minus_e"] == pytest.approx(num, abs=1e-5)
    assert r["w_var_sum"] == pytest.approx(den, abs=1e-5)
    assert r["peto_peto_chi2"] == pytest.approx(chi2, abs=1e-5)


# --- 19. Tietjen-Moore multiple-outlier statistic ----------------------------


def test_tietjen_moore_e3(spark, tmp_path):
    """E_k for the k=3 largest |x - xbar| (ties by suppkey): trimmed
    SS about the trimmed mean over full SS about the full mean."""
    sf = str(tmp_path)
    vals = [10.0, 12.0, 11.0, 13.0, 12.5, 11.5, 40.0, -25.0, 12.2, 90.0]
    rows = [(i + 1, f"s{i}", 1, v) for i, v in enumerate(vals)]
    spark.createDataFrame(
        rows,
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{sf}/supplier.parquet")
    n, k = len(vals), 3
    xbar = sum(vals) / n
    order = sorted(range(n),
                   key=lambda i: (-abs(vals[i] - xbar), i + 1))
    keep = [vals[i] for i in order[k:]]
    kbar = sum(keep) / len(keep)
    e_k = sum((v - kbar) ** 2 for v in keep) / sum(
        (v - xbar) ** 2 for v in vals)
    r = QUERIES["supplier_tietjen_moore"](spark, sf).collect()[0]
    assert r["n_suppliers"] == n
    assert r["k_trim"] == k
    assert r["e_k"] == pytest.approx(e_k, abs=1e-6)
