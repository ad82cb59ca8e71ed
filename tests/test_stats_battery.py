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


def test_dixon_q_top10_hand(spark, tmp_path):
    """Prices 10,20,…,100: Q = (100−90)/(100−10) = 1/9, not rejected."""
    sf = str(tmp_path)
    rows = [
        (i + 1, f"p{i}", "B", "T", 1, float(10 * (i + 1)))
        for i in range(10)
    ]
    spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/part.parquet")
    row = QUERIES["part_dixon_q_top10"](spark, sf).collect()[0]
    assert row["dixon_q"] == pytest.approx(1.0 / 9.0, abs=1e-6)
    assert row["reject_at_05"] == 0


def test_woolf_or_ci_hand(spark, tmp_path):
    """a,b,c,d = 10,20,5,40: OR = 4, CI = exp(ln4 ∓ 1.96·√0.375)."""
    import math

    sf = str(tmp_path)
    cells = [("1-URGENT", "F", 10), ("1-URGENT", "O", 20),
             ("3-MEDIUM", "F", 5), ("3-MEDIUM", "O", 40)]
    rows = []
    k = 1
    for prio, st, c in cells:
        for _ in range(c):
            rows.append((k, k, st, 1.0, datetime(2024, 1, 5), prio))
            k += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    row = QUERIES["orders_woolf_or_ci"](spark, sf).collect()[0]
    assert row["odds_ratio"] == 4.0
    se = math.sqrt(1 / 10 + 1 / 20 + 1 / 5 + 1 / 40)
    z = 1.959963984540054
    assert row["ci_lo"] == pytest.approx(math.exp(math.log(4) - z * se),
                                         abs=1e-4)
    assert row["ci_hi"] == pytest.approx(math.exp(math.log(4) + z * se),
                                         abs=1e-4)
    # single-stratum Mantel-Haenszel must agree with the crude OR
    spark.createDataFrame(
        [(i, f"c{i}", 7, 0.0, "BUILDING") for i in range(1, k)],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/customer.parquet")
    mh = QUERIES["orders_mantel_haenszel_or"](spark, sf).collect()[0]
    assert mh["n_strata"] == 1 and mh["mh_odds_ratio"] == 4.0


def test_blocking_quality_known_dups(spark, tmp_path):
    """4 docs, one exact-dup pair sharing a block: PC = 1,
    RR = 1 − 1/6 (one 2-doc block, two singletons)."""
    sf = str(tmp_path)
    rows = [
        (1, "same text here", "en", "a", 140),
        (2, "same text here", "en", "b", 140),
        (3, "unique one", "en", "a", 250),
        (4, "another unique", "de", "a", 340),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    row = QUERIES["docs_blocking_quality"](spark, sf).collect()[0]
    assert row["true_dup_pairs"] == 1 and row["captured_dup_pairs"] == 1
    assert row["candidate_pairs"] == 1
    assert row["pair_completeness"] == 1.0
    assert row["reduction_ratio"] == pytest.approx(1 - 1 / 6, abs=1e-6)


def test_psi_hand_computed(spark, tmp_path):
    """Type X: 3 then 1; type Y: 1 then 3 (two days, split after day 1):
    PSI = (0.75−0.25)ln3 + (0.25−0.75)ln(1/3) = ln3."""
    import math

    sf = str(tmp_path)
    d1, d2 = datetime(2024, 1, 1), datetime(2024, 1, 2)
    rows = (
        [(i, d1, i, "x", 1.0, "{}") for i in range(3)]
        + [(3, d2, 3, "x", 1.0, "{}")]
        + [(4, d1, 4, "y", 1.0, "{}")]
        + [(5 + i, d2, 5 + i, "y", 1.0, "{}") for i in range(3)]
    )
    _write_events(spark, sf, rows)
    row = QUERIES["events_psi_type_drift"](spark, sf).collect()[0]
    assert row["n_first_half"] == 4 and row["n_second_half"] == 4
    assert row["n_types_skipped"] == 0
    assert row["psi"] == pytest.approx(math.log(3.0), abs=1e-6)


def test_cohens_h_extreme_proportions(spark, tmp_path):
    """p1 = 1, p2 = 0 → h = 2·arcsin(1) − 0 = π."""
    import math

    sf = str(tmp_path)
    _write_orders(spark, sf, {
        ("1-URGENT", 2024, 1): 5,
        ("3-MEDIUM", 2024, 12): 5,
    })
    row = QUERIES["orders_cohens_h_urgent"](spark, sf).collect()[0]
    assert row["p1"] == 1.0 and row["p2"] == 0.0
    assert row["cohens_h"] == pytest.approx(math.pi, abs=1e-6)


def test_hurst_two_point_series(spark, tmp_path):
    """Daily counts (1, 3): scaled walk (−2, 2), R = 0.5, S = 1,
    H = ln(0.5)/ln(2) = −1."""
    sf = str(tmp_path)
    _write_orders(spark, sf, {("1-URGENT", 2024, 1): 1})
    # overwrite with two specific days
    rows = [
        (1, 1, "F", 1.0, datetime(2024, 1, 1), "1-URGENT"),
        (2, 2, "F", 1.0, datetime(2024, 1, 2), "1-URGENT"),
        (3, 3, "F", 1.0, datetime(2024, 1, 2), "1-URGENT"),
        (4, 4, "F", 1.0, datetime(2024, 1, 2), "1-URGENT"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    row = QUERIES["orders_hurst_rs"](spark, sf).collect()[0]
    assert row["rs_range"] == 0.5  # (0 − (−2))/n/n = 2/4
    assert row["rs_sd"] == 1.0  # sqrt(2·10 − 16)/2
    assert row["hurst_h"] == -1.0  # ln(0.5)/ln 2


def test_jonckheere_clean_separation(spark, tmp_path):
    """A = {1,2}, N = {3,4}, R = {5,6}: all 12 cross-group pairs
    ascend, no ties → JT = 12 (jt2 = 24), E[JT] = (36−12)/4 = 6,
    Var = (36·15 − 3·4·7)/72 = 19/3, z = 6/√(19/3).  This test caught
    the 2x-scale numerator being divided by the UNSCALED σ (reported
    2z) on first landing — the shared-misconception class the DuckDB
    differential cannot see."""
    import math

    sf = str(tmp_path)
    _write_lineitem(
        spark, sf,
        [(1, "A"), (2, "A"), (3, "N"), (4, "N"), (5, "R"), (6, "R")],
    )
    row = QUERIES["lineitem_jonckheere_quantity"](spark, sf).collect()[0]
    # 3 group pairs x 4 value pairs each, all ascending, no ties
    assert row["jt_stat_x2"] == 24
    assert row["expected_x2"] == 6 * 6 - 3 * 4  # n² − Σn_g² = 24
    assert row["z_score"] == pytest.approx(6.0 / math.sqrt(19.0 / 3.0),
                                           abs=1e-6)


def test_ordinal_association_perfect_monotone(spark, tmp_path):
    """Priority 1↔status F, 3↔P, 5↔O (perfect monotone, no off-cells):
    gamma = 1; tau-b < 1 (ties); Somers' D_yx = (C−D)/(P − T_x)."""
    sf = str(tmp_path)
    cells = [("1-URGENT", "F", 2), ("3-MEDIUM", "P", 2), ("5-LOW", "O", 2)]
    rows = []
    k = 1
    for prio, st, c in cells:
        for _ in range(c):
            rows.append((k, k, st, 1.0, datetime(2024, 1, 5), prio))
            k += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    row = QUERIES["orders_ordinal_association"](spark, sf).collect()[0]
    assert row["goodman_kruskal_gamma"] == 1.0
    assert row["concordant"] == 12 and row["discordant"] == 0
    # P = 15, T_x = 3 per margin: D_yx = 12/12 = 1, tau_b = 12/12 = 1
    assert row["somers_d_yx"] == 1.0 and row["kendall_tau_b"] == 1.0


# --- wave 2: expectations computed by INDEPENDENT python loops over the
# textbook definitions (per-observation, no grid tricks), so a shared
# grid-algebra mistake in the registered query cannot hide.


def test_anderson_darling_matches_naive_loop(spark, tmp_path):
    """Gaps {1, 1, 2} (active days 1,2,3,5): A² from the plain
    per-order-statistic textbook sum must match the tie-block form."""
    import math

    sf = str(tmp_path)
    rows = [
        (i + 1, i + 1, "F", 1.0, datetime(2024, 1, d), "1-URGENT")
        for i, d in enumerate([1, 2, 3, 5])
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    gaps = sorted([1, 1, 2])
    n = len(gaps)
    mean = sum(gaps) / n
    s = 0.0
    for i, g in enumerate(gaps, start=1):
        u = 1.0 - math.exp(-g / mean)
        u_rev = 1.0 - math.exp(-gaps[n - i] / mean)
        s += (2 * i - 1) * (math.log(u) + math.log(1.0 - u_rev))
    expect = -n - s / n
    row = QUERIES["orders_anderson_darling_gaps"](spark, sf).collect()[0]
    assert row["n_gaps"] == 3
    assert row["ad_stat"] == pytest.approx(expect, abs=1e-5)


def test_logrank_matches_naive_loop(spark, tmp_path):
    """Three users, times computed per the query's rule; O−E and V from
    the per-death-time textbook loop."""
    sf = str(tmp_path)
    d = lambda day: datetime(2024, 1, day)
    rows = [
        # user 1: click day1, purchase day3 -> grp1, t=2, event
        (1, d(1), 1, "click", 0.0, "{}"),
        (2, d(3), 1, "purchase", 1.0, "{}"),
        # user 2: view day1, last day5 -> grp2, t=4, censored
        (3, d(1), 2, "view", 0.0, "{}"),
        (4, d(5), 2, "view", 0.0, "{}"),
        # user 3: view day2, purchase day4 -> grp2, t=2, event
        (5, d(2), 3, "view", 0.0, "{}"),
        (6, d(4), 3, "purchase", 1.0, "{}"),
    ]
    _write_events(spark, sf, rows)
    subjects = [(1, 2, 1), (2, 4, 0), (2, 2, 1)]  # (grp, t, event)
    times = sorted({t for _, t, e in subjects if e})
    ome, var = 0.0, 0.0
    for t in times:
        n1 = sum(1 for g, tt, _ in subjects if g == 1 and tt >= t)
        n2 = sum(1 for g, tt, _ in subjects if g == 2 and tt >= t)
        d1 = sum(1 for g, tt, e in subjects if g == 1 and tt == t and e)
        dd = sum(1 for g, tt, e in subjects if tt == t and e)
        nn = n1 + n2
        ome += d1 - dd * n1 / nn
        if nn > 1:
            var += dd * (n1 / nn) * (n2 / nn) * (nn - dd) / (nn - 1)
    row = QUERIES["events_logrank_two_group"](spark, sf).collect()[0]
    assert row["n_g1"] == 1 and row["n_g2"] == 2
    assert row["o_minus_e"] == pytest.approx(ome, abs=1e-6)
    assert row["var_sum"] == pytest.approx(var, abs=1e-6)


def test_cronbach_alpha_matches_naive_loop(spark, tmp_path):
    """Counts matrix, alpha from the plain variance definition."""
    sf = str(tmp_path)
    t0 = datetime(2024, 1, 1)
    # users x items count matrix (zeros implicit)
    matrix = {1: {"a": 2, "b": 1}, 2: {"a": 1, "b": 2}, 3: {"a": 3, "b": 3}}
    rows = []
    eid = 0
    for u, items in matrix.items():
        for it, c in items.items():
            for _ in range(c):
                eid += 1
                rows.append((eid, t0, u, it, 1.0, "{}"))
    _write_events(spark, sf, rows)
    users = sorted(matrix)
    items = sorted({i for v in matrix.values() for i in v})
    n, k = len(users), len(items)

    def pvar(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / len(xs)

    item_vars = sum(
        pvar([matrix[u].get(i, 0) for u in users]) for i in items
    )
    tot_var = pvar([sum(matrix[u].values()) for u in users])
    expect = (k / (k - 1)) * (1 - item_vars / tot_var)
    row = QUERIES["events_cronbach_alpha"](spark, sf).collect()[0]
    assert row["cronbach_alpha"] == pytest.approx(expect, abs=1e-6)


def test_gumbel_matches_naive_loop(spark, tmp_path):
    """Block maxima {10, 20}: beta, mu and return levels from plain
    python."""
    import math

    sf = str(tmp_path)
    rows = [
        (1, 1, "F", 10.0, datetime(2024, 1, 5), "1-URGENT"),
        (2, 2, "F", 20.0, datetime(2024, 2, 5), "1-URGENT"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    mx = [10.0, 20.0]
    mean = sum(mx) / 2
    sd = math.sqrt(sum((x - mean) ** 2 for x in mx) / 2)
    beta = sd * math.sqrt(6.0) / math.pi
    mu = mean - 0.5772156649015329 * beta
    rl12 = mu - beta * math.log(-math.log(1 - 1 / 12))
    row = QUERIES["orders_gumbel_block_maxima"](spark, sf).collect()[0]
    assert row["gumbel_beta"] == pytest.approx(beta, abs=1e-5)
    assert row["gumbel_mu"] == pytest.approx(mu, abs=1e-3)
    assert row["rl_12"] == pytest.approx(rl12, abs=1e-3)


def test_ljung_box_matches_numpy_style_loop(spark, tmp_path):
    """Monthly counts (1,3,2,5,4): residuals of the OLS trend and
    Q(4) from a direct python loop."""
    sf = str(tmp_path)
    ys = [1, 3, 2, 5, 4]
    _write_orders(
        spark, sf,
        {("1-URGENT", 2024, m + 1): y for m, y in enumerate(ys)},
    )
    n = len(ys)
    ts = list(range(1, n + 1))
    st, sy = sum(ts), sum(ys)
    stt = sum(t * t for t in ts)
    sty = sum(t * y for t, y in zip(ts, ys))
    den = n * stt - st * st
    b = (n * sty - st * sy) / den
    a = (sy * stt - st * sty) / den
    e = [y - a - b * t for t, y in zip(ts, ys)]
    s0 = sum(x * x for x in e)
    q = 0.0
    rks = []
    for k in range(1, 5):
        ck = sum(e[i] * e[i - k] for i in range(k, n))
        rk = ck / s0
        rks.append(rk)
        q += rk * rk / (n - k)
    q *= n * (n + 2)
    row = QUERIES["orders_ljung_box_monthly"](spark, sf).collect()[0]
    for i, rk in enumerate(rks, start=1):
        assert row[f"r{i}"] == pytest.approx(rk, abs=1e-5)
    assert row["ljung_box_q4"] == pytest.approx(q, abs=1e-4)


def test_theil_between_two_nations(spark, tmp_path):
    """Nation 1: two orders of 100; nation 2: one order of 200 —
    T and MLD from the plain share formula."""
    import math

    sf = str(tmp_path)
    orders = [
        (1, 1, "F", 100.0, datetime(2024, 1, 5), "1-URGENT"),
        (2, 1, "F", 100.0, datetime(2024, 1, 6), "1-URGENT"),
        (3, 2, "F", 200.0, datetime(2024, 1, 7), "1-URGENT"),
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    spark.createDataFrame(
        [(1, "a", 1, 0.0, "BUILDING"), (2, "b", 2, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/customer.parquet")
    shares = [(2 / 3, 200 / 400), (1 / 3, 200 / 400)]  # (count, revenue)
    t = sum(sy * math.log(sy / sc) for sc, sy in shares)
    ml = sum(sc * math.log(sc / sy) for sc, sy in shares)
    row = QUERIES["orders_theil_between_nations"](spark, sf).collect()[0]
    assert row["n_nations"] == 2
    assert row["theil_t_between"] == pytest.approx(t, abs=1e-6)
    assert row["mld_between"] == pytest.approx(ml, abs=1e-6)


def test_cramers_v_corrected_2x2(spark, tmp_path):
    """2x2 with cells (30,10;10,30): chi2 = 20·…, both V's from the
    direct python computation."""
    import math

    sf = str(tmp_path)
    cells = [("1-URGENT", "F", 30), ("1-URGENT", "O", 10),
             ("3-MEDIUM", "F", 10), ("3-MEDIUM", "O", 30)]
    rows = []
    k = 1
    for prio, st, c in cells:
        for _ in range(c):
            rows.append((k, k, st, 1.0, datetime(2024, 1, 5), prio))
            k += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    n = 80
    obs = [[30, 10], [10, 30]]
    rs, cs = [40, 40], [40, 40]
    chi2 = sum(
        (obs[i][j] - rs[i] * cs[j] / n) ** 2 / (rs[i] * cs[j] / n)
        for i in range(2) for j in range(2)
    )
    v = math.sqrt(chi2 / n / 1)
    phi2c = max(0.0, chi2 / n - 1 / (n - 1))
    rc = 2 - 1 / (n - 1)
    vbc = math.sqrt(phi2c / (rc - 1))
    row = QUERIES["orders_cramers_v_corrected"](spark, sf).collect()[0]
    assert row["chi2"] == pytest.approx(chi2, abs=1e-3)
    assert row["cramers_v"] == pytest.approx(v, abs=1e-5)
    assert row["cramers_v_corrected"] == pytest.approx(vbc, abs=1e-5)


def test_bhattacharyya_disjoint_is_zero(spark, tmp_path):
    """Segments in disjoint bucket ranges: BC = 0, Hellinger = 1."""
    sf = str(tmp_path)
    rows = (
        [(i, f"b{i}", 1, 100.0 + i, "BUILDING") for i in range(5)]
        + [(10 + i, f"m{i}", 1, 5000.0 + i, "MACHINERY") for i in range(5)]
    )
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/customer.parquet")
    row = QUERIES["cust_bhattacharyya_segments"](spark, sf).collect()[0]
    assert row["bhattacharyya_coef"] == 0.0
    assert row["hellinger_distance"] == 1.0


def test_kde_zero_variance_yields_null(spark, tmp_path):
    """All balances equal → Silverman h = 0 → densities must be NULL
    in both engines, never an Inf/NaN divergence."""
    sf = str(tmp_path)
    rows = [(i, f"c{i}", 1, 500.0, "BUILDING") for i in range(4)]
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/customer.parquet")
    out = QUERIES["cust_epanechnikov_kde"](spark, sf).collect()
    assert len(out) == 21
    assert all(r["density"] is None for r in out)


def test_seasonal_mk_two_months_three_years(spark, tmp_path):
    """Jan counts (1,2,3) rising, Jul counts (3,2,1) falling:
    S = 3 + (−3) = 0, Var = 2·(3·2·11)/18·18-scale → z = 0."""
    sf = str(tmp_path)
    counts = {}
    for i, yr in enumerate([2022, 2023, 2024]):
        counts[("1-URGENT", yr, 1)] = i + 1
        counts[("1-URGENT", yr, 7)] = 3 - i
    _write_orders(spark, sf, counts)
    row = QUERIES["orders_seasonal_mann_kendall"](spark, sf).collect()[0]
    assert row["n_seasons"] == 2
    assert row["s_stat"] == 0
    assert row["var_s"] == pytest.approx(2 * 3 * 2 * 11 / 18.0, abs=1e-4)
    assert row["z_score"] == 0.0


# --- wave 3: the remaining r12 statistics, including the CUSUM
# prefix-min identity validated against the direct textbook recursion.


def test_cusum_prefix_min_identity_vs_recursion(spark, tmp_path):
    """Daily sums (10, 10, 22): replay the quantized tabular CUSUM
    recursion C⁺_i = max(0, C⁺_{i−1} + x_i − μ − kσ) in exact integer
    space and demand the query's prefix-min formulation match it."""
    import math

    sf = str(tmp_path)
    d = lambda day: datetime(2024, 1, day)
    rows = []
    eid = 0
    for day, total in [(1, 10), (2, 10), (3, 22)]:
        eid += 1
        rows.append((eid, d(day), eid, "x", float(total), "{}"))
    _write_events(spark, sf, rows)
    ys = [10, 10, 22]
    n, s1 = len(ys), sum(ys)
    s2 = sum(y * y for y in ys)
    kshift = round(5e5 * math.sqrt(n * s2 - s1 * s1) / n)
    cpos, cmax_hi = 0, 0
    cneg, cmax_lo = 0, 0
    hi = lo = 0
    for y in ys:
        dev = 10**6 * (n * y - s1)
        cpos = max(0, cpos + dev - n * kshift)
        cneg = max(0, cneg - dev - n * kshift)
        cmax_hi = max(cmax_hi, cpos)
        cmax_lo = max(cmax_lo, cneg)
        thr = 8 * n * kshift
        hi += cpos > thr
        lo += cneg > thr
    row = QUERIES["events_cusum_tabular"](spark, sf).collect()[0]
    assert row["n_days"] == 3
    assert row["n_ooc_high"] == hi and row["n_ooc_low"] == lo
    assert row["max_cusum_high"] == pytest.approx(cmax_hi / (1e6 * n),
                                                  abs=1e-4)
    assert row["max_cusum_low"] == pytest.approx(cmax_lo / (1e6 * n),
                                                 abs=1e-4)


def _write_docs(spark, path, texts):
    rows = [
        (i + 1, t, "en", "a", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_ace_hand_computed(spark, tmp_path):
    """Bigram frequencies {x y: 1, y z: 2, z w: 2} via one doc:
    S_rare = 3, F1 = 1, N_rare = 5, Σr(r−1) = 4, C = 0.8,
    γ² = max(0, 3·4/(0.8·5·4) − 1) = 0 → ACE = 0 + 3/0.8 = 3.75."""
    sf = str(tmp_path)
    # bigrams: "x y" once; "y z" twice; "z w" twice
    _write_docs(spark, sf, ["x y z w", "y z w"])
    # doc1 bigrams: x y, y z, z w ; doc2: y z, z w
    row = QUERIES["docs_bigram_ace_richness"](spark, sf).collect()[0]
    assert row["s_rare"] == 3 and row["f1"] == 1 and row["n_rare"] == 5
    assert row["coverage_ace"] == pytest.approx(0.8, abs=1e-6)
    assert row["cv_squared"] == 0.0
    assert row["ace_richness"] == pytest.approx(3.75, abs=1e-4)


def test_ace_all_singletons_null(spark, tmp_path):
    """Every bigram unique → C_ace = 0 → ACE NULL (textbook
    undefined), never a divide-by-zero."""
    sf = str(tmp_path)
    _write_docs(spark, sf, ["a b c", "d e f"])
    row = QUERIES["docs_bigram_ace_richness"](spark, sf).collect()[0]
    assert row["coverage_ace"] == 0.0
    assert row["ace_richness"] is None


def test_neyman_two_strata_hand(spark, tmp_path):
    """BUILDING balances {0,10}, MACHINERY {0,30}: S = 5 and 15, equal
    sizes → weights 10 vs 30 → allocations 250 / 750."""
    sf = str(tmp_path)
    rows = [
        (1, "a", 1, 0.0, "BUILDING"), (2, "b", 1, 10.0, "BUILDING"),
        (3, "c", 1, 0.0, "MACHINERY"), (4, "d", 1, 30.0, "MACHINERY"),
    ]
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/customer.parquet")
    out = {r["segment"]: r for r in
           QUERIES["cust_neyman_allocation"](spark, sf).collect()}
    assert out["BUILDING"]["stratum_sd"] == 5.0
    assert out["MACHINERY"]["stratum_sd"] == 15.0
    assert out["BUILDING"]["neyman_n"] == 250
    assert out["MACHINERY"]["neyman_n"] == 750


def test_sen_slope_ci_three_months(spark, tmp_path):
    """Counts (1,2,4) over consecutive months: slopes {1, 1.5, 2},
    median 1.5; N = 3, Var(S) = 3·2·11/18, C = 1.96·√Var → ranks
    clamp to (1, 3) → CI = (1, 2)."""
    sf = str(tmp_path)
    _write_orders(spark, sf, {
        ("1-URGENT", 2024, 1): 1,
        ("1-URGENT", 2024, 2): 2,
        ("1-URGENT", 2024, 3): 4,
    })
    row = QUERIES["orders_sen_slope_ci"](spark, sf).collect()[0]
    assert row["n_pairs"] == 3
    assert row["sen_slope"] == 1.5
    assert row["ci_lo"] == 1.0 and row["ci_hi"] == 2.0


def test_stuart_tau_c_perfect_monotone(spark, tmp_path):
    """3x3 diagonal table (2 per cell): C = 12, D = 0, m = 3 →
    tau-c = 2·3·12/(6²·2) = 1."""
    sf = str(tmp_path)
    cells = [("1-URGENT", "F", 2), ("3-MEDIUM", "P", 2), ("5-LOW", "O", 2)]
    rows = []
    k = 1
    for prio, st, c in cells:
        for _ in range(c):
            rows.append((k, k, st, 1.0, datetime(2024, 1, 5), prio))
            k += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    row = QUERIES["orders_stuart_tau_c"](spark, sf).collect()[0]
    assert row["m_dim"] == 3
    assert row["stuart_tau_c"] == 1.0


def test_yule_q_y_hand(spark, tmp_path):
    """a,b,c,d = 10,20,5,40: Q = (400−100)/500 = 0.6,
    Y = (20−10)/(20+10) = 1/3."""
    sf = str(tmp_path)
    cells = [("1-URGENT", "F", 10), ("1-URGENT", "O", 20),
             ("3-MEDIUM", "F", 5), ("3-MEDIUM", "O", 40)]
    rows = []
    k = 1
    for prio, st, c in cells:
        for _ in range(c):
            rows.append((k, k, st, 1.0, datetime(2024, 1, 5), prio))
            k += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    row = QUERIES["orders_yule_q_y"](spark, sf).collect()[0]
    assert row["yule_q"] == pytest.approx(0.6, abs=1e-6)
    assert row["yule_y"] == pytest.approx(1.0 / 3.0, abs=1e-6)


def test_robust_location_five_values(spark, tmp_path):
    """Prices {10,20,30,40,100}: type-7 quartiles (20, 30, 40) →
    trimean 30, midhinge 30, IQR 20, Bowley 0."""
    sf = str(tmp_path)
    rows = [
        (i + 1, f"p{i}", "B", "T", 1, float(v))
        for i, v in enumerate([10, 20, 30, 40, 100])
    ]
    spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/part.parquet")
    row = QUERIES["part_robust_location_report"](spark, sf).collect()[0]
    assert (row["q1"], row["median"], row["q3"]) == (20.0, 30.0, 40.0)
    assert row["trimean"] == 30.0 and row["midhinge"] == 30.0
    assert row["iqr"] == 20.0 and row["bowley_skewness"] == 0.0


def test_qq_deciles_shifted_uniforms(spark, tmp_path):
    """BUILDING 1..10 vs MACHINERY 11..20: every decile gap is
    exactly 10 (type-7 interpolation on identical rank geometry)."""
    sf = str(tmp_path)
    rows = (
        [(i, f"b{i}", 1, float(i), "BUILDING") for i in range(1, 11)]
        + [(100 + i, f"m{i}", 1, float(10 + i), "MACHINERY")
           for i in range(1, 11)]
    )
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/customer.parquet")
    out = QUERIES["cust_qq_deciles_segments"](spark, sf).collect()
    assert len(out) == 9
    assert all(r["qq_gap"] == 10.0 for r in out)


# --- wave 4: the round-11 battery gets the same independent-loop
# treatment (3 shared-formula bugs surfaced in the r12 batch; the r11
# batch predates this gate).


def test_cohens_d_hand(spark, tmp_path):
    """R = {5,7}, A = {1,3}: pooled s = √2, d = 4/√2, g = d·(1−3/7)."""
    import math

    sf = str(tmp_path)
    _write_lineitem(
        spark, sf, [(5, "R"), (7, "R"), (1, "A"), (3, "A")]
    )
    row = QUERIES["lineitem_cohens_d_quantity"](spark, sf).collect()[0]
    d = 4.0 / math.sqrt(2.0)
    assert row["cohens_d"] == pytest.approx(d, abs=1e-6)
    assert row["hedges_g"] == pytest.approx(d * (1 - 3.0 / 7.0), abs=1e-6)


def test_cliffs_delta_dominance_and_ties(spark, tmp_path):
    """R = {3,4} strictly above A = {1,2} → δ = 1; adding a tied pair
    pulls it below 1 (ties count to neither side)."""
    sf = str(tmp_path)
    _write_lineitem(
        spark, sf, [(3, "R"), (4, "R"), (1, "A"), (2, "A")]
    )
    row = QUERIES["lineitem_cliffs_delta_quantity"](spark, sf).collect()[0]
    assert row["n_gt"] == 4 and row["n_lt"] == 0
    assert row["cliffs_delta"] == 1.0
    _write_lineitem(
        spark, sf, [(3, "R"), (2, "R"), (1, "A"), (2, "A")]
    )
    row = QUERIES["lineitem_cliffs_delta_quantity"](spark, sf).collect()[0]
    # pairs: (3>1),(3>2),(2>1),(2=2): n_gt=3, n_lt=0, ties 1 -> 3/4
    assert row["cliffs_delta"] == 0.75


def test_krippendorff_alpha_hand(spark, tmp_path):
    """Labels a = (1,1,0,0) [lang], b = (1,0,0,0) [length]: D = 1,
    n1 = 3, N = 4 → alpha = 1 − (1/4)/(2·5·3/(8·7)) = 1 − 7/15."""
    sf = str(tmp_path)
    rows = [
        (1, "x" * 400, "en", "a", 400),
        (2, "y" * 100, "en", "a", 100),
        (3, "z" * 100, "de", "a", 100),
        (4, "w" * 100, "de", "a", 100),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    row = QUERIES["docs_krippendorff_alpha"](spark, sf).collect()[0]
    do = 1.0 / 4.0
    de = 2.0 * 5.0 * 3.0 / (8.0 * 7.0)
    assert row["krippendorff_alpha"] == pytest.approx(1 - do / de, abs=1e-6)


def test_chao1_hand(spark, tmp_path):
    """Bigram freqs {1, 2, 2}: D = 3, f1 = 1, f2 = 2 →
    chao1 = 3 + 0/(2·3) = 3; coverage = 1 − 1/5."""
    sf = str(tmp_path)
    _write_docs(spark, sf, ["x y z w", "y z w"])
    row = QUERIES["docs_bigram_chao1_richness"](spark, sf).collect()[0]
    assert row["d_obs"] == 3 and row["f1"] == 1 and row["f2"] == 2
    assert row["chao1"] == 3.0
    assert row["coverage"] == pytest.approx(1 - 1 / 5, abs=1e-6)


def test_nelson_aalen_hand(spark, tmp_path):
    """Three users: events at t=2 (two users at risk of 3) …
    cumulative hazard from the plain per-time loop."""
    sf = str(tmp_path)
    d = lambda day: datetime(2024, 1, day)
    rows = [
        (1, d(1), 1, "view", 0.0, "{}"),
        (2, d(3), 1, "purchase", 1.0, "{}"),   # t=2, event
        (3, d(1), 2, "view", 0.0, "{}"),
        (4, d(3), 2, "view", 0.0, "{}"),       # t=2, censored
        (5, d(1), 3, "view", 0.0, "{}"),
        (6, d(6), 3, "purchase", 1.0, "{}"),   # t=5, event
    ]
    _write_events(spark, sf, rows)
    out = {r["duration_days"]: r for r in
           QUERIES["events_nelson_aalen"](spark, sf).collect()}
    # t=2: n_risk=3, d=1 -> H = 1/3 ; t=5: n_risk=1, d=1 -> H = 1/3+1
    assert out[2]["n_risk"] == 3
    assert out[2]["cum_hazard"] == pytest.approx(1 / 3, abs=1e-6)
    assert out[5]["n_risk"] == 1
    assert out[5]["cum_hazard"] == pytest.approx(1 / 3 + 1.0, abs=1e-6)


def test_grubbs_hand(spark, tmp_path):
    """Daily counts (1, 1, 4): mean 2, sample sd √3,
    G = |4−2|/√3 at the spike day."""
    import math

    sf = str(tmp_path)
    d = lambda day: datetime(2024, 1, day)
    rows = []
    eid = 0
    for day, c in [(1, 1), (2, 1), (3, 4)]:
        for _ in range(c):
            eid += 1
            rows.append((eid, d(day), eid, "x", 1.0, "{}"))
    _write_events(spark, sf, rows)
    row = QUERIES["events_grubbs_daily_outlier"](spark, sf).collect()[0]
    assert row["day"] == "2024-01-03" and row["direction"] == "above"
    assert row["g_stat"] == pytest.approx(2.0 / math.sqrt(3.0), abs=1e-6)


def test_runs_up_down_alternating(spark, tmp_path):
    """Monthly revenue 1,2,1,2: signs +,−,+ → R = 3 maximal runs from
    m = 3 differences, i.e. N = 4 observations:
    E[R] = (2N−1)/3 = 7/3 and Var = (16N−29)/90 = 35/90."""
    import math

    sf = str(tmp_path)
    rows = []
    k = 1
    for mo, total in [(1, 1.0), (2, 2.0), (3, 1.0), (4, 2.0)]:
        rows.append((k, k, "F", total, datetime(2024, mo, 5), "1-URGENT"))
        k += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    row = QUERIES["orders_runs_up_down"](spark, sf).collect()[0]
    assert row["n_diffs"] == 3 and row["runs"] == 3
    assert row["expected_runs"] == pytest.approx(7.0 / 3.0, abs=1e-4)
    assert row["z_score"] == pytest.approx(
        (3 - 7.0 / 3.0) / math.sqrt(35.0 / 90.0), abs=1e-5
    )


def test_brown_forsythe_matches_loop(spark, tmp_path):
    """A = {1,1,3,3}, N = {5,5,5,5}: replicate the LOWER-median
    convention and the Levene-BF F from a plain loop."""
    sf = str(tmp_path)
    data = [(1, "A"), (1, "A"), (3, "A"), (3, "A"),
            (5, "N"), (5, "N"), (5, "N"), (5, "N")]
    _write_lineitem(spark, sf, data)
    groups = {}
    for q, f in data:
        groups.setdefault(f, []).append(q)
    zs = {}
    for f, xs in groups.items():
        xs = sorted(xs)
        n = len(xs)
        # lower median: min value whose cumulative count doubles >= n
        med = next(x for i, x in enumerate(xs, 1) if 2 * i >= n)
        zs[f] = [abs(x - med) for x in xs]
    allz = [z for v in zs.values() for z in v]
    gm = sum(allz) / len(allz)
    ssb = sum(len(v) * (sum(v) / len(v) - gm) ** 2 for v in zs.values())
    ssw = sum(
        (z - sum(v) / len(v)) ** 2 for v in zs.values() for z in v
    )
    k, n = len(zs), len(allz)
    expect = (ssb / (k - 1)) / (ssw / (n - k))
    row = QUERIES["lineitem_brown_forsythe"](spark, sf).collect()[0]
    assert row["k_groups"] == 2 and row["n_total"] == 8
    assert row["bf_f"] == pytest.approx(expect, abs=1e-5)


def test_bartlett_matches_loop(spark, tmp_path):
    """Statuses O = {1,3}, F = {2,6}: sample variances 2 and 8;
    Bartlett T from the textbook loop."""
    import math

    sf = str(tmp_path)
    rows = [
        (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", datetime(2024, 1, 2)),
        (2, 1, 1, 1, 3.0, 10.0, 0.0, 0.0, "N", "O", datetime(2024, 1, 2)),
        (3, 1, 1, 1, 2.0, 10.0, 0.0, 0.0, "N", "F", datetime(2024, 1, 2)),
        (4, 1, 1, 1, 6.0, 10.0, 0.0, 0.0, "N", "F", datetime(2024, 1, 2)),
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")
    groups = {"O": [1, 3], "F": [2, 6]}
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    sw = sum(
        (len(v) - 1)
        * sum((x - sum(v) / len(v)) ** 2 for x in v) / (len(v) - 1)
        for v in groups.values()
    )
    slog = sum(
        (len(v) - 1)
        * math.log(sum((x - sum(v) / len(v)) ** 2 for x in v) / (len(v) - 1))
        for v in groups.values()
    )
    sinv = sum(1.0 / (len(v) - 1) for v in groups.values())
    t = ((n - k) * math.log(sw / (n - k)) - slog) / (
        1.0 + (sinv - 1.0 / (n - k)) / (3.0 * (k - 1))
    )
    row = QUERIES["lineitem_bartlett_linestatus"](spark, sf).collect()[0]
    assert row["bartlett_t"] == pytest.approx(t, abs=1e-5)


def test_welch_anova_matches_loop(spark, tmp_path):
    """Prices {1,2,3} vs {10,20,30} dollars: Welch F and
    Satterthwaite df2 from the textbook loop in cents."""
    sf = str(tmp_path)
    rows = [
        (i + 1, f"p{i}", "B", ("T1" if i < 3 else "T2"), 1, float(v))
        for i, v in enumerate([1, 2, 3, 10, 20, 30])
    ]
    spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/part.parquet")
    groups = [[100, 200, 300], [1000, 2000, 3000]]
    ws, ms, ns = [], [], []
    for xs in groups:
        n = len(xs)
        m = sum(xs) / n
        s2 = sum((x - m) ** 2 for x in xs) / (n - 1)
        ws.append(n / s2)
        ms.append(m)
        ns.append(n)
    k = len(groups)
    sw = sum(ws)
    grand = sum(w * m for w, m in zip(ws, ms)) / sw
    a = sum(w * (m - grand) ** 2 for w, m in zip(ws, ms))
    lam = sum(
        (1 - w / sw) ** 2 / (n - 1) for w, n in zip(ws, ns)
    )
    f = (a / (k - 1)) / (1 + 2 * (k - 2) * lam / (k * k - 1))
    df2 = (k * k - 1) / (3 * lam)
    row = QUERIES["part_type_price_welch_anova"](spark, sf).collect()[0]
    assert row["k_groups"] == 2
    assert row["welch_f"] == pytest.approx(f, abs=1e-4)
    assert row["df2"] == pytest.approx(df2, abs=1e-2)


def test_forecast_metrics_match_loop(spark, tmp_path):
    """14 months of revenue: sMAPE/WAPE (lag 1), MASE and Theil U2
    (lag 12 vs lag 1) from plain loops over the cents series."""
    import math

    sf = str(tmp_path)
    ys = [100, 110, 90, 120, 130, 80, 105, 115, 95, 125, 135, 85, 102,
          118]
    rows = []
    k = 1
    for i, y in enumerate(ys):
        yr, mo = 2023 + i // 12, i % 12 + 1
        rows.append((k, k, "F", float(y), datetime(yr, mo, 5), "1-URGENT"))
        k += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    c = [y * 100 for y in ys]
    # sMAPE / WAPE on lag-1
    terms = [2 * abs(c[i] - c[i - 1]) / (c[i] + c[i - 1])
             for i in range(1, len(c))]
    smape = sum(terms) / len(terms)
    wape = sum(abs(c[i] - c[i - 1]) for i in range(1, len(c))) / sum(
        c[1:]
    )
    row = QUERIES["orders_smape_wape_monthly"](spark, sf).collect()[0]
    assert row["smape"] == pytest.approx(smape, abs=1e-5)
    assert row["wape"] == pytest.approx(wape, abs=1e-5)
    # MASE: seasonal-naive (lag 12) over naive (lag 1)
    mae_n = sum(abs(c[i] - c[i - 1]) for i in range(1, len(c))) / (
        len(c) - 1
    )
    mae_s = sum(abs(c[i] - c[i - 12]) for i in range(12, len(c))) / (
        len(c) - 12
    )
    row = QUERIES["orders_seasonal_naive_mase"](spark, sf).collect()[0]
    assert row["mase"] == pytest.approx(mae_s / mae_n, abs=1e-5)
    # Theil U2 over months where the seasonal forecast exists
    sse_s = sum((c[i] - c[i - 12]) ** 2 for i in range(12, len(c)))
    sse_n = sum((c[i] - c[i - 1]) ** 2 for i in range(12, len(c)))
    row = QUERIES["orders_theil_u2_snaive"](spark, sf).collect()[0]
    assert row["theil_u2"] == pytest.approx(math.sqrt(sse_s / sse_n),
                                            abs=1e-5)


def test_jarque_bera_matches_loop(spark, tmp_path):
    """Lengths {100, 200, 200, 500}: JB from the plain central-moment
    loop."""
    sf = str(tmp_path)
    lens = [100, 200, 200, 500]
    _write_docs(spark, sf, ["x" * n for n in lens])
    n = len(lens)
    mu = sum(lens) / n
    m2 = sum((x - mu) ** 2 for x in lens) / n
    m3 = sum((x - mu) ** 3 for x in lens) / n
    m4 = sum((x - mu) ** 4 for x in lens) / n
    s = m3 / m2 ** 1.5
    kk = m4 / m2 ** 2 - 3
    jb = n / 6 * (s * s + kk * kk / 4)
    row = QUERIES["docs_length_jarque_bera"](spark, sf).collect()[0]
    assert row["skewness"] == pytest.approx(s, abs=1e-5)
    assert row["excess_kurtosis"] == pytest.approx(kk, abs=1e-5)
    assert row["jarque_bera"] == pytest.approx(jb, abs=1e-4)


def test_welch_ttest_matches_loop(spark, tmp_path):
    """Prices R = {1,2,3}, N = {10,20,30} dollars: Welch t and
    Satterthwaite df from the plain loop in cents."""
    import math

    sf = str(tmp_path)
    rows = [
        (i + 1, 1, 1, 1, 1.0, float(v), 0.0, 0.0, f, "O",
         datetime(2024, 1, 2))
        for i, (v, f) in enumerate(
            [(1, "R"), (2, "R"), (3, "R"), (10, "N"), (20, "N"), (30, "N")]
        )
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")
    r = [100, 200, 300]
    nn = [1000, 2000, 3000]

    def stats(xs):
        n = len(xs)
        m = sum(xs) / n
        s2 = sum((x - m) ** 2 for x in xs) / (n - 1)
        return n, m, s2

    n1, m1, v1 = stats(r)
    n2, m2, v2 = stats(nn)
    a1, a2 = v1 / n1, v2 / n2
    t = (m1 - m2) / math.sqrt(a1 + a2)
    df = (a1 + a2) ** 2 / (a1 * a1 / (n1 - 1) + a2 * a2 / (n2 - 1))
    row = QUERIES["lineitem_welch_ttest"](spark, sf).collect()[0]
    assert row["t_welch"] == pytest.approx(t, abs=1e-5)
    assert row["df"] == pytest.approx(df, abs=1e-2)


def test_kruskal_wallis_matches_loop(spark, tmp_path):
    """Buckets with ties across three priorities: H and the
    tie-corrected H from the plain midrank loop."""
    sf = str(tmp_path)
    # o_totalprice // 1000 buckets: values per group
    data = {"1-URGENT": [1, 2], "2-HIGH": [2, 3], "3-MEDIUM": [3, 3]}
    rows = []
    k = 1
    for prio, vs in data.items():
        for v in vs:
            rows.append(
                (k, k, "F", v * 1000.0 + 1, datetime(2024, 1, 5), prio)
            )
            k += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    allv = sorted(v for vs in data.values() for v in vs)
    n = len(allv)
    midrank = {}
    i = 0
    while i < len(allv):
        j = i
        while j < len(allv) and allv[j] == allv[i]:
            j += 1
        midrank[allv[i]] = (i + 1 + j) / 2.0
        i = j
    sum_rr = sum(
        (sum(midrank[v] for v in vs)) ** 2 / len(vs)
        for vs in data.values()
    )
    h = 12.0 / (n * (n + 1)) * sum_rr - 3.0 * (n + 1)
    from collections import Counter

    ties = sum(t ** 3 - t for t in Counter(allv).values())
    h_corr = h / (1 - ties / (n ** 3 - n))
    rows_out = QUERIES["orders_kruskal_wallis_priority"](
        spark, sf
    ).collect()
    got = rows_out[0]
    assert got["h_stat"] == pytest.approx(h, abs=1e-5)
    # tie-corrected column name: find it dynamically
    corr_cols = [c for c in rows_out[0].asDict() if "corr" in c or "tie" in c]
    if corr_cols:
        assert got[corr_cols[0]] == pytest.approx(h_corr, abs=1e-5)


def test_kendall_tau_hours_hand(spark, tmp_path):
    """Two hours: volume up, mean value down → one discordant pair,
    tau-b = −1."""
    sf = str(tmp_path)
    rows = [
        # hour 1: 1 event, value 5.0 (mean 5); hour 2: 2 events mean 2
        (1, datetime(2024, 1, 1, 1, 0), 1, "x", 5.0, "{}"),
        (2, datetime(2024, 1, 1, 2, 0), 2, "x", 2.0, "{}"),
        (3, datetime(2024, 1, 1, 2, 30), 3, "x", 2.0, "{}"),
    ]
    _write_events(spark, sf, rows)
    row = QUERIES["events_kendall_tau_hours"](spark, sf).collect()[0]
    assert row["n_pairs"] == 1
    assert row["concordant"] == 0 and row["discordant"] == 1
    assert row["tau_b"] == -1.0


def test_german_tank_hand(spark, tmp_path):
    """Keys {2, 6} in one nation: m = 6, k = 2 →
    estimate 6 + 6//2 − 1 = 8."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [(2, 1, "F", 1.0, datetime(2024, 1, 5), "1-URGENT"),
         (6, 1, "F", 1.0, datetime(2024, 1, 6), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    spark.createDataFrame(
        [(1, "c", 7, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/customer.parquet")
    spark.createDataFrame(
        [(7, "GERMANY", 3)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/nation.parquet")
    row = QUERIES["orders_german_tank"](spark, sf).collect()[0]
    assert row["n_obs"] == 2 and row["max_seen"] == 6
    assert row["est_total"] == 8 and row["err"] == 2


def test_friedman_matches_loop(spark, tmp_path):
    """Two full blocks, two priorities, identical orderings: ranks
    (1,2) in each block → Q from the plain rank-sum loop."""
    sf = str(tmp_path)
    rows = []
    k = 1
    # block = month; mean order value per (block, priority)
    for mo in (1, 2):
        for prio, price in [("1-URGENT", 10.0), ("2-HIGH", 20.0)]:
            rows.append(
                (k, k, "F", price, datetime(2024, mo, 5), prio)
            )
            k += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    n_blocks, kk = 2, 2
    rank_sums = {"1-URGENT": 2, "2-HIGH": 4}
    q = 12.0 / (n_blocks * kk * (kk + 1)) * sum(
        v * v for v in rank_sums.values()
    ) - 3.0 * n_blocks * (kk + 1)
    rows_out = QUERIES["orders_friedman_priority"](spark, sf).collect()
    got = {r["priority"]: r for r in rows_out}
    assert got["1-URGENT"]["rank_sum"] == 2
    assert got["2-HIGH"]["rank_sum"] == 4
    assert rows_out[0]["q_stat"] == pytest.approx(q, abs=1e-6)


def test_two_way_anova_matches_loop(spark, tmp_path):
    """2x2 balanced design with a planted interaction: all four SS
    terms and F ratios from the plain loop."""
    sf = str(tmp_path)
    # (flag, status) -> quantities
    cells = {
        ("A", "O"): [1, 3], ("A", "F"): [2, 4],
        ("R", "O"): [5, 7], ("R", "F"): [10, 12],
    }
    rows = []
    k = 1
    for (fl, st), qs in cells.items():
        for q in qs:
            rows.append((k, 1, 1, 1, float(q), 10.0, 0.0, 0.0, fl, st,
                         datetime(2024, 1, 2)))
            k += 1
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")
    allv = [q for qs in cells.values() for q in qs]
    nt = len(allv)
    gm = sum(allv) / nt
    sst = sum((x - gm) ** 2 for x in allv)
    ssw = sum(
        (x - sum(qs) / len(qs)) ** 2 for qs in cells.values() for x in qs
    )
    def margin(idx):
        groups = {}
        for key, qs in cells.items():
            groups.setdefault(key[idx], []).extend(qs)
        return sum(
            len(v) * (sum(v) / len(v) - gm) ** 2 for v in groups.values()
        )
    ssa, ssb = margin(0), margin(1)
    ssi = sst - ssw - ssa - ssb
    row = QUERIES["lineitem_two_way_anova"](spark, sf).collect()[0]
    assert row["ss_flag"] == pytest.approx(ssa, abs=1e-3)
    assert row["ss_status"] == pytest.approx(ssb, abs=1e-3)
    assert row["ss_interaction"] == pytest.approx(ssi, abs=1e-3)
    assert row["ss_within"] == pytest.approx(ssw, abs=1e-3)
    assert row["f_interaction"] == pytest.approx(
        (ssi / 1) / (ssw / (nt - 4)), abs=1e-4
    )


def test_gtest_matches_loop(spark, tmp_path):
    """2x2 brand x size-decade table: G = 2 Σ O ln(O·N/(R·C)) from the
    plain loop."""
    import math

    sf = str(tmp_path)
    cells = {("B1", 5): 30, ("B1", 15): 10, ("B2", 5): 10, ("B2", 15): 30}
    rows = []
    k = 1
    for (br, sz), c in cells.items():
        for _ in range(c):
            rows.append((k, f"p{k}", br, "T", sz, 1.0))
            k += 1
    spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/part.parquet")
    n = sum(cells.values())
    rt = {"B1": 40, "B2": 40}
    ct = {0: 40, 1: 40}
    g = 2 * sum(
        o * math.log(o * n / (rt[b] * ct[s // 10]))
        for (b, s), o in cells.items()
    )
    row = QUERIES["part_brand_size_gtest"](spark, sf).collect()[0]
    assert row["g_statistic"] == pytest.approx(g, abs=1e-5)
    assert row["df"] == 1


def test_pass_at_k_matches_loop(spark, tmp_path):
    """n = 10 attempts, c = 3 correct: pass@k = 1 − C(7,k)/C(10,k)
    from math.comb."""
    import math

    sf = str(tmp_path)
    rows = [
        (i + 1, f"t{i}", ("en" if i < 3 else "de"), "src", 10)
        for i in range(10)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    row = QUERIES["docs_pass_at_k"](spark, sf).collect()[0]
    for kk, col in [(1, "pass_at_1"), (5, "pass_at_5"), (10, "pass_at_10")]:
        expect = 1 - (math.comb(7, kk) / math.comb(10, kk)
                      if kk <= 7 else 0.0)
        assert row[col] == pytest.approx(expect, abs=1e-6), col


def test_ewma_chart_matches_recursion_replay(spark, tmp_path):
    """Hourly sums (10, 10, 40): replay the textbook z_0 = mu EWMA
    recursion with time-varying limits and demand identical counts and
    final value.  This test caught the variance factor starting at
    0.0625 instead of (1−λ)² = 0.5625 (digit transposition) with
    z_1 = y_1 instead of λy_1 + (1−λ)μ."""
    import math

    sf = str(tmp_path)
    rows = []
    eid = 0
    for hour, total in [(1, 10), (2, 10), (3, 40)]:
        eid += 1
        rows.append(
            (eid, datetime(2024, 1, 1, hour, 30), eid, "x", float(total),
             "{}")
        )
    _write_events(spark, sf, rows)
    ys = [10, 10, 40]
    n = len(ys)
    mu = sum(ys) / n
    sigma = math.sqrt(sum((y - mu) ** 2 for y in ys) / n)
    lam = 0.25
    z, fac, ooc = mu, 1.0, 0
    last = None
    for y in ys:
        z = lam * y + (1 - lam) * z
        fac *= (1 - lam) ** 2
        lim = 3 * sigma * math.sqrt(lam / (2 - lam) * (1 - fac))
        ooc += abs(z - mu) > lim
        last = z
    row = QUERIES["events_ewma_control_chart"](spark, sf).collect()[0]
    assert row["n_hours"] == 3
    assert row["mu"] == pytest.approx(mu, abs=1e-4)
    assert row["last_ewma"] == pytest.approx(last, abs=1e-4)
    assert row["n_out_of_control"] == ooc


def test_page_hinkley_convention_documented(spark, tmp_path):
    """Weekly counts (10, 10, 40): PH follows the Gama-survey
    convention min over t ≥ 1 (NOT the CUSUM empty-prefix baseline) —
    pinned here so the distinction with events_cusum_tabular stays
    deliberate."""
    sf = str(tmp_path)
    rows = []
    k = 1
    for day, c in [(1, 10), (8, 10), (15, 40)]:
        for _ in range(c):
            rows.append(
                (k, k, "F", 1.0, datetime(2024, 1, day), "1-URGENT")
            )
            k += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    # m_t with milli-quantized terms x*1000 - (S*1000)//t
    xs = [10, 10, 40]
    m, mmin, best = 0, None, None
    s = 0
    for t, x in enumerate(xs, 1):
        s += x
        m += x * 1000 - (s * 1000) // t
        mmin = m if mmin is None else min(mmin, m)
        ph = m - mmin
        best = max(best, ph) if best is not None else ph
    row = QUERIES["orders_page_hinkley"](spark, sf).collect()[0]
    assert row["ph_milli"] == best


def test_holt_winters_matches_recursion_replay(spark, tmp_path):
    """26 months of revenue with a planted 12-month cycle: replay the
    full additive HW triple recursion (alpha=0.5, beta=gamma=0.25,
    m=12, two-season init) in python and demand identical level,
    trend, MAE, and next forecast."""
    sf = str(tmp_path)
    ys = [100 + 10 * (i % 12) + 2 * i for i in range(26)]
    rows = []
    k = 1
    for i, y in enumerate(ys):
        yr, mo = 2020 + i // 12, i % 12 + 1
        rows.append((k, k, "F", float(y), datetime(yr, mo, 5),
                     "1-URGENT"))
        k += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    c = [y * 100.0 for y in ys]
    lev = sum(c[:12]) / 12
    tr = (sum(c[12:24]) / 12 - sum(c[:12]) / 12) / 12
    seas = [c[i] - lev for i in range(12)]
    sae = 0.0
    for i in range(12, len(c)):
        s0 = seas.pop(0)
        sae += abs(c[i] - (lev + tr + s0))
        new_lev = 0.5 * (c[i] - s0) + 0.5 * (lev + tr)
        tr = 0.25 * (new_lev - lev) + 0.75 * tr
        seas.append(0.25 * (c[i] - new_lev) + 0.75 * s0)
        lev = new_lev
    row = QUERIES["orders_holt_winters_additive"](spark, sf).collect()[0]
    assert row["n_months"] == 26
    assert row["level"] == pytest.approx(lev / 100, abs=1e-3)
    assert row["trend"] == pytest.approx(tr / 100, abs=1e-3)
    assert row["mae"] == pytest.approx(sae / (len(c) - 12) / 100, abs=1e-3)
    assert row["next_forecast"] == pytest.approx(
        (lev + tr + seas[0]) / 100, abs=1e-3
    )


def test_acf_matches_loop(spark, tmp_path):
    """Monthly revenue (1,2,3,4,2): ACF at lags 1-3 from the plain
    deviation-product loop."""
    sf = str(tmp_path)
    ys = [1, 2, 3, 4, 2]
    rows = []
    k = 1
    for i, y in enumerate(ys):
        rows.append((k, k, "F", float(y), datetime(2024, i + 1, 5),
                     "1-URGENT"))
        k += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    c = [y * 100 for y in ys]
    mu = sum(c) / len(c)
    d = [x - mu for x in c]
    d0 = sum(x * x for x in d)
    out = {r["lag"]: r["acf"] for r in
           QUERIES["orders_acf_monthly"](spark, sf).collect()}
    for k_ in (1, 2, 3):
        num = sum(d[i] * d[i + k_] for i in range(len(d) - k_))
        assert out[k_] == pytest.approx(num / d0, abs=1e-6), k_


def test_trimmed_mean_boundary_straddle(spark, tmp_path):
    """Ten balances with ties straddling the 10% trim boundary: the
    interval-overlap form must keep exactly the surviving copies."""
    sf = str(tmp_path)
    vals = [1.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 100.0, 100.0]
    rows = [
        (i + 1, f"s{i}", 1, "", float(v), "c")
        for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows,
        "s_suppkey long, s_name string, s_nationkey int, s_address string, "
        "s_acctbal double, s_phone string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/supplier.parquet")
    # trim 1 from each side: keep sorted[1:9]
    kept = sorted(vals)[1:9]
    row = QUERIES["supplier_acctbal_trimmed_mean"](spark, sf).collect()[0]
    assert row["n_kept"] == 8
    assert row["trimmed_mean"] == pytest.approx(sum(kept) / len(kept),
                                                abs=1e-4)


def test_cramer_von_mises_matches_loop(spark, tmp_path):
    """Purchases {1,3}, views {2,4}: T from the per-observation ECDF
    loop."""
    sf = str(tmp_path)
    rows = [
        (1, datetime(2024, 1, 1), 1, "purchase", 1.0, "{}"),
        (2, datetime(2024, 1, 1), 2, "purchase", 3.0, "{}"),
        (3, datetime(2024, 1, 1), 3, "view", 2.0, "{}"),
        (4, datetime(2024, 1, 1), 4, "view", 4.0, "{}"),
    ]
    _write_events(spark, sf, rows)
    p, q = [1, 3], [2, 4]
    np_, nq = len(p), len(q)
    combined = sorted(p + q)
    t = 0.0
    for x in combined:
        f = sum(1 for v in p if v <= x) / np_
        g = sum(1 for v in q if v <= x) / nq
        t += (f - g) ** 2
    t *= np_ * nq / (np_ + nq) ** 2
    row = QUERIES["events_cramer_von_mises"](spark, sf).collect()[0]
    assert row["cvm_t"] == pytest.approx(t, abs=1e-6)


def test_ses_matches_recursion_replay(spark, tmp_path):
    """Monthly revenue (1,2,4) for one priority: SES fold
    (alpha = 0.25, s1 = y1) and the one-step-ahead MAE replayed."""
    sf = str(tmp_path)
    _write_orders(spark, sf, {
        ("1-URGENT", 2024, 1): 1,
        ("1-URGENT", 2024, 2): 2,
        ("1-URGENT", 2024, 3): 4,
    })
    # _write_orders writes 100.00 per order, so monthly cent sums are
    # 10000 x the order counts
    cs = [10000.0, 20000.0, 40000.0]
    s, sae = cs[0], 0.0
    for y in cs[1:]:
        sae += abs(y - s)
        s = 0.25 * y + 0.75 * s
    row = QUERIES["orders_ses_monthly_by_priority"](spark, sf).collect()[0]
    assert row["n_months"] == 3
    assert row["ses_level"] == pytest.approx(s / 100, abs=1e-4)
    assert row["mae"] == pytest.approx(sae / 2 / 100, abs=1e-4)


def test_ece_two_bins_hand(spark, tmp_path):
    """Scores in two bins with known accuracy: per-bin confidence and
    accuracy ppm plus the weighted ECE from a plain loop.  The score
    is the deterministic repo quality score, so the test recomputes
    the same bins from the query's own per-bin sums rather than
    predicting scores — it checks the CALIBRATION algebra."""
    sf = str(tmp_path)
    rows = [
        (i + 1, ("the and of to in is that for " * 6 if i < 3
                 else "zzz qqq"), ("en" if i < 2 else "de"), "src", 200)
        for i in range(6)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = QUERIES["docs_quality_ece"](spark, sf).collect()
    total = sum(r["n"] for r in out)
    wsum = sum(r["n"] * abs(r["conf_ppm"] - r["acc_ppm"]) for r in out)
    for r in out:
        assert r["acc_ppm"] == r["n_pos"] * 1000000 // r["n"]
        assert r["gap_ppm"] == abs(r["conf_ppm"] - r["acc_ppm"])
        assert r["ece_ppm"] == wsum // total


# ---------------------------------------------------------------------------
# Battery E (round 12): independent-loop expectations — each expected value
# is recomputed in the test from the textbook per-observation definition
# with plain python loops, sharing NO grid algebra with the queries.
# ---------------------------------------------------------------------------

_E_A = [1, 3, 3, 5, 8, 9, 9, 12]
_E_R = [2, 3, 6, 6, 10, 11]


def _midranks(values):
    s = sorted(values)
    pos = {}
    for idx, v in enumerate(s):
        pos.setdefault(v, []).append(idx + 1)
    return {v: sum(p) / len(p) for v, p in pos.items()}


def test_brunner_munzel_loop(spark, tmp_path):
    """BM statistic/df/p_hat vs a direct placement-variance loop over the
    Brunner-Munzel (2000) definition on a tied two-sample corpus."""
    import math

    sf = str(tmp_path)
    _write_lineitem(
        spark, sf,
        [(q, "A") for q in _E_A] + [(q, "R") for q in _E_R],
    )
    x, y = _E_A, _E_R
    nx, ny = len(x), len(y)
    mr, mrx, mry = _midranks(x + y), _midranks(x), _midranks(y)
    rcx_mean = sum(mr[v] for v in x) / nx
    rcy_mean = sum(mr[v] for v in y) / ny
    sx = sum(
        (mr[v] - mrx[v] - rcx_mean + (nx + 1) / 2) ** 2 for v in x
    ) / (nx - 1)
    sy = sum(
        (mr[v] - mry[v] - rcy_mean + (ny + 1) / 2) ** 2 for v in y
    ) / (ny - 1)
    w = nx * ny * (rcy_mean - rcx_mean) / (
        (nx + ny) * math.sqrt(nx * sx + ny * sy)
    )
    df = (nx * sx + ny * sy) ** 2 / (
        (nx * sx) ** 2 / (nx - 1) + (ny * sy) ** 2 / (ny - 1)
    )
    p_hat = (rcy_mean - (ny + 1) / 2) / nx
    row = QUERIES["lineitem_brunner_munzel"](spark, sf).collect()[0]
    assert row["n_flag_a"] == nx and row["n_flag_r"] == ny
    assert row["p_hat"] == pytest.approx(p_hat, abs=1e-6)
    assert row["bm_stat"] == pytest.approx(w, abs=1e-6)
    assert row["df_hat"] == pytest.approx(df, abs=1e-4)


def test_mrpp_loop(spark, tmp_path):
    """MRPP delta / expected / agreement vs plain pairwise |x−y| loops
    over three groups."""
    sf = str(tmp_path)
    groups = {"A": _E_A, "R": _E_R, "N": [4, 4, 7]}
    _write_lineitem(
        spark, sf,
        [(q, f) for f, vals in groups.items() for q in vals],
    )

    def xi(vals):
        n = len(vals)
        return sum(abs(a - b) for a in vals for b in vals) / (n * (n - 1))

    allv = [v for g in groups.values() for v in g]
    n_tot = len(allv)
    delta = sum(len(g) / n_tot * xi(g) for g in groups.values())
    expected = xi(allv)
    row = QUERIES["lineitem_mrpp_flags"](spark, sf).collect()[0]
    assert row["n_total"] == n_tot
    assert row["delta"] == pytest.approx(delta, abs=1e-6)
    assert row["expected_delta"] == pytest.approx(expected, abs=1e-6)
    assert row["agreement_a"] == pytest.approx(1 - delta / expected, abs=1e-6)


def test_power_divergence_loop(spark, tmp_path):
    """Freeman-Tukey / Neyman / lambda=2 members vs a direct cell loop on
    a 2x3 grid WITH a structural zero cell (FT must add 4e there)."""
    import math
    from datetime import datetime

    sf = str(tmp_path)
    counts = {("1-URGENT", "F"): 12, ("1-URGENT", "O"): 5,
              ("1-URGENT", "P"): 3, ("5-LOW", "F"): 6,
              ("5-LOW", "O"): 9}  # (5-LOW, P) is the structural zero
    rows, key = [], 1
    for (prio, status), c in counts.items():
        for _ in range(c):
            rows.append((key, key, status, 100.0,
                         datetime(2024, 1, 15), prio))
            key += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/orders.parquet")

    prios = sorted({k[0] for k in counts})
    stats = sorted({k[1] for k in counts})
    n = sum(counts.values())
    rt = {p: sum(v for k, v in counts.items() if k[0] == p) for p in prios}
    ct = {s: sum(v for k, v in counts.items() if k[1] == s) for s in stats}
    ft = ney = pd2 = 0.0
    for p in prios:
        for s in stats:
            o = counts.get((p, s), 0)
            e = rt[p] * ct[s] / n
            ft += 4 * (math.sqrt(o) - math.sqrt(e)) ** 2
            if o > 0:
                ney += (o - e) ** 2 / o
                pd2 += o * ((o / e) ** 2 - 1) / 3
    row = QUERIES["orders_power_divergence"](spark, sf).collect()[0]
    assert row["n_obs"] == n and row["n_cells"] == 6 and row["df"] == 2
    assert row["ft_t2"] == pytest.approx(ft, abs=1e-6)
    assert row["neyman_x2"] == pytest.approx(ney, abs=1e-6)
    assert row["pd_lambda2"] == pytest.approx(pd2, abs=1e-6)


def test_hodges_lehmann_loop(spark, tmp_path):
    """HL shift and the 2.5%/97.5% pairwise-difference ordinates vs the
    fully materialized sorted Walsh-difference list."""
    import math

    sf = str(tmp_path)
    _write_lineitem(
        spark, sf,
        [(q, "A") for q in _E_A] + [(q, "R") for q in _E_R],
    )
    d = sorted(a - b for a in _E_A for b in _E_R)
    t = len(d)
    med = (d[(t + 1) // 2 - 1] + d[(t + 2) // 2 - 1]) / 2
    row = QUERIES["lineitem_hodges_lehmann"](spark, sf).collect()[0]
    assert row["n_pairs"] == t
    assert row["hl_shift"] == pytest.approx(med, abs=1e-9)
    assert row["d_p025"] == d[max(1, math.ceil(t / 40)) - 1]
    assert row["d_p975"] == d[min(t, math.ceil(39 * t / 40)) - 1]


def test_lepage_loop(spark, tmp_path):
    """Lepage D vs direct midrank Wilcoxon + positional Ansari-Bradley
    score loops (tie blocks averaged per the midrank convention)."""
    from collections import Counter, defaultdict

    sf = str(tmp_path)
    _write_lineitem(
        spark, sf,
        [(q, "A") for q in _E_A] + [(q, "R") for q in _E_R],
    )
    x, y = _E_A, _E_R
    n1, n2 = len(x), len(y)
    nn = n1 + n2
    mr = _midranks(x + y)
    w = sum(mr[v] for v in x)
    tiesum = sum(t ** 3 - t for t in Counter(x + y).values())
    varw = n1 * n2 / 12 * ((nn + 1) - tiesum / (nn * (nn - 1)))
    zw2 = (w - n1 * (nn + 1) / 2) ** 2 / varw
    s = sorted(x + y)
    posv = defaultdict(list)
    for i, v in enumerate(s):
        posv[v].append(min(i + 1, nn - i))
    av = {v: sum(ps) / len(ps) for v, ps in posv.items()}
    ab = sum(av[v] for v in x)
    ssum = sum(min(p, nn + 1 - p) for p in range(1, nn + 1))
    suma2 = sum(len(ps) * (sum(ps) / len(ps)) ** 2 for ps in posv.values())
    varab = n1 * n2 * (nn * suma2 - ssum ** 2) / (nn ** 2 * (nn - 1))
    zab2 = (ab - n1 * ssum / nn) ** 2 / varab
    row = QUERIES["lineitem_lepage_flags"](spark, sf).collect()[0]
    assert row["wilcoxon_z2"] == pytest.approx(zw2, abs=1e-6)
    assert row["ab_z2"] == pytest.approx(zab2, abs=1e-6)
    assert row["lepage_d"] == pytest.approx(zw2 + zab2, abs=1e-6)


def test_fleiss_kappa_loop(spark, tmp_path):
    """Fleiss kappa vs the per-subject P_i loop on seven 3-rater
    subjects; orders with a line count other than 3 must be excluded."""
    from datetime import datetime

    sf = str(tmp_path)
    subjects = [("A", "A", "A"), ("A", "N", "A"), ("R", "R", "N"),
                ("N", "N", "N"), ("A", "R", "N"), ("R", "R", "R"),
                ("A", "A", "N")]
    rows = []
    for i, s in enumerate(subjects):
        for j, flag in enumerate(s):
            rows.append((i + 1, 1, 1, j + 1, 5.0, 10.0, 0.0, 0.0, flag,
                         "O", datetime(2024, 1, 2)))
    # a 2-line and a 4-line order, both all-'A': must not enter
    rows += [(100, 1, 1, k, 5.0, 10.0, 0.0, 0.0, "A", "O",
              datetime(2024, 1, 2)) for k in (1, 2)]
    rows += [(101, 1, 1, k, 5.0, 10.0, 0.0, 0.0, "A", "O",
              datetime(2024, 1, 2)) for k in (1, 2, 3, 4)]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")

    cats = ["A", "N", "R"]
    ns = len(subjects)
    tj = {c: 0 for c in cats}
    pi = []
    for s in subjects:
        nij = {c: s.count(c) for c in cats}
        for c in cats:
            tj[c] += nij[c]
        pi.append((sum(v * v for v in nij.values()) - 3) / 6)
    p_bar = sum(pi) / ns
    p_e = sum((tj[c] / (3 * ns)) ** 2 for c in cats)
    row = QUERIES["orders_fleiss_kappa"](spark, sf).collect()[0]
    assert row["n_subjects"] == ns
    assert row["p_bar"] == pytest.approx(p_bar, abs=1e-6)
    assert row["p_e"] == pytest.approx(p_e, abs=1e-6)
    assert row["fleiss_kappa"] == pytest.approx(
        (p_bar - p_e) / (1 - p_e), abs=1e-6
    )


def test_weighted_kappa_loop(spark, tmp_path):
    """Linear/quadratic weighted kappa vs the classic weight-matrix
    definition (p_o - p_e)/(1 - p_e) with w = 1 - (|i-j|/(k-1))^m —
    algebraically independent of the query's penalty-ratio identity."""
    from datetime import datetime

    sf = str(tmp_path)
    # (priority level i 0..4, price band j 0..4) -> count; bands are
    # <50k, <100k, <150k, <250k, >=250k dollars
    cells = {(0, 0): 10, (0, 1): 3, (1, 1): 12, (1, 2): 2, (2, 2): 8,
             (2, 0): 4, (3, 3): 6, (3, 4): 1, (4, 4): 9, (4, 0): 2}
    prices = [25000.0, 75000.0, 125000.0, 200000.0, 300000.0]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SO", "5-LOW"]
    rows, key = [], 1
    for (i, j), c in cells.items():
        for _ in range(c):
            rows.append((key, key, "F", prices[j],
                         datetime(2024, 1, 15), prios[i]))
            key += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/orders.parquet")

    n = sum(cells.values())
    rk = [sum(c for (i, j), c in cells.items() if i == lvl)
          for lvl in range(5)]
    ck = [sum(c for (i, j), c in cells.items() if j == lvl)
          for lvl in range(5)]
    expect = {}
    for m in (1, 2):
        po = sum((1 - (abs(i - j) / 4) ** m) * c
                 for (i, j), c in cells.items()) / n
        pe = sum((1 - (abs(i - j) / 4) ** m) * rk[i] * ck[j]
                 for i in range(5) for j in range(5)) / n ** 2
        expect[m] = (po - pe) / (1 - pe)
    row = QUERIES["orders_weighted_kappa"](spark, sf).collect()[0]
    assert row["n_orders"] == n
    assert row["kappa_linear"] == pytest.approx(expect[1], abs=1e-6)
    assert row["kappa_quadratic"] == pytest.approx(expect[2], abs=1e-6)


def test_cochran_armitage_loop(spark, tmp_path):
    """CA trend z vs the textbook (sum s*r - p_bar*sum s*n) /
    sqrt(p(1-p)(sum s^2 n - (sum s n)^2/N)) per-group loop."""
    import math

    sf = str(tmp_path)
    groups = {1: (30, 5), 2: (25, 8), 3: (20, 12), 5: (10, 9)}
    qty_flags = []
    for v, (nv, rv) in groups.items():
        qty_flags += [(v, "R")] * rv + [(v, "N")] * (nv - rv)
    _write_lineitem(spark, sf, qty_flags)
    n = sum(nv for nv, _ in groups.values())
    r = sum(rv for _, rv in groups.values())
    ssr = sum(v * rv for v, (_, rv) in groups.items())
    ssn = sum(v * nv for v, (nv, _) in groups.items())
    ss2n = sum(v * v * nv for v, (nv, _) in groups.items())
    p = r / n
    z = (ssr - p * ssn) / math.sqrt(
        p * (1 - p) * (ss2n - ssn * ssn / n)
    )
    row = QUERIES["lineitem_cochran_armitage"](spark, sf).collect()[0]
    assert row["n_lines"] == n and row["n_returned"] == r
    assert row["ca_z"] == pytest.approx(z, abs=1e-6)


def test_stuart_maxwell_matrix_inverse(spark, tmp_path):
    """The k=3 closed form vs the DEFINING d' V^-1 d quadratic form
    (numpy inverse over the first two categories), plus Bowker's
    off-diagonal McNemar sum — on a hand-built 3x3 paired table."""
    from datetime import datetime

    import numpy as np

    sf = str(tmp_path)
    table = {("A", "A"): 20, ("A", "N"): 5, ("A", "R"): 3,
             ("N", "A"): 8, ("N", "N"): 15, ("N", "R"): 4,
             ("R", "A"): 2, ("R", "N"): 6, ("R", "R"): 30}
    rows, key = [], 1
    for (f1, f2), c in table.items():
        for _ in range(c):
            rows.append((key, 1, 1, 1, 5.0, 10.0, 0.0, 0.0, f1, "O",
                         datetime(2024, 1, 2)))
            rows.append((key, 1, 1, 2, 7.0, 10.0, 0.0, 0.0, f2, "O",
                         datetime(2024, 1, 2)))
            key += 1
    # a 1-line order is excluded (no second rating); a 3-line order
    # still contributes its FIRST TWO lines — (R, R) here
    rows.append((900, 1, 1, 1, 5.0, 10.0, 0.0, 0.0, "A", "O",
                 datetime(2024, 1, 2)))
    rows += [(901, 1, 1, k, 5.0, 10.0, 0.0, 0.0, "R", "O",
              datetime(2024, 1, 2)) for k in (1, 2, 3)]
    table[("R", "R")] += 1
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")

    cats = ["A", "N", "R"]
    nm = np.array(
        [[table[(a, b)] for b in cats] for a in cats], dtype=float
    )
    dvec = nm.sum(axis=1) - nm.sum(axis=0)
    v = np.zeros((2, 2))
    for i in range(2):
        for j in range(2):
            v[i, j] = (
                nm.sum(axis=1)[i] + nm.sum(axis=0)[i] - 2 * nm[i, i]
                if i == j else -(nm[i, j] + nm[j, i])
            )
    sm_expected = float(dvec[:2] @ np.linalg.inv(v) @ dvec[:2])
    bowker = sum(
        (nm[i, j] - nm[j, i]) ** 2 / (nm[i, j] + nm[j, i])
        for i in range(3) for j in range(i + 1, 3)
    )
    row = QUERIES["lineitem_marginal_homogeneity"](spark, sf).collect()[0]
    assert row["n_pairs"] == int(nm.sum())
    assert row["stuart_maxwell_chi2"] == pytest.approx(
        sm_expected, abs=1e-6
    )
    assert row["bowker_chi2"] == pytest.approx(bowker, abs=1e-6)


def test_single_row_sample_returns_null_not_crash(spark, tmp_path):
    """nn = 1 (one 'A' line, no 'R') made the Ansari-Bradley variance
    denominator nn^2(nn-1) exactly 0 — Spark raised ANSI
    DIVIDE_BY_ZERO while DuckDB's double x/0 returns NULL (r12 review
    finding).  Both the battery-D AB query and its battery-E Lepage
    consumer must return a NULL-statistic row instead."""
    sf = str(tmp_path)
    _write_lineitem(spark, sf, [(5, "A")])
    row = QUERIES["lineitem_ansari_bradley"](spark, sf).collect()[0]
    assert row["z_score"] is None
    row = QUERIES["lineitem_lepage_flags"](spark, sf).collect()[0]
    assert row["ab_z2"] is None and row["lepage_d"] is None
    # two equal rows in one group: nn = 2 -> variance 0 -> still NULL
    _write_lineitem(spark, sf, [(5, "A"), (5, "A")])
    row = QUERIES["lineitem_lepage_flags"](spark, sf).collect()[0]
    assert row["lepage_d"] is None


def test_hist_buckets_null_price_and_zero_width(spark, tmp_path):
    """A NULL price keeps a NULL bucket (SQL propagation — neither
    COALESCE's bucket 0 nor LEAST's null-skipping 19); an all-equal
    corpus lands every row in bucket 0 instead of dividing by zero."""
    from datetime import datetime

    sf = str(tmp_path)

    def _orders(prices):
        rows = [
            (i + 1, i + 1, "F", p, datetime(2024, 1, 15), "1-URGENT")
            for i, p in enumerate(prices)
        ]
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, "
            "o_orderpriority string",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{sf}/orders.parquet"
        )

    _orders([100.0, 200.0, None])
    got = {
        r["bucket"]: r["n"]
        for r in QUERIES["hist_price_buckets"](spark, sf).collect()
    }
    assert got[None] == 1 and got[0] == 1 and got[19] == 1
    _orders([150.0, 150.0, 150.0])
    rows = QUERIES["hist_price_buckets"](spark, sf).collect()
    assert len(rows) == 1 and rows[0]["bucket"] == 0 and rows[0]["n"] == 3
