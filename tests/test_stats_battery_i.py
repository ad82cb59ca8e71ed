"""Known-value checks for the round-14 statistics battery I.

Same contract as batteries D-H: tests written FIRST, expectations
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


def _write_lineitem(spark, path, rows):
    """rows: (orderkey, linenumber, quantity, discount, returnflag)."""
    data = [
        (ok, 1, 1, ln, float(q), 10.0, float(d), 0.0, f, "O",
         datetime(2024, 1, 2))
        for ok, ln, q, d, f in rows
    ]
    spark.createDataFrame(
        data,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")


def _write_geo(spark, path, regions, nations, suppliers):
    spark.createDataFrame(
        regions, "r_regionkey int, r_name string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/region.parquet")
    spark.createDataFrame(
        nations, "n_nationkey int, n_name string, n_regionkey int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/nation.parquet")
    spark.createDataFrame(
        suppliers,
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/supplier.parquet")


# --- 1. Breslow-Day homogeneity of odds ratios ------------------------------


def _breslow_day_python(strata, psi):
    """Independent replication of Breslow-Day (1980) with the Tarone
    (1985) correction, given the common-OR estimate psi."""
    bd = 0.0
    sum_dev = 0.0
    sum_var = 0.0
    for a, b, c, d in strata:
        n = a + b + c + d
        r1, c1 = a + b, a + c
        if abs(psi - 1.0) < 1e-15:
            atil = r1 * c1 / n
        else:
            qa = psi - 1.0
            qb = -(psi * (r1 + c1) + (n - r1 - c1))
            qc = psi * r1 * c1
            disc = math.sqrt(qb * qb - 4 * qa * qc)
            atil = (-qb - disc) / (2 * qa)
            lo, hi = max(0.0, r1 + c1 - n), min(r1, c1)
            if not (lo - 1e-9 <= atil <= hi + 1e-9):
                atil = (-qb + disc) / (2 * qa)
        var = 1.0 / (1.0 / atil + 1.0 / (r1 - atil) + 1.0 / (c1 - atil)
                     + 1.0 / (n - r1 - c1 + atil))
        bd += (a - atil) ** 2 / var
        sum_dev += a - atil
        sum_var += var
    return bd, bd - sum_dev ** 2 / sum_var


def test_breslow_day_vs_python(spark, tmp_path):
    """Two month-strata of the urgent x finished 2x2 with different
    ORs; psi is the Mantel-Haenszel pooled estimate."""
    sf = str(tmp_path)
    strata = [(6, 2, 3, 9), (4, 6, 5, 5)]  # (a, b, c, d) per month
    rows, key = [], 1
    for mo, (a, b, c, d) in enumerate(strata, start=1):
        cells = ([("1-URGENT", "F")] * a + [("1-URGENT", "O")] * b
                 + [("5-LOW", "F")] * c + [("5-LOW", "O")] * d)
        for prio, status in cells:
            rows.append((key, key, status, 10.0,
                         datetime(2024, mo, 10), prio))
            key += 1
    _write_orders(spark, sf, rows)
    psi_num = sum(a * d / (a + b + c + d) for a, b, c, d in strata)
    psi_den = sum(b * c / (a + b + c + d) for a, b, c, d in strata)
    psi = psi_num / psi_den
    bd, tarone = _breslow_day_python(strata, psi)
    r = QUERIES["orders_breslow_day"](spark, sf).collect()[0]
    assert r["n_strata"] == 2
    assert r["psi_mh"] == pytest.approx(psi, abs=1e-6)
    assert r["bd_stat"] == pytest.approx(bd, abs=1e-5)
    assert r["tarone_stat"] == pytest.approx(tarone, abs=1e-5)


# --- 2. Bhapkar marginal homogeneity ----------------------------------------


def test_bhapkar_vs_matrix_form(spark, tmp_path):
    """Bhapkar W against the DEFINING d'(V - dd'/n)^-1 d via numpy on
    the same 3x3 paired table, and the identity W = Q/(1 - Q/n)
    against an independently computed Stuart-Maxwell Q."""
    np = pytest.importorskip("numpy")
    sf = str(tmp_path)
    # paired flags (f1, f2) with counts
    table = {("A", "A"): 5, ("A", "N"): 3, ("A", "R"): 2,
             ("N", "A"): 1, ("N", "N"): 6, ("N", "R"): 4,
             ("R", "A"): 2, ("R", "N"): 1, ("R", "R"): 7}
    rows, ok = [], 1
    for (f1, f2), k in table.items():
        for _ in range(k):
            rows.append((ok, 1, 1, 0.0, f1))
            rows.append((ok, 2, 1, 0.0, f2))
            ok += 1
    _write_lineitem(spark, sf, rows)
    n = sum(table.values())
    cats = ["A", "N", "R"]
    nij = {(i, j): table[(ci, cj)] for i, ci in enumerate(cats)
           for j, cj in enumerate(cats)}
    d = np.array([
        sum(nij[(0, j)] for j in range(3))
        - sum(nij[(i, 0)] for i in range(3)),
        sum(nij[(1, j)] for j in range(3))
        - sum(nij[(i, 1)] for i in range(3)),
    ], dtype=float)
    v = np.zeros((2, 2))
    for i in range(2):
        for j in range(2):
            if i == j:
                ri = sum(nij[(i, k)] for k in range(3))
                ci = sum(nij[(k, i)] for k in range(3))
                v[i, i] = ri + ci - 2 * nij[(i, i)]
            else:
                v[i, j] = -(nij[(i, j)] + nij[(j, i)])
    q_sm = float(d @ np.linalg.inv(v) @ d)
    w_def = float(d @ np.linalg.inv(v - np.outer(d, d) / n) @ d)
    w_identity = q_sm / (1.0 - q_sm / n)
    assert w_def == pytest.approx(w_identity, abs=1e-9)
    r = QUERIES["lineitem_bhapkar_mh"](spark, sf).collect()[0]
    assert r["n_pairs"] == n
    assert r["sm_chi2"] == pytest.approx(q_sm, abs=1e-5)
    assert r["bhapkar_w"] == pytest.approx(w_def, abs=1e-5)


# --- 3. Cox-Stuart trend test ------------------------------------------------


def test_cox_stuart_increasing(spark, tmp_path):
    """Monthly order counts 1..6: pairs (1,4),(2,5),(3,6) all increase
    -> S+ = 3, n' = 3, z = (3 - 1.5)/sqrt(0.75) = 1.732051."""
    sf = str(tmp_path)
    rows, key = [], 1
    for mo in range(1, 7):
        for _ in range(mo):
            rows.append((key, key, "F", 10.0, datetime(2024, mo, 10),
                         "1-URGENT"))
            key += 1
    _write_orders(spark, sf, rows)
    r = QUERIES["orders_cox_stuart_monthly"](spark, sf).collect()[0]
    assert r["n_pairs"] == 3
    assert r["s_plus"] == 3
    assert r["z_score"] == pytest.approx(1.732051, abs=1e-6)


def test_cox_stuart_odd_months_drops_middle(spark, tmp_path):
    """5 months: the middle month is dropped (standard convention);
    counts 3,1,9,2,5 -> pairs (3,2),(1,5): S+ = 1, n' = 2, z = 0."""
    sf = str(tmp_path)
    rows, key = [], 1
    for mo, k in enumerate([3, 1, 9, 2, 5], start=1):
        for _ in range(k):
            rows.append((key, key, "F", 10.0, datetime(2024, mo, 10),
                         "1-URGENT"))
            key += 1
    _write_orders(spark, sf, rows)
    r = QUERIES["orders_cox_stuart_monthly"](spark, sf).collect()[0]
    assert r["n_pairs"] == 2
    assert r["s_plus"] == 1
    assert r["z_score"] == pytest.approx(0.0, abs=1e-9)


# --- 4. Bartels rank von Neumann ----------------------------------------------


def test_bartels_rvn_increasing(spark, tmp_path):
    """Counts 1,2,3,4 over 4 months: ranks 1..4, NM = 3, D = 5,
    RVN = 0.6, Var = 4*2*(80-8-9)/(5*4*5*9) = 0.56,
    z = (0.6-2)/sqrt(0.56) = -1.870829."""
    sf = str(tmp_path)
    rows, key = [], 1
    for mo in range(1, 5):
        for _ in range(mo):
            rows.append((key, key, "F", 10.0, datetime(2024, mo, 10),
                         "1-URGENT"))
            key += 1
    _write_orders(spark, sf, rows)
    r = QUERIES["orders_bartels_rvn_monthly"](spark, sf).collect()[0]
    assert r["n_months"] == 4
    assert r["rvn"] == pytest.approx(0.6, abs=1e-9)
    assert r["z_score"] == pytest.approx(-1.870829, abs=1e-6)


def test_bartels_rvn_ties_vs_python(spark, tmp_path):
    """Tied counts replayed by an independent Python loop (midranks)."""
    sf = str(tmp_path)
    counts = [2, 5, 2, 7, 5, 2]
    rows, key = [], 1
    for mo, k in enumerate(counts, start=1):
        for _ in range(k):
            rows.append((key, key, "F", 10.0, datetime(2024, mo, 10),
                         "1-URGENT"))
            key += 1
    _write_orders(spark, sf, rows)
    n = len(counts)
    srt = sorted(counts)
    mid = {}
    for v in set(counts):
        pos = [i + 1 for i, x in enumerate(srt) if x == v]
        mid[v] = sum(pos) / len(pos)
    ranks = [mid[c] for c in counts]
    nm = sum((ranks[i] - ranks[i + 1]) ** 2 for i in range(n - 1))
    rbar = (n + 1) / 2.0
    dd = sum((r - rbar) ** 2 for r in ranks)
    rvn = nm / dd
    var = 4.0 * (n - 2) * (5 * n * n - 2 * n - 9) / (
        5.0 * n * (n + 1) * (n - 1) ** 2)
    z = (rvn - 2.0) / math.sqrt(var)
    r = QUERIES["orders_bartels_rvn_monthly"](spark, sf).collect()[0]
    assert r["rvn"] == pytest.approx(rvn, abs=1e-6)
    assert r["z_score"] == pytest.approx(z, abs=1e-6)


# --- 5. Hartley Fmax + Cochran's C --------------------------------------------


def test_hartley_cochran_hand(spark, tmp_path):
    """A={1,3} s2=2, N={2,6} s2=8, R={4,4} s2=0 -> min variance 0:
    Fmax NULL (guarded), C = 8/10 = 0.8."""
    sf = str(tmp_path)
    rows = [(1, 1, 1, 0.0, "A"), (2, 1, 3, 0.0, "A"),
            (3, 1, 2, 0.0, "N"), (4, 1, 6, 0.0, "N"),
            (5, 1, 4, 0.0, "R"), (6, 1, 4, 0.0, "R")]
    _write_lineitem(spark, sf, rows)
    r = QUERIES["lineitem_hartley_cochran"](spark, sf).collect()[0]
    assert r["n_groups"] == 3
    assert r["fmax"] is None
    assert r["cochran_c"] == pytest.approx(0.8, abs=1e-9)


def test_hartley_cochran_positive(spark, tmp_path):
    """A={1,3} s2=2, N={2,6} s2=8: Fmax = 4, C = 0.8."""
    sf = str(tmp_path)
    rows = [(1, 1, 1, 0.0, "A"), (2, 1, 3, 0.0, "A"),
            (3, 1, 2, 0.0, "N"), (4, 1, 6, 0.0, "N")]
    _write_lineitem(spark, sf, rows)
    r = QUERIES["lineitem_hartley_cochran"](spark, sf).collect()[0]
    assert r["fmax"] == pytest.approx(4.0, abs=1e-9)
    assert r["cochran_c"] == pytest.approx(0.8, abs=1e-9)


# --- 6. Geary's kurtosis (mean-deviation ratio) -------------------------------


def test_geary_kurtosis_hand(spark, tmp_path):
    """Quantities {1,1,3,3}: mean 2, MD = 1, sigma = 1 -> a = 1,
    z = (1 - 0.7978845608)*sqrt(4)/0.2661."""
    sf = str(tmp_path)
    rows = [(i + 1, 1, q, 0.0, "N") for i, q in enumerate([1, 1, 3, 3])]
    _write_lineitem(spark, sf, rows)
    r = QUERIES["lineitem_geary_kurtosis"](spark, sf).collect()[0]
    assert r["geary_a"] == pytest.approx(1.0, abs=1e-9)
    z = (1.0 - 0.7978845608028654) * 2.0 / 0.2661
    assert r["z_score"] == pytest.approx(z, abs=1e-5)


# --- 7. Moran's I + Geary's C over region adjacency ---------------------------


def test_moran_geary_vs_python(spark, tmp_path):
    """4 nations in 2 regions; x = total supplier balance per nation.
    w_ij = 1 iff same region and i != j.  Replicated independently."""
    sf = str(tmp_path)
    regions = [(0, "R0"), (1, "R1")]
    nations = [(0, "N0", 0), (1, "N1", 0), (2, "N2", 1), (3, "N3", 1)]
    bal = {0: 10.0, 1: 30.0, 2: 20.0, 3: 80.0}
    suppliers = [(i + 1, f"s{i}", nk, b) for i, (nk, b) in
                 enumerate(bal.items())]
    _write_geo(spark, sf, regions, nations, suppliers)
    xs = [bal[i] for i in range(4)]
    region_of = {0: 0, 1: 0, 2: 1, 3: 1}
    n = 4
    xbar = sum(xs) / n
    z = [x - xbar for x in xs]
    pairs = [(i, j) for i in range(n) for j in range(n)
             if i != j and region_of[i] == region_of[j]]
    w = len(pairs)
    moran = (n / w) * sum(z[i] * z[j] for i, j in pairs) / sum(
        zi * zi for zi in z)
    geary = ((n - 1) / (2.0 * w)) * sum(
        (xs[i] - xs[j]) ** 2 for i, j in pairs) / sum(zi * zi for zi in z)
    r = QUERIES["nations_moran_geary_balance"](spark, sf).collect()[0]
    assert r["n_nations"] == 4
    assert r["w_pairs"] == w
    assert r["morans_i"] == pytest.approx(moran, abs=1e-6)
    assert r["gearys_c"] == pytest.approx(geary, abs=1e-6)


# --- 8/9. Monthly-OLS diagnostics: Breusch-Pagan + Chow -----------------------


def _monthly_ols_python(counts_by_month):
    """Simple OLS of monthly revenue on 1-based month index; returns
    (xs, ys, residuals)."""
    xs = list(range(1, len(counts_by_month) + 1))
    ys = counts_by_month
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    e = [y - a - b * x for x, y in zip(xs, ys)]
    return xs, ys, e


def test_breusch_pagan_monthly_vs_python(spark, tmp_path):
    """BP = n * R^2 of the auxiliary regression of e^2 on the month
    index, replicated independently."""
    sf = str(tmp_path)
    rev = [10, 12, 9, 20, 14, 30, 11, 42]  # dollars per month
    rows, key = [], 1
    for mo, v in enumerate(rev, start=1):
        rows.append((key, key, "F", float(v), datetime(2024, mo, 10),
                     "1-URGENT"))
        key += 1
    _write_orders(spark, sf, rows)
    xs, ys, e = _monthly_ols_python([float(v) for v in rev])
    n = len(xs)
    y2 = [ei * ei for ei in e]
    sx, sy2 = sum(xs), sum(y2)
    sxy = sum(x * y for x, y in zip(xs, y2))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in y2)
    num = n * sxy - sx * sy2
    r2 = num * num / ((n * sxx - sx * sx) * (n * syy - sy2 * sy2))
    bp = n * r2
    r = QUERIES["orders_breusch_pagan_monthly"](spark, sf).collect()[0]
    assert r["n_months"] == n
    assert r["bp_stat"] == pytest.approx(bp, abs=1e-5)


def test_chow_break_vs_python(spark, tmp_path):
    """Chow F at the midpoint break of the monthly revenue trend,
    replicated independently (k = 2 coefficients)."""
    sf = str(tmp_path)
    rev = [10, 12, 11, 14, 30, 34, 33, 40]
    rows, key = [], 1
    for mo, v in enumerate(rev, start=1):
        rows.append((key, key, "F", float(v), datetime(2024, mo, 10),
                     "1-URGENT"))
        key += 1
    _write_orders(spark, sf, rows)

    def ssr(pts):
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        a = (sy - b * sx) / n
        return sum((y - a - b * x) ** 2 for x, y in zip(xs, ys))

    pts = list(enumerate([float(v) for v in rev], start=1))
    half = len(pts) // 2
    s_pool = ssr(pts)
    s1, s2 = ssr(pts[:half]), ssr(pts[half:])
    k = 2
    n = len(pts)
    f = ((s_pool - s1 - s2) / k) / ((s1 + s2) / (n - 2 * k))
    r = QUERIES["orders_chow_break_monthly"](spark, sf).collect()[0]
    assert r["n_months"] == n
    assert r["f_stat"] == pytest.approx(f, abs=1e-5)


# --- 10. Levene (mean-centered) on the discount grid --------------------------


def test_levene_mean_vs_python(spark, tmp_path):
    """Levene's W with MEAN centers (the Brown-Forsythe twin uses
    medians) replicated per-observation."""
    sf = str(tmp_path)
    data = [(0.00, "A"), (0.02, "A"), (0.04, "A"),
            (0.00, "N"), (0.08, "N"), (0.10, "N"),
            (0.02, "R"), (0.02, "R"), (0.06, "R")]
    _write_lineitem(spark, sf,
                    [(i + 1, 1, 1, d, f) for i, (d, f) in enumerate(data)])
    groups: dict[str, list[float]] = {}
    for d, f in data:
        groups.setdefault(f, []).append(round(d * 100))
    scores: dict[str, list[float]] = {}
    for f, vals in groups.items():
        m = sum(vals) / len(vals)
        scores[f] = [abs(v - m) for v in vals]
    allz = [z for zs in scores.values() for z in zs]
    n, k = len(allz), len(scores)
    zbar = sum(allz) / n
    ssb = sum(len(zs) * (sum(zs) / len(zs) - zbar) ** 2
              for zs in scores.values())
    ssw = sum((z - sum(zs) / len(zs)) ** 2
              for zs in scores.values() for z in zs)
    w = ((n - k) / (k - 1.0)) * ssb / ssw
    r = QUERIES["lineitem_levene_mean_discount"](spark, sf).collect()[0]
    assert r["n_groups"] == k
    assert r["levene_w"] == pytest.approx(w, abs=1e-6)


# --- 11. DSIR importance weights (LLM-pipeline selection) ---------------------


def _write_documents(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/documents.parquet")


def test_dsir_importance_vs_python(spark, tmp_path):
    """Hashed-unigram importance weights replicated independently
    (hashlib md5 buckets, Laplace-smoothed log ratio)."""
    import hashlib

    sf = str(tmp_path)
    docs = [
        (1, "alpha beta alpha", "en", "src01"),
        (2, "gamma gamma delta", "en", "src02"),
        (3, "alpha delta", "en", "src03"),
        (10, "alpha alpha beta", "en", "src19"),  # target
        (11, "beta beta", "en", "src19"),
    ]
    _write_documents(spark, sf,
                     [(i, t, lg, s, len(t)) for i, t, lg, s in docs])

    def bucket(tok):
        h = hashlib.md5(f"dsir:{tok}".encode()).hexdigest()[:8]
        return int(h, 16) % 64

    tgt: dict[int, int] = {}
    raw: dict[int, int] = {}
    per_doc: dict[int, dict[int, int]] = {}
    for i, t, _lg, s in docs:
        for tok in t.lower().split():
            b = bucket(tok)
            if s == "src19":
                tgt[b] = tgt.get(b, 0) + 1
            else:
                raw[b] = raw.get(b, 0) + 1
                per_doc.setdefault(i, {})[b] = (
                    per_doc.get(i, {}).get(b, 0) + 1)
    pt, qt = sum(tgt.values()), sum(raw.values())
    expected = {}
    for i, cs in per_doc.items():
        lw = 0.0
        for b in sorted(cs):
            lp = math.log((tgt.get(b, 0) + 1) / (pt + 64))
            lq = math.log((raw.get(b, 0) + 1) / (qt + 64))
            lw += cs[b] * (lp - lq)
        expected[i] = lw
    got = {r["doc_id"]: r for r in
           QUERIES["docs_dsir_importance"](spark, sf).collect()}
    assert set(got) == set(expected)
    for i, lw in expected.items():
        assert got[i]["log_weight"] == pytest.approx(lw, abs=1e-6)
    order = sorted(expected, key=lambda i: (-expected[i], i))
    assert [r[0] for r in sorted(
        ((g["rnk"], i) for i, g in got.items()))] == list(range(1, 4))
    assert [i for _, i in sorted(
        ((g["rnk"], i) for i, g in got.items()))] == order


# --- Battery J: KN scoring, Duncan ranges, Light's kappa, records -------------


def test_kneser_ney_vs_python(spark, tmp_path):
    """Interpolated Kneser-Ney bigram model (d = 0.75) self-scored per
    source, replicated by an independent Python loop."""
    sf = str(tmp_path)
    docs = [
        (1, "a b a c", "en", "src01"),
        (2, "b a b c", "en", "src01"),
        (3, "c c a b", "en", "src02"),
    ]
    _write_documents(spark, sf,
                     [(i, t, lg, s, len(t)) for i, t, lg, s in docs])
    # train on ALL docs
    from collections import Counter

    bi = Counter()
    for _i, t, _lg, _s in docs:
        ws = t.split()
        for j in range(len(ws) - 1):
            bi[(ws[j], ws[j + 1])] += 1
    c1 = Counter()  # c(w1, .)
    n1f = Counter()  # N1+(w1, .)
    n1b = Counter()  # N1+(. , w2)
    for (w1, w2), c in bi.items():
        c1[w1] += c
        n1f[w1] += 1
        n1b[w2] += 1
    btypes = len(bi)
    d = 0.75

    def pkn(w1, w2):
        cont = n1b[w2] / btypes
        lam = d * n1f[w1] / c1[w1]
        return max(bi[(w1, w2)] - d, 0.0) / c1[w1] + lam * cont

    import math as _m

    expected = {}
    for _i, t, _lg, s in docs:
        ws = t.split()
        for j in range(len(ws) - 1):
            q = _m.floor(_m.log(pkn(ws[j], ws[j + 1])) * 1e9 + 0.5)
            k, n = expected.get(s, (0, 0))
            expected[s] = (k + q, n + 1)
    rows = {r["source"]: r for r in
            QUERIES["score_bigram_kneser_ney"](spark, sf).collect()}
    for s, (qsum, n) in expected.items():
        assert rows[s]["n_bigrams"] == n
        assert rows[s]["avg_logprob"] == pytest.approx(
            qsum / (1e9 * n), abs=1e-6)


def test_duncan_range_hand(spark, tmp_path):
    """Means 1.5 / 4 / 10 (same corpus as the HSD test): MSW = 1.5,
    se = sqrt(MSW/2 * (1/2+1/2)) = 0.866025.  Duncan r(2, inf) =
    2.772, r(3, inf) = 2.918.  Adjacent spans: |4-1.5|/se = 2.887 >
    2.772 sig; |10-4|/se = 6.93 sig; full span 9.81 > 2.918 sig."""
    sf = str(tmp_path)
    rows, key = [], 1
    for prio, vals in [("1-URGENT", [1, 2]), ("2-HIGH", [3, 5]),
                       ("3-MEDIUM", [9, 11])]:
        for v in vals:
            rows.append((key, key, "F", float(v),
                         datetime(2024, 1, 5), prio))
            key += 1
    _write_orders(spark, sf, rows)
    out = {(r["prio_lo"], r["prio_hi"]): r
           for r in QUERIES["orders_duncan_range"](spark, sf).collect()}
    assert len(out) == 3
    r12 = out[("1-URGENT", "2-HIGH")]
    assert r12["span"] == 2
    assert r12["q_stat"] == pytest.approx(2.886751, abs=1e-6)
    assert r12["r_crit"] == pytest.approx(2.772, abs=1e-9)
    assert bool(r12["significant"]) is True
    r13 = out[("1-URGENT", "3-MEDIUM")]
    assert r13["span"] == 3
    assert r13["r_crit"] == pytest.approx(2.918, abs=1e-9)
    assert bool(r13["significant"]) is True


def test_duncan_containment_rule(spark, tmp_path):
    """Step-down containment: if the FULL range is non-significant, a
    contained pair that is raw-significant must still be declared
    non-significant.  Groups 1-URGENT={0,20}, 2-HIGH={9,11},
    3-MEDIUM={10,12}: huge within-group variance makes the full range
    NS, and every contained range inherits NS."""
    sf = str(tmp_path)
    rows, key = [], 1
    for prio, vals in [("1-URGENT", [0, 20]), ("2-HIGH", [9, 11]),
                       ("3-MEDIUM", [10, 12])]:
        for v in vals:
            rows.append((key, key, "F", float(v),
                         datetime(2024, 1, 5), prio))
            key += 1
    _write_orders(spark, sf, rows)
    out = QUERIES["orders_duncan_range"](spark, sf).collect()
    assert all(not r["significant"] for r in out)


def test_light_kappa_vs_python(spark, tmp_path):
    """Light's kappa = mean pairwise Cohen's kappa over the three
    line-flag 'raters' of exactly-3-line orders, replicated
    independently."""
    sf = str(tmp_path)
    triples = [("A", "A", "A"), ("A", "A", "N"), ("N", "N", "N"),
               ("N", "R", "N"), ("R", "R", "R"), ("A", "N", "R"),
               ("R", "R", "A"), ("A", "A", "A")]
    rows = []
    for ok, (f1, f2, f3) in enumerate(triples, start=1):
        for ln, f in enumerate((f1, f2, f3), start=1):
            rows.append((ok, ln, 1, 0.0, f))
    _write_lineitem(spark, sf, rows)

    def cohen(pairs):
        from collections import Counter

        n = len(pairs)
        tab = Counter(pairs)
        po = sum(v for (x, y), v in tab.items() if x == y) / n
        ma = Counter(x for x, _ in pairs)
        mb = Counter(y for _, y in pairs)
        pe = sum(ma[c] * mb.get(c, 0) for c in ma) / (n * n)
        return (po - pe) / (1 - pe)

    k12 = cohen([(a, b) for a, b, _ in triples])
    k13 = cohen([(a, c) for a, _, c in triples])
    k23 = cohen([(b, c) for _, b, c in triples])
    light = (k12 + k13 + k23) / 3.0
    r = QUERIES["orders_light_kappa"](spark, sf).collect()[0]
    assert r["n_subjects"] == len(triples)
    assert r["kappa_12"] == pytest.approx(k12, abs=1e-6)
    assert r["kappa_13"] == pytest.approx(k13, abs=1e-6)
    assert r["kappa_23"] == pytest.approx(k23, abs=1e-6)
    assert r["light_kappa"] == pytest.approx(light, abs=1e-6)


def test_foster_stuart_increasing(spark, tmp_path):
    """Monthly counts 1..6: every month after the first is an upper
    record, none lower -> U = 5, L = 0, D = 5,
    Var(D) = sum_{t=2..6} 1/t = 1.45, z = 5/sqrt(1.45) = 4.152274."""
    sf = str(tmp_path)
    rows, key = [], 1
    for mo in range(1, 7):
        for _ in range(mo):
            rows.append((key, key, "F", 10.0, datetime(2024, mo, 10),
                         "1-URGENT"))
            key += 1
    _write_orders(spark, sf, rows)
    r = QUERIES["orders_foster_stuart"](spark, sf).collect()[0]
    assert r["u_records"] == 5 and r["l_records"] == 0
    assert r["d_stat"] == 5
    var = sum(1.0 / t for t in range(2, 7))
    assert r["z_score"] == pytest.approx(5 / math.sqrt(var), abs=1e-6)


def test_foster_stuart_mixed(spark, tmp_path):
    """Counts 3,1,9,2,5: records after t=1 — t=2 lower (1<3), t=3
    upper (9>3), t=4 none, t=5 none -> U=1, L=1, D=0, z=0."""
    sf = str(tmp_path)
    rows, key = [], 1
    for mo, k in enumerate([3, 1, 9, 2, 5], start=1):
        for _ in range(k):
            rows.append((key, key, "F", 10.0, datetime(2024, mo, 10),
                         "1-URGENT"))
            key += 1
    _write_orders(spark, sf, rows)
    r = QUERIES["orders_foster_stuart"](spark, sf).collect()[0]
    assert r["u_records"] == 1 and r["l_records"] == 1
    assert r["d_stat"] == 0
    assert r["z_score"] == pytest.approx(0.0, abs=1e-9)
