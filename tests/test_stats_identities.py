"""Identity-fuzz gate for the grid-algebra statistics (batteries D-F).

The known-value gate (`test_stats_battery.py`) pins each QUERY to fixed
paper-verifiable corpora; this module fuzzes the underlying ALGEBRAIC
IDENTITIES the queries rely on — closed form == brute-force definition
over randomized inputs — in pure python (no Spark), so hundreds of
examples cost milliseconds.  The failure class targeted is a formula
misconception baked into both engines' shared algebra that happens to be
correct on the few fixed corpora the known-value tests use.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, assume, settings, strategies as st


def _approx(x):
    return pytest.approx(x, rel=1e-9, abs=1e-9)


# ---------------------------------------------------------------------------
# Stuart-Maxwell k=3 closed form vs the defining d' V^-1 d quadratic form
# (lineitem_marginal_homogeneity)
# ---------------------------------------------------------------------------

_table3 = st.lists(st.integers(0, 30), min_size=9, max_size=9)


@settings(max_examples=300, deadline=None)
@given(_table3)
def test_stuart_maxwell_closed_form_equals_matrix_form(cells):
    n = np.array(cells, float).reshape(3, 3)
    s12, s13, s23 = n[0, 1] + n[1, 0], n[0, 2] + n[2, 0], n[1, 2] + n[2, 1]
    assume(s12 > 0 and s13 > 0 and s23 > 0)
    row, col = n.sum(1), n.sum(0)
    d = row - col
    v = np.array(
        [
            [row[0] + col[0] - 2 * n[0, 0], -s12],
            [-s12, row[1] + col[1] - 2 * n[1, 1]],
        ]
    )
    assume(abs(np.linalg.det(v)) > 1e-9)
    expected = float(d[:2] @ np.linalg.inv(v) @ d[:2])
    closed = (s23 * d[0] ** 2 + s13 * d[1] ** 2 + s12 * d[2] ** 2) / (
        s12 * s13 + s12 * s23 + s13 * s23
    )
    assert closed == _approx(expected)


# ---------------------------------------------------------------------------
# Weighted-kappa penalty identity vs the classic weight-matrix definition
# (orders_weighted_kappa)
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.integers(2, 6),
    st.data(),
    st.sampled_from([1, 2]),
)
def test_weighted_kappa_penalty_identity(k, data, power):
    cells = {
        (i, j): data.draw(st.integers(0, 20), label=f"c{i}{j}")
        for i in range(k)
        for j in range(k)
    }
    n = sum(cells.values())
    rk = [sum(c for (i, _), c in cells.items() if i == lvl) for lvl in range(k)]
    ck = [sum(c for (_, j), c in cells.items() if j == lvl) for lvl in range(k)]
    den = sum(
        abs(i - j) ** power * rk[i] * ck[j] for i in range(k) for j in range(k)
    )
    assume(n > 0 and den > 0)
    num = sum(abs(i - j) ** power * c for (i, j), c in cells.items())
    penalty_form = 1 - n * num / den
    po = sum(
        (1 - (abs(i - j) / (k - 1)) ** power) * c for (i, j), c in cells.items()
    ) / n
    pe = sum(
        (1 - (abs(i - j) / (k - 1)) ** power) * rk[i] * ck[j]
        for i in range(k)
        for j in range(k)
    ) / n**2
    assert penalty_form == _approx((po - pe) / (1 - pe))


# ---------------------------------------------------------------------------
# Ansari-Bradley closed-form tie-block score sums vs positional brute force
# (lineitem_ansari_bradley, lineitem_lepage_flags)
# ---------------------------------------------------------------------------

_counts = st.lists(st.integers(1, 6), min_size=1, max_size=8)


def _ab_block_s2(a, b, nn):
    """The queries' closed form: 2x-scaled sum of min(p, N+1-p) over
    positions a..b, split at the midpoint t = (N+1)//2."""
    t = (nn + 1) // 2
    lo_end = min(b, t)
    hi_start = max(a, t + 1)
    s2 = 0
    if a <= lo_end:
        s2 += lo_end * (lo_end + 1) - (a - 1) * a
    if b >= hi_start:
        s2 += 2 * (nn + 1) * (b - hi_start + 1) - (
            b * (b + 1) - (hi_start - 1) * hi_start
        )
    return s2


@settings(max_examples=300, deadline=None)
@given(_counts)
def test_ansari_bradley_block_scores_closed_form(counts):
    nn = sum(counts)
    a = 1
    for c in counts:
        b = a + c - 1
        brute = sum(2 * min(p, nn + 1 - p) for p in range(a, b + 1))
        assert _ab_block_s2(a, b, nn) == brute
        a = b + 1


# ---------------------------------------------------------------------------
# Brunner-Munzel grid algebra vs the per-observation placement loop
# (lineitem_brunner_munzel)
# ---------------------------------------------------------------------------


def _midranks(values):
    s = sorted(values)
    pos = {}
    for idx, v in enumerate(s):
        pos.setdefault(v, []).append(idx + 1)
    return {v: sum(p) / len(p) for v, p in pos.items()}


_sample = st.lists(st.integers(1, 10), min_size=2, max_size=12)


@settings(max_examples=150, deadline=None)
@given(_sample, _sample)
def test_brunner_munzel_grid_equals_loop(x, y):
    n1, n2 = len(x), len(y)
    vals = sorted(set(x + y))
    ca = {v: x.count(v) for v in vals}
    cr = {v: y.count(v) for v in vals}
    bp = ap = rp = 0
    sum_car2 = sum_crr2 = 0.0
    rows = []
    for v in vals:
        c = ca[v] + cr[v]
        r2 = 2 * bp + c + 1
        ra2 = 2 * ap + ca[v] + 1
        rr2 = 2 * rp + cr[v] + 1
        rows.append((v, r2, ra2, rr2))
        sum_car2 += ca[v] * r2
        sum_crr2 += cr[v] * r2
        bp, ap, rp = bp + c, ap + ca[v], rp + cr[v]
    rxm, rym = sum_car2 / (2 * n1), sum_crr2 / (2 * n2)
    sx_grid = sum(
        ca[v] * ((r2 - ra2) / 2 - rxm + (n1 + 1) / 2) ** 2
        for v, r2, ra2, _ in rows
    ) / (n1 - 1)
    sy_grid = sum(
        cr[v] * ((r2 - rr2) / 2 - rym + (n2 + 1) / 2) ** 2
        for v, r2, _, rr2 in rows
    ) / (n2 - 1)
    mr, mrx, mry = _midranks(x + y), _midranks(x), _midranks(y)
    rxm_loop = sum(mr[v] for v in x) / n1
    rym_loop = sum(mr[v] for v in y) / n2
    sx_loop = sum(
        (mr[v] - mrx[v] - rxm_loop + (n1 + 1) / 2) ** 2 for v in x
    ) / (n1 - 1)
    sy_loop = sum(
        (mr[v] - mry[v] - rym_loop + (n2 + 1) / 2) ** 2 for v in y
    ) / (n2 - 1)
    assert rxm == _approx(rxm_loop)
    assert rym == _approx(rym_loop)
    assert sx_grid == _approx(sx_loop)
    assert sy_grid == _approx(sy_loop)


# ---------------------------------------------------------------------------
# Hodges-Lehmann cumulative-weight rank selection vs the sorted Walsh list
# (lineitem_hodges_lehmann; same idiom as the Sen-slope CI)
# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(_sample, _sample)
def test_hodges_lehmann_rank_selection(x, y):
    weights = {}
    for a in sorted(set(x)):
        for b in sorted(set(y)):
            d = a - b
            weights[d] = weights.get(d, 0) + x.count(a) * y.count(b)
    t = sum(weights.values())
    cum = 0
    cumw = {}
    for d in sorted(weights):
        cum += weights[d]
        cumw[d] = cum

    def pick(k):
        return min(d for d, cw in cumw.items() if cw >= k)

    lst = sorted(a - b for a in x for b in y)
    k1, k2 = (t + 1) // 2, (t + 2) // 2
    assert (pick(k1) + pick(k2)) / 2 == _approx(
        (lst[k1 - 1] + lst[k2 - 1]) / 2
    )
    klo = max(1, math.ceil(t / 40))
    khi = min(t, math.ceil(39 * t / 40))
    assert pick(klo) == lst[klo - 1]
    assert pick(khi) == lst[khi - 1]


# ---------------------------------------------------------------------------
# Cochran-Armitage all-integer numerator/variance vs the textbook form
# (lineitem_cochran_armitage)
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.dictionaries(
        st.integers(1, 50),
        st.tuples(st.integers(1, 30), st.integers(0, 30)),
        min_size=2,
        max_size=8,
    )
)
def test_cochran_armitage_integer_form(groups):
    groups = {v: (nv, min(rv, nv)) for v, (nv, rv) in groups.items()}
    n = sum(nv for nv, _ in groups.values())
    r = sum(rv for _, rv in groups.values())
    assume(0 < r < n)
    ssr = sum(v * rv for v, (_, rv) in groups.items())
    ssn = sum(v * nv for v, (nv, _) in groups.items())
    ss2n = sum(v * v * nv for v, (nv, _) in groups.items())
    var_int = r * (n - r) * (n * ss2n - ssn * ssn) / n
    assume(var_int > 0)
    z_int = (n * ssr - r * ssn) / math.sqrt(var_int)
    p = r / n
    z_loop = (ssr - p * ssn) / math.sqrt(
        p * (1 - p) * (ss2n - ssn * ssn / n)
    )
    assert z_int == _approx(z_loop)


# ---------------------------------------------------------------------------
# MRPP grid cross product vs the per-observation pairwise loop
# (lineitem_mrpp_flags)
# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(st.lists(st.lists(st.integers(1, 10), min_size=2, max_size=10),
                min_size=2, max_size=4))
def test_mrpp_grid_cross_product(groups):
    allv = [v for g in groups for v in g]
    n_tot = len(allv)

    def w_grid(vals):
        grid = {v: vals.count(v) for v in set(vals)}
        return sum(
            grid[a] * grid[b] * abs(a - b) for a in grid for b in grid
        )

    def xi_loop(vals):
        n = len(vals)
        return sum(abs(a - b) for a in vals for b in vals) / (n * (n - 1))

    delta_grid = sum(
        w_grid(g) / (n_tot * (len(g) - 1)) for g in groups
    )
    delta_loop = sum(len(g) / n_tot * xi_loop(g) for g in groups)
    assert delta_grid == _approx(delta_loop)
    assert w_grid(allv) / (n_tot * (n_tot - 1)) == _approx(
        xi_loop(allv)
    )


# ---------------------------------------------------------------------------
# Lepage Wilcoxon 2x-scaled block identity: sum ca*(a+b) == 2 * midrank sum
# (lineitem_lepage_flags)
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(_sample, _sample)
def test_lepage_wilcoxon_2x_block_identity(x, y):
    vals = sorted(set(x + y))
    mr = _midranks(x + y)
    a = 1
    w2 = 0
    for v in vals:
        c = x.count(v) + y.count(v)
        b = a + c - 1
        w2 += x.count(v) * (a + b)
        a = b + 1
    assert w2 == _approx(2 * sum(mr[v] for v in x))


# ---------------------------------------------------------------------------
# Gini mean difference / Gini coefficient from the value grid vs the
# per-observation pairwise loop (lineitem_gini_mean_difference)
# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(1, 20), min_size=2, max_size=15))
def test_gini_grid_cross_product(vals):
    n = len(vals)
    grid = {v: vals.count(v) for v in set(vals)}
    w = sum(grid[a] * grid[b] * abs(a - b) for a in grid for b in grid)
    gmd_grid = w / (n * (n - 1))
    gmd_loop = sum(
        abs(a - b) for a in vals for b in vals
    ) / (n * (n - 1))
    mean = sum(vals) / n
    assert gmd_grid == _approx(gmd_loop)
    # Gini coefficient: the grid's integer total w = n(n-1)*GMD and
    # sum(vals) = n*mean, so w / (2*(n-1)*sum) == GMD / (2*mean)
    assert w / (2.0 * (n - 1) * sum(vals)) == _approx(
        gmd_loop / (2 * mean)
    )


# ---------------------------------------------------------------------------
# Exact two-sample KS: integer cross-scaled sup over the merged grid vs
# the float ECDF sup over all observed values (cust_ks_exact_segments)
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(_sample, _sample)
def test_ks_integer_sup_equals_float_sup(x, y):
    nx, ny = len(x), len(y)
    vals = sorted(set(x + y))
    cx = cy = 0
    int_sup = 0
    float_sup = 0.0
    for v in vals:
        cx += x.count(v)
        cy += y.count(v)
        int_sup = max(int_sup, abs(cx * ny - cy * nx))
        float_sup = max(float_sup, abs(cx / nx - cy / ny))
    assert int_sup / (nx * ny) == _approx(float_sup)


# ---------------------------------------------------------------------------
# Kuiper V = D+ + D- from the same integer grid (lineitem_kuiper_flags):
# catches opposite-tail shifts whose single sup cancels
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(_sample, _sample)
def test_kuiper_integer_components(x, y):
    nx, ny = len(x), len(y)
    vals = sorted(set(x + y))
    cx = cy = 0
    dp_int = dm_int = 0
    dp_f = dm_f = 0.0
    for v in vals:
        cx += x.count(v)
        cy += y.count(v)
        dp_int = max(dp_int, cx * ny - cy * nx)
        dm_int = max(dm_int, cy * nx - cx * ny)
        dp_f = max(dp_f, cx / nx - cy / ny)
        dm_f = max(dm_f, cy / ny - cx / nx)
    assert (dp_int + dm_int) / (nx * ny) == _approx(dp_f + dm_f)
    # Kuiper sees what KS misses only when the signed extremes differ;
    # both formulations must agree on that, too
    assert (dp_int + dm_int) >= max(dp_int, dm_int)


# ---------------------------------------------------------------------------
# Jonckheere-Terpstra 2x-scaled grid statistic vs the pairwise loop —
# the family whose z-scale bug the known-value gate caught in r12
# ---------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.lists(st.lists(st.integers(1, 8), min_size=1, max_size=8),
                min_size=2, max_size=4))
def test_jonckheere_2x_grid_statistic(groups):
    jt2_grid = 0
    for gi in range(len(groups)):
        for gj in range(gi + 1, len(groups)):
            a = {v: groups[gi].count(v) for v in set(groups[gi])}
            b = {v: groups[gj].count(v) for v in set(groups[gj])}
            jt2_grid += sum(
                a[v] * b[w] * (2 if v < w else (1 if v == w else 0))
                for v in a for w in b
            )
    jt2_loop = 0
    for gi in range(len(groups)):
        for gj in range(gi + 1, len(groups)):
            for xv in groups[gi]:
                for yv in groups[gj]:
                    jt2_loop += 2 if xv < yv else (1 if xv == yv else 0)
    assert jt2_grid == jt2_loop


# ---------------------------------------------------------------------------
# Tie-corrected Mann-Whitney AUC: midrank formula vs the defining
# P(X>Y) + 0.5*P(X=Y) pairwise loop (docs_quality_roc_auc)
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(_sample, _sample)
def test_auc_midrank_equals_pairwise(pos, neg):
    n1, n0 = len(pos), len(neg)
    mr = _midranks(pos + neg)
    rank_sum = sum(mr[v] for v in pos)
    auc_ranks = (rank_sum - n1 * (n1 + 1) / 2) / (n1 * n0)
    auc_pairs = sum(
        1.0 if p > q else (0.5 if p == q else 0.0)
        for p in pos for q in neg
    ) / (n1 * n0)
    assert auc_ranks == _approx(auc_pairs)


# ---------------------------------------------------------------------------
# Kendall tau-b concordant/discordant grid counts vs the pairwise loop
# (orders_ordinal_association)
# ---------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 5), st.integers(1, 5)),
                min_size=2, max_size=20))
def test_tau_b_grid_counts(pairs):
    grid = {}
    for xy in pairs:
        grid[xy] = grid.get(xy, 0) + 1
    c_grid = d_grid = 0
    cells = list(grid.items())
    for (x1, y1), n1 in cells:
        for (x2, y2), n2 in cells:
            if x1 < x2 and y1 < y2:
                c_grid += n1 * n2
            elif x1 < x2 and y1 > y2:
                d_grid += n1 * n2
    c_loop = d_loop = 0
    for i in range(len(pairs)):
        for j in range(len(pairs)):
            (x1, y1), (x2, y2) = pairs[i], pairs[j]
            if x1 < x2 and y1 < y2:
                c_loop += 1
            elif x1 < x2 and y1 > y2:
                d_loop += 1
    assert (c_grid, d_grid) == (c_loop, d_loop)
    n = len(pairs)
    tx = sum(
        v * (v - 1) // 2
        for v in {x: sum(c for (a, _), c in grid.items() if a == x)
                  for x in {p[0] for p in pairs}}.values()
    )
    ty = sum(
        v * (v - 1) // 2
        for v in {y: sum(c for (_, b), c in grid.items() if b == y)
                  for y in {p[1] for p in pairs}}.values()
    )
    n_pairs = n * (n - 1) // 2
    if n_pairs > tx and n_pairs > ty:
        tau_b = (c_grid - d_grid) / math.sqrt(
            (n_pairs - tx) * (n_pairs - ty)
        )
        assert -1.0 - 1e-9 <= tau_b <= 1.0 + 1e-9


# ---------------------------------------------------------------------------
# CUSUM prefix-extremum identity vs the textbook recursion — the class
# whose EMPTY-PREFIX baseline (S_0 = 0) bug the r12 gate caught
# (events_cusum_tabular)
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(-10, 10), min_size=1, max_size=30))
def test_cusum_prefix_extremum_identity(steps):
    # recursion: C+_i = max(0, C+_{i-1} + s_i), C-_i = max(0, C-_{i-1} - s_i)
    cp = cm = 0
    s = 0
    run_min = run_max = 0  # prefix extrema INCLUDING the empty prefix S_0 = 0
    for x in steps:
        cp = max(0, cp + x)
        cm = max(0, cm - x)
        s += x
        run_min = min(run_min, s)
        run_max = max(run_max, s)
    assert cp == s - run_min
    assert cm == run_max - s


# ---------------------------------------------------------------------------
# EWMA control-chart closed forms vs the Montgomery recursion — the class
# whose (1-lambda)^2 variance-factor transposition the r12 gate caught
# (events_ewma_control_chart)
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.floats(-50, 50, allow_nan=False), min_size=1, max_size=25),
    st.floats(0.05, 0.95),
    st.floats(-5, 5),
)
def test_ewma_closed_forms(ys, lam, mu):
    # z_i = lam*y_i + (1-lam)*z_{i-1}, z_0 = mu  (textbook init, NOT y_1)
    z = mu
    for i, y in enumerate(ys, start=1):
        z = lam * y + (1 - lam) * z
        closed = (1 - lam) ** i * mu + lam * sum(
            (1 - lam) ** (i - j) * ys[j - 1] for j in range(1, i + 1)
        )
        assert z == _approx(closed)
        # variance inflation: Var(z_i)/sigma^2 = lam/(2-lam)*(1-(1-lam)^(2i)),
        # equivalently lam^2 * sum_{j=0}^{i-1} (1-lam)^(2j) — the factor at
        # i=1 is lam^2, and the first RETAINED weight is (1-lam)^2
        geo = lam * lam * sum((1 - lam) ** (2 * j) for j in range(i))
        assert lam / (2 - lam) * (1 - (1 - lam) ** (2 * i)) == _approx(geo)


# ---------------------------------------------------------------------------
# Trimmed-mean rank-interval overlap vs the sorted-slice definition
# (supplier_acctbal_trimmed_mean): boundary values straddling a trim
# point must contribute exactly their surviving copies
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(-100, 100), min_size=1, max_size=40))
def test_trimmed_mean_interval_overlap(vals):
    n = len(vals)
    k = n // 10
    grid = {v: vals.count(v) for v in set(vals)}
    lo = 0
    kept_sum = kept_n = 0
    for v in sorted(grid):
        hi = lo + grid[v]
        keep = max(0, min(hi, n - k) - max(lo, k))
        kept_sum += v * keep
        kept_n += keep
        lo = hi
    sliced = sorted(vals)[k:n - k]
    assert kept_n == len(sliced)
    assert kept_sum == sum(sliced)


# ---------------------------------------------------------------------------
# Kendall's W — Friedman chi-square relation (orders_kendall_w_priority):
# chi2_F = k(n-1)W must hold for ANY rank table, tied or not
# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(st.integers(2, 5), st.integers(3, 8), st.data())
def test_kendall_w_friedman_relation(k, n, data):
    # k judges each assign midrank-style ranks over n objects: draw raw
    # scores, convert to midranks per judge
    tables = []
    for j in range(k):
        scores = [
            data.draw(st.integers(0, 5), label=f"s{j}_{i}")
            for i in range(n)
        ]
        mr = _midranks(scores)
        tables.append([mr[s] for s in scores])
    rsum = [sum(tables[j][i] for j in range(k)) for i in range(n)]
    rbar = sum(rsum) / n
    s = sum((r - rbar) ** 2 for r in rsum)
    # tie correction per judge: sum(t^3 - t)
    tcorr = 0
    for j in range(k):
        from collections import Counter

        tcorr += sum(
            t**3 - t for t in Counter(tables[j]).values()
        )
    denom = k * k * (n**3 - n) / 12 - k * tcorr / 12
    assume(denom > 1e-12)
    w = s / denom
    chi2 = k * (n - 1) * w
    assert 0 - 1e-9 <= w <= 1 + 1e-9
    if tcorr == 0:
        # independent check on tie-free draws: the classic Friedman
        # formula 12/(k n(n+1)) * sum R_j^2 - 3k(n+1) must equal
        # k(n-1)W exactly
        classic = (
            12.0 / (k * n * (n + 1)) * sum(r * r for r in rsum)
            - 3.0 * k * (n + 1)
        )
        assert chi2 == _approx(classic)


# ---------------------------------------------------------------------------
# Somers' D / gamma / tau-b consistency from one (C, D, Tx, Ty) count
# (orders_ordinal_association): all three must come from the SAME counts
# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 4), st.integers(1, 4)),
                min_size=3, max_size=15))
def test_ordinal_association_shared_counts(pairs):
    c = d = tx = ty = 0
    n = len(pairs)
    for i in range(n):
        for j in range(i + 1, n):
            (x1, y1), (x2, y2) = pairs[i], pairs[j]
            if x1 == x2 and y1 == y2:
                continue
            elif x1 == x2:
                tx += 1
            elif y1 == y2:
                ty += 1
            elif (x1 < x2) == (y1 < y2):
                c += 1
            else:
                d += 1
    if c + d > 0:
        gamma = (c - d) / (c + d)
        assert -1 <= gamma <= 1
    if c + d + ty > 0:
        somers_d_yx = (c - d) / (c + d + ty)
        # |D| <= |gamma| — the tie term only shrinks the magnitude
        if c + d > 0:
            assert abs(somers_d_yx) <= abs((c - d) / (c + d)) + 1e-12
    if (c + d + tx) > 0 and (c + d + ty) > 0:
        tau_b = (c - d) / math.sqrt((c + d + tx) * (c + d + ty))
        # tau-b is the geometric mean of the two asymmetric Somers' D
        dyx = (c - d) / (c + d + ty)
        dxy = (c - d) / (c + d + tx)
        assert tau_b * tau_b == _approx(abs(dyx * dxy))


# ---------------------------------------------------------------------------
# Theil T decomposition: total = between + share-weighted within
# (orders_theil_between_nations + orders_theil_index_by_nation)
# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(st.lists(st.lists(st.integers(1, 100), min_size=1, max_size=8),
                min_size=2, max_size=5))
def test_theil_decomposition(groups):
    allv = [v for g in groups for v in g]
    n = len(allv)
    mu = sum(allv) / n

    def theil(vals):
        m = sum(vals) / len(vals)
        return sum(v / m * math.log(v / m) for v in vals) / len(vals)

    total = theil(allv)
    between = sum(
        len(g) / n * (sum(g) / len(g) / mu)
        * math.log(sum(g) / len(g) / mu)
        for g in groups
    )
    within = sum(
        (sum(g) / (n * mu)) * theil(g) for g in groups
    )
    assert total == _approx(between + within)
