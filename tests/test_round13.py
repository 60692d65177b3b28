"""Round-13 NEW-operator planted-model tests (mandatory from day one,
SURVEY section-5.2): exact pins for the r13 batch — Wilcoxon
signed-rank, Siegel-Tukey (including a LITERAL simulation of the
alternating rank assignment, which caught the nL boundary bug in the
closed form pre-ship), Kendall's W, Durbin-Watson, Lin's CCC,
Vargha-Delaney A, TOST equivalence. Same doctrine as the r11/r12
sweeps: independent pure-Python textbook models on planted data."""

from __future__ import annotations

import datetime
import math

import pytest

from data_ingestion_poc_spark import registry
from tests.test_round11 import _plant_two_samples  # noqa: F401
from tests.test_round12 import _run, _write_events, spark  # noqa: F401

FLOOR4 = lambda x: math.floor(x * 1e4) / 1e4  # noqa: E731
FLOOR6 = lambda x: math.floor(x * 1e6) / 1e6  # noqa: E731


def _plant_pairs(spark, tmp_path, pairs):
    """One purchase + one click event per user: user u's pair
    (x_u, y_u) in dollars."""
    rows = []
    eid = 0
    for u, (x, y) in enumerate(pairs):
        rows.append((eid, 0, u, "purchase", x))
        eid += 1
        rows.append((eid, 1, u, "click", y))
        eid += 1
    _write_events(spark, tmp_path, rows)


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank: midranks with ties, tie-corrected variance.

WSR_PAIRS = [
    (5.00, 2.00),   # d = +300
    (4.00, 1.00),   # d = +300 (tie in |d|)
    (1.00, 4.00),   # d = -300 (same tie group, negative)
    (9.00, 4.00),   # d = +500
    (3.00, 5.00),   # d = -200
    (6.00, 4.00),   # d = +200 (tie with the -200)
    (2.50, 2.50),   # d = 0, drops
    (7.00, 6.00),   # d = +100
]


def test_wilcoxon_signed_rank_exact(spark, tmp_path):
    _plant_pairs(spark, tmp_path, WSR_PAIRS)
    (r,) = _run("agg_wilcoxon_signed_rank", spark, tmp_path)
    ds = [round(x * 100) - round(y * 100) for x, y in WSR_PAIRS]
    ds = [d for d in ds if d != 0]
    n = len(ds)
    # midranks of |d|
    sorted_abs = sorted(abs(d) for d in ds)
    rank_of = {}
    i = 0
    while i < len(sorted_abs):
        j = i
        while j < len(sorted_abs) and sorted_abs[j] == sorted_abs[i]:
            j += 1
        rank_of[sorted_abs[i]] = (i + 1 + j) / 2  # avg of positions i+1..j
        i = j
    w_plus = sum(rank_of[abs(d)] for d in ds if d > 0)
    # tie correction
    from collections import Counter

    tie3 = sum(t**3 - t for t in Counter(abs(d) for d in ds).values())
    var = n * (n + 1) * (2 * n + 1) / 24 - tie3 / 48
    z = (2 * w_plus - n * (n + 1) / 2) / math.sqrt(4 * var)
    assert r["n_pairs"] == n == 7
    assert r["w_plus"] == pytest.approx(w_plus, abs=1e-12)
    assert r["z_stat"] == pytest.approx(FLOOR4(z), abs=1e-9)
    assert r["location_shifted"] == (abs(FLOOR4(z)) > 1.96)


# ---------------------------------------------------------------------------
# Siegel-Tukey: the independent model SIMULATES the published
# alternating assignment literally (1 low, 2 high, 2 low, 2 high, ...),
# then applies midranks over ties — no reuse of the engine's closed
# positional forms.


def _st_ranks_literal(n):
    """rank[position p] (1-based ascending) via the literal scheme."""
    ranks = [0] * (n + 1)
    lo, hi = 1, n
    rank = 1
    take_low, group = True, 1  # first group takes ONE low
    while lo <= hi:
        for _ in range(group):
            if lo > hi:
                break
            if take_low:
                ranks[lo] = rank
                lo += 1
            else:
                ranks[hi] = rank
                hi -= 1
            rank += 1
        take_low = not take_low
        group = 2
    return ranks[1:]


def _st_model(a_vals, b_vals):
    """(rank_sum_a, z) from the literal assignment + midranks."""
    from collections import Counter

    obs = sorted(
        [(round(v * 100), "a") for v in a_vals]
        + [(round(v * 100), "b") for v in b_vals]
    )
    n = len(obs)
    g = _st_ranks_literal(n)
    # midranks: average g over each tied-value run of positions
    midrank = {}
    i = 0
    while i < n:
        j = i
        while j < n and obs[j][0] == obs[i][0]:
            j += 1
        mr = sum(g[i:j]) / (j - i)
        midrank[obs[i][0]] = mr
        i = j
    wa = sum(midrank[v] for v, arm in obs if arm == "a")
    na = sum(1 for _, arm in obs if arm == "a")
    nb = n - na
    tie3 = sum(
        t**3 - t for t in Counter(v for v, _ in obs).values()
    )
    var = na * nb / 12 * ((n + 1) - tie3 / (n * (n - 1)))
    z = (wa - na * (n + 1) / 2) / math.sqrt(var)
    return wa, z


# spread A vs tight B, with cross-arm ties and an N % 4 == 3 total
# (the regime where ceil(N/2) would misplace the boundary)
ST_A = [1.00, 2.00, 9.00, 10.00, 5.50, 5.50]
ST_B = [5.00, 5.50, 6.00, 5.00, 6.50]


def test_siegel_tukey_exact(spark, tmp_path):
    assert (len(ST_A) + len(ST_B)) % 4 == 3
    _plant_two_samples(spark, tmp_path, ST_A, ST_B)
    (r,) = _run("agg_siegel_tukey", spark, tmp_path)
    wa, z = _st_model(ST_A, ST_B)
    assert (r["n_a"], r["n_b"]) == (len(ST_A), len(ST_B))
    assert r["rank_sum_a"] == pytest.approx(FLOOR4(wa), abs=1e-9)
    assert r["z_stat"] == pytest.approx(FLOOR4(z), abs=1e-9)
    assert r["scales_differ"] == (abs(FLOOR4(z)) > 1.96)


def test_siegel_tukey_boundary_every_n_mod4(spark, tmp_path):
    """One planted set per N mod 4 class — the closed positional form
    must match the literal simulation in all four regimes."""
    for extra in range(4):
        a = [1.0 + i for i in range(3 + extra)]
        b = [2.5, 3.5, 4.5, 5.5]
        _plant_two_samples(spark, tmp_path, a, b)
        (r,) = _run("agg_siegel_tukey", spark, tmp_path)
        wa, z = _st_model(a, b)
        assert r["rank_sum_a"] == pytest.approx(FLOOR4(wa), abs=1e-9), extra
        assert r["z_stat"] == pytest.approx(FLOOR4(z), abs=1e-9), extra


# ---------------------------------------------------------------------------
# Vargha-Delaney A: direct pair enumeration.


def test_vargha_delaney_a_exact(spark, tmp_path):
    a = [3.00, 5.00, 5.00, 8.00]
    b = [1.00, 5.00, 4.00]
    _plant_two_samples(spark, tmp_path, a, b)
    (r,) = _run("agg_vargha_delaney_a", spark, tmp_path)
    gt = sum(1 for x in a for y in b if x > y)
    eq = sum(1 for x in a for y in b if x == y)
    a_stat = (gt + 0.5 * eq) / (len(a) * len(b))
    assert (r["n_a"], r["n_b"]) == (4, 3)
    assert r["a_stat"] == pytest.approx(FLOOR6(a_stat), abs=1e-12)
    eff = max(FLOOR6(a_stat), 1 - FLOOR6(a_stat))
    want = (
        "large" if eff >= 0.71 else
        "medium" if eff >= 0.64 else
        "small" if eff >= 0.56 else "negligible"
    )
    assert r["magnitude"] == want


# ---------------------------------------------------------------------------
# TOST equivalence: closed-form z's on planted arms.


def _tost_model(a, b, margin_pct=2):
    ac = [round(v * 100) for v in a]
    bc = [round(v * 100) for v in b]
    na, nb = len(ac), len(bc)
    sa, sb = sum(ac), sum(bc)
    sa2, sb2 = sum(v * v for v in ac), sum(v * v for v in bc)
    diff = sa / na - sb / nb
    delta = margin_pct * (sa + sb) / (100.0 * (na + nb))
    se = math.sqrt(
        ((sa2 - sa * sa / na) / (na - 1)) / na
        + ((sb2 - sb * sb / nb) / (nb - 1)) / nb
    )
    return diff, delta, (diff + delta) / se, (delta - diff) / se


def test_tost_equivalent_arms(spark, tmp_path):
    # identical-mean arms with small scatter: clearly equivalent
    a = [10.00, 10.10, 9.90, 10.05, 9.95] * 8
    b = [10.02, 9.98, 10.01, 9.99] * 10
    _plant_two_samples(spark, tmp_path, a, b)
    (r,) = _run("agg_tost_equivalence", spark, tmp_path)
    diff, delta, zl, zu = _tost_model(a, b)
    assert r["mean_diff"] == pytest.approx(math.floor(diff * 100) / 1e4, abs=1e-9)
    assert r["margin"] == pytest.approx(math.floor(delta * 100) / 1e4, abs=1e-9)
    assert r["z_lower"] == pytest.approx(FLOOR4(zl), abs=1e-9)
    assert r["z_upper"] == pytest.approx(FLOOR4(zu), abs=1e-9)
    assert bool(r["equivalent"]) is True


def test_tost_shifted_arms_not_equivalent(spark, tmp_path):
    # a sits ~8% above b — far outside the 2% margin
    a = [10.80, 10.90, 10.70, 10.85] * 10
    b = [10.00, 10.10, 9.90, 10.05] * 10
    _plant_two_samples(spark, tmp_path, a, b)
    (r,) = _run("agg_tost_equivalence", spark, tmp_path)
    _, _, zl, zu = _tost_model(a, b)
    assert bool(r["equivalent"]) is False
    assert r["z_upper"] == pytest.approx(FLOOR4(zu), abs=1e-9)
    assert FLOOR4(zu) < 1.645  # the failing side


# ---------------------------------------------------------------------------
# Lin's CCC: population moments; identity / shifted / scaled exhibits.


def _ccc_model(pairs):
    xs = [round(x * 100) for x, _ in pairs]
    ys = [round(y * 100) for _, y in pairs]
    n = len(pairs)
    mx, my = sum(xs) / n, sum(ys) / n
    vx = sum(v * v for v in xs) / n - mx * mx
    vy = sum(v * v for v in ys) / n - my * my
    cxy = sum(a * b for a, b in zip(xs, ys)) / n - mx * my
    ccc = 2 * cxy / (vx + vy + (mx - my) ** 2)
    r = cxy / math.sqrt(vx * vy)
    return ccc, r


def test_lin_ccc_shifted_line(spark, tmp_path):
    # y = x + 1 dollar: r = 1 exactly, CCC < 1 (the location penalty)
    pairs = [(v, v + 1.0) for v in (2.0, 4.0, 6.0, 8.0, 10.0)]
    _plant_pairs(spark, tmp_path, pairs)
    (r,) = _run("agg_lin_ccc", spark, tmp_path)
    ccc, rr = _ccc_model(pairs)
    assert r["n_pairs"] == 5
    assert r["pearson_r"] == pytest.approx(FLOOR6(rr), abs=1e-12)
    assert r["lin_ccc"] == pytest.approx(FLOOR6(ccc), abs=1e-12)
    assert rr == pytest.approx(1.0)
    assert ccc < 1.0
    assert r["bias_correction"] == pytest.approx(
        FLOOR6(ccc / rr), abs=1e-12
    )


def test_lin_ccc_scatter(spark, tmp_path):
    pairs = [(2.0, 2.5), (4.0, 3.5), (6.0, 6.5), (8.0, 7.0), (10.0, 11.0)]
    _plant_pairs(spark, tmp_path, pairs)
    (r,) = _run("agg_lin_ccc", spark, tmp_path)
    ccc, rr = _ccc_model(pairs)
    assert r["lin_ccc"] == pytest.approx(FLOOR6(ccc), abs=1e-12)
    assert r["pearson_r"] == pytest.approx(FLOOR6(rr), abs=1e-12)


# ---------------------------------------------------------------------------
# Durbin-Watson: exact OLS + residual walk on planted daily revenue.


def _write_daily_orders(spark, tmp_path, daily):
    rows = []
    for i, tp in enumerate(daily):
        rows.append(
            (
                i,
                1,
                "O",
                float(tp),
                datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i),
                "1-URGENT",
            )
        )
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))


def _dw_model(daily):
    ys = [round(v * 100) for v in daily]
    n = len(ys)
    ts = list(range(1, n + 1))
    st, st2 = sum(ts), sum(t * t for t in ts)
    sy = sum(ys)
    sty = sum(t * y for t, y in zip(ts, ys))
    b = (n * sty - st * sy) / (n * st2 - st * st)
    a = (sy - b * st) / n
    e = [y - a - b * t for t, y in zip(ts, ys)]
    e2 = 0.0
    d2 = 0.0
    for i in range(n):
        e2 += e[i] * e[i]
        if i > 0:
            d2 += (e[i] - e[i - 1]) ** 2
    return d2 / e2


def test_durbin_watson_alternating_is_negative_autocorr(spark, tmp_path):
    # alternating residuals around a trend -> DW near 4
    daily = [100 + 2 * i + (8 if i % 2 == 0 else -8) for i in range(12)]
    _write_daily_orders(spark, tmp_path, daily)
    (r,) = _run("agg_durbin_watson", spark, tmp_path)
    dw = _dw_model(daily)
    assert r["n_days"] == 12
    assert r["dw_stat"] == pytest.approx(FLOOR4(dw), abs=1e-9)
    assert dw > 2.5 and r["verdict"] == "negative_autocorr"


def test_durbin_watson_trending_is_positive_autocorr(spark, tmp_path):
    # slow sine-ish drift around the line -> adjacent residuals agree
    daily = [
        100 + i + 12 * math.sin(i / 3.0) for i in range(16)
    ]
    _write_daily_orders(spark, tmp_path, daily)
    (r,) = _run("agg_durbin_watson", spark, tmp_path)
    dw = _dw_model(daily)
    assert r["dw_stat"] == pytest.approx(FLOOR4(dw), abs=1e-9)
    assert dw < 1.5 and r["verdict"] == "positive_autocorr"


# ---------------------------------------------------------------------------
# Kendall's W: three judges (years) ranking four items (nations), with
# a planted tie; the textbook tie-corrected W.


def _write_kw_fixture(spark, tmp_path, rev):
    """rev: {(year, nation_name): dollars}. One customer per nation,
    one order per (year, nation)."""
    nations = sorted({nk for _, nk in rev})
    n_rows = [(i, nm, 0, "") for i, nm in enumerate(nations)]
    spark.createDataFrame(
        n_rows,
        "n_nationkey long, n_name string, n_regionkey long, n_comment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "nation.parquet"))
    c_rows = [(i, f"cust{i}", i, 0.0) for i in range(len(nations))]
    spark.createDataFrame(
        c_rows,
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    o_rows = []
    k = 0
    for (yr, nm), tp in sorted(rev.items()):
        o_rows.append(
            (
                k,
                nations.index(nm),
                "O",
                float(tp),
                datetime.datetime(yr, 6, 1),
                "1-URGENT",
            )
        )
        k += 1
    spark.createDataFrame(
        o_rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))


def _kw_model(rev):
    from collections import defaultdict

    years = sorted({y for y, _ in rev})
    items = sorted({i for _, i in rev})
    m, n = len(years), len(items)
    rsum = defaultdict(float)
    tie3 = 0
    for y in years:
        vals = sorted((round(rev[(y, i)] * 100), i) for i in items)
        # midranks over cents ties
        pos = 0
        while pos < n:
            q = pos
            while q < n and vals[q][0] == vals[pos][0]:
                q += 1
            mr = (pos + 1 + q) / 2
            t = q - pos
            tie3 += t**3 - t
            for k in range(pos, q):
                rsum[vals[k][1]] += mr
            pos = q
    rbar = m * (n + 1) / 2
    s = sum((rsum[i] - rbar) ** 2 for i in items)
    w = 12 * s / (m * m * (n**3 - n) - m * tie3)
    chi2 = m * (n - 1) * w
    return n, m, w, chi2


def test_kendall_w_perfect_agreement(spark, tmp_path):
    rev = {}
    for yr in (1994, 1995, 1996):
        for i, nm in enumerate(["ALPHA", "BETA", "GAMMA", "DELTA"]):
            rev[(yr, nm)] = 100.0 * (i + 1)  # identical ranking each year
    _write_kw_fixture(spark, tmp_path, rev)
    (r,) = _run("agg_kendall_w", spark, tmp_path)
    n, m, w, chi2 = _kw_model(rev)
    assert (r["n_items"], r["m_judges"]) == (4, 3)
    assert w == pytest.approx(1.0)
    assert r["kendall_w"] == pytest.approx(FLOOR6(w), abs=1e-9)
    assert r["chi2_stat"] == pytest.approx(FLOOR4(chi2), abs=1e-9)
    # dof 3 at 5%: crit 7.8147; chi2 = 3*3*1 = 9 -> agree
    assert bool(r["rankings_agree"]) is True


def test_kendall_w_with_ties_and_disagreement(spark, tmp_path):
    rev = {
        (1994, "ALPHA"): 100.0, (1994, "BETA"): 200.0,
        (1994, "GAMMA"): 200.0, (1994, "DELTA"): 400.0,
        (1995, "ALPHA"): 400.0, (1995, "BETA"): 100.0,
        (1995, "GAMMA"): 300.0, (1995, "DELTA"): 200.0,
        (1996, "ALPHA"): 150.0, (1996, "BETA"): 250.0,
        (1996, "GAMMA"): 350.0, (1996, "DELTA"): 50.0,
    }
    _write_kw_fixture(spark, tmp_path, rev)
    (r,) = _run("agg_kendall_w", spark, tmp_path)
    n, m, w, chi2 = _kw_model(rev)
    assert r["kendall_w"] == pytest.approx(FLOOR6(w), abs=1e-9)
    assert r["chi2_stat"] == pytest.approx(FLOOR4(chi2), abs=1e-9)
    assert bool(r["rankings_agree"]) == (FLOOR4(chi2) > 7.8147)


def test_kendall_w_incomplete_item_drops(spark, tmp_path):
    rev = {
        (1994, "ALPHA"): 100.0, (1994, "BETA"): 200.0,
        (1994, "GAMMA"): 300.0,
        (1995, "ALPHA"): 110.0, (1995, "BETA"): 220.0,
        (1995, "GAMMA"): 330.0,
        # DELTA only trades one year -> must drop from the blocks
        (1995, "DELTA"): 500.0,
    }
    _write_kw_fixture(spark, tmp_path, rev)
    (r,) = _run("agg_kendall_w", spark, tmp_path)
    complete = {k: v for k, v in rev.items() if k[1] != "DELTA"}
    n, m, w, chi2 = _kw_model(complete)
    assert (r["n_items"], r["m_judges"]) == (3, 2)
    assert r["kendall_w"] == pytest.approx(FLOOR6(w), abs=1e-9)
