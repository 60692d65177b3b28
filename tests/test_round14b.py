"""Round-14 batch A/B planted-model tests (day-one discipline,
SURVEY section-5.2): independent pure-Python textbook models for the
method-agreement pair (Deming, Bland-Altman), the moment/scale screens
(bimodality coefficient, Cochran C, Hartley F-max, Gini mean
difference), and the ordinal-association trio (Goodman-Kruskal gamma,
Stuart tau-c, Blomqvist beta). The differential oracle cannot see
both-engines-wrong formulas — these models can (the Siegel-Tukey /
Bartels precedent)."""

from __future__ import annotations

import datetime
import math
from collections import Counter

import pytest

from tests.test_round12 import (  # noqa: F401
    _run,
    _write_events,
    _write_orders,
    spark,
)
from tests.test_round13 import _plant_pairs  # noqa: F401

FLOOR2 = lambda x: math.floor(x * 1e2) / 1e2  # noqa: E731
FLOOR4 = lambda x: math.floor(x * 1e4) / 1e4  # noqa: E731
FLOOR6 = lambda x: math.floor(x * 1e6) / 1e6  # noqa: E731

DEMING_PAIRS = [
    (5.00, 2.10),
    (4.00, 1.90),
    (1.00, 0.40),
    (9.00, 4.60),
    (3.00, 1.60),
    (6.00, 2.90),
    (7.00, 3.80),
    (2.00, 0.90),
]


def _pop_moments(xs, ys):
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    vx = sum(x * x for x in xs) / n - mx * mx
    vy = sum(y * y for y in ys) / n - my * my
    cxy = sum(x * y for x, y in zip(xs, ys)) / n - mx * my
    return n, mx, my, vx, vy, cxy


def test_deming_regression_exact(spark, tmp_path):
    _plant_pairs(spark, tmp_path, DEMING_PAIRS)
    (r,) = _run("agg_deming_regression", spark, tmp_path)
    xs = [round(x * 100) for x, _ in DEMING_PAIRS]
    ys = [round(y * 100) for _, y in DEMING_PAIRS]
    n, mx, my, vx, vy, cxy = _pop_moments(xs, ys)
    slope = ((vy - vx) + math.sqrt((vy - vx) ** 2 + 4 * cxy * cxy)) / (
        2 * cxy
    )
    assert r["n_pairs"] == n
    assert r["slope"] == pytest.approx(FLOOR6(slope), abs=1e-12)
    assert r["intercept"] == pytest.approx(
        math.floor((my - slope * mx) * 100) / 10_000, abs=1e-12
    )


def test_bland_altman_exact(spark, tmp_path):
    _plant_pairs(spark, tmp_path, DEMING_PAIRS)
    (r,) = _run("agg_bland_altman", spark, tmp_path)
    ds = [round(x * 100) - round(y * 100) for x, y in DEMING_PAIRS]
    n = len(ds)
    bias = sum(ds) / n
    sd = math.sqrt(sum((d - bias) ** 2 for d in ds) / (n - 1))
    lo_s = math.floor((bias - 1.96 * sd) * 10_000)
    hi_s = math.floor((bias + 1.96 * sd) * 10_000)
    n_in = sum(1 for d in ds if lo_s <= d * 10_000 <= hi_s)
    assert r["n_pairs"] == n
    assert r["bias"] == pytest.approx(math.floor(bias * 100) / 10_000)
    assert r["sd_diff"] == pytest.approx(math.floor(sd * 100) / 10_000)
    assert r["loa_lower"] == pytest.approx(lo_s / 10_000 / 100)
    assert r["loa_upper"] == pytest.approx(hi_s / 10_000 / 100)
    assert r["pct_within"] == pytest.approx(
        math.floor(n_in * 10_000 / n) / 100
    )


BIMODAL_VALUES = [1.0, 1.1, 1.2, 1.15, 0.95, 5.0, 5.1, 5.2, 4.9, 5.05, 3.0]


def test_bimodality_coefficient_exact(spark, tmp_path):
    rows = [
        (i, i % 3, i, ["view", "click", "purchase"][i % 3], v)
        for i, v in enumerate(BIMODAL_VALUES)
    ]
    _write_events(spark, tmp_path, rows)
    (r,) = _run("agg_bimodality_coefficient", spark, tmp_path)
    vs = [round(v * 100) for v in BIMODAL_VALUES]
    n = len(vs)
    m1 = sum(vs) / n
    m2 = sum(v * v for v in vs) / n - m1 * m1
    m3 = sum((v - m1) ** 3 for v in vs) / n
    m4 = sum((v - m1) ** 4 for v in vs) / n
    g1 = m3 / m2**1.5
    b2 = m4 / m2**2
    bc = (g1 * g1 + 1) / b2
    assert r["n"] == n
    # engine central moments expand raw power sums; allow fp slack vs
    # the direct centered model but pin the floored emissions tightly
    assert r["skewness"] == pytest.approx(FLOOR6(g1), abs=2e-6)
    assert r["kurtosis_b2"] == pytest.approx(FLOOR6(b2), abs=2e-6)
    assert r["bimodality_coeff"] == pytest.approx(FLOOR6(bc), abs=2e-6)
    # a clear two-hump mixture must flag
    assert r["bimodal"] is True or r["bimodality_coeff"] <= 0.555555


ARM_VALUES = {
    "view": [1.0, 1.1, 1.2, 0.9, 1.05],
    "click": [2.0, 2.5, 1.5, 3.0, 1.0],
    "purchase": [10.0, 30.0, 5.0, 50.0, 2.0],
    "signup": [4.0, 4.2, 3.8, 4.1, 4.05],
    "error": [0.5, 0.7, 0.6, 0.65, 0.55],
}


def _plant_arms(spark, tmp_path):
    rows = []
    eid = 0
    for et, vals in ARM_VALUES.items():
        for v in vals:
            rows.append((eid, eid % 5, eid, et, v))
            eid += 1
    _write_events(spark, tmp_path, rows)


def _arm_vars():
    out = {}
    for et, vals in ARM_VALUES.items():
        cs = [round(v * 100) for v in vals]
        n = len(cs)
        mean = sum(cs) / n
        out[et] = (n, sum((c - mean) ** 2 for c in cs) / (n - 1))
    return out


def test_cochran_c_exact(spark, tmp_path):
    _plant_arms(spark, tmp_path)
    (r,) = _run("agg_cochran_c", spark, tmp_path)
    vars_ = {et: v for et, (_, v) in _arm_vars().items()}
    sv, mv = sum(vars_.values()), max(vars_.values())
    top = min(et for et, v in vars_.items() if v == mv)
    c = mv / sv
    assert r["k"] == len(vars_)
    assert r["top_arm"] == top == "purchase"
    assert r["c_stat"] == pytest.approx(FLOOR6(c), abs=2e-6)
    assert r["variance_concentrated"] == (r["c_stat"] > 2.0 / len(vars_))


def test_hartley_fmax_exact(spark, tmp_path):
    _plant_arms(spark, tmp_path)
    (r,) = _run("agg_hartley_fmax", spark, tmp_path)
    vars_ = {et: v for et, (_, v) in _arm_vars().items()}
    mv, nv = max(vars_.values()), min(vars_.values())
    assert r["k"] == len(vars_)
    assert r["max_arm"] == min(e for e, v in vars_.items() if v == mv)
    assert r["min_arm"] == min(e for e, v in vars_.items() if v == nv)
    assert r["fmax"] == pytest.approx(FLOOR4(mv / nv), abs=2e-4)
    assert r["heteroscedastic"] == (r["fmax"] > 3.0)


def test_gini_mean_difference_exact(spark, tmp_path):
    vals = [1.0, 2.0, 2.0, 5.0, 9.0, 2.5, 0.5]
    rows = [(i, 0, i, "view", v) for i, v in enumerate(vals)]
    _write_events(spark, tmp_path, rows)
    (r,) = _run("agg_gini_mean_difference", spark, tmp_path)
    cs = [round(v * 100) for v in vals]
    n = len(cs)
    # BRUTE pair model — the closed-form lattice fold must match this
    gmd_cents = sum(
        abs(a - b) for i, a in enumerate(cs) for j, b in enumerate(cs)
        if i != j
    ) / (n * (n - 1))
    mean = sum(cs) / n
    assert r["n"] == n
    assert r["gmd"] == pytest.approx(
        math.floor(gmd_cents * 100) / 10_000, abs=1e-12
    )
    assert r["gini_ratio"] == pytest.approx(
        FLOOR6(gmd_cents / (2 * mean)), abs=2e-6
    )


DAILY_ORDERS = [
    # (day, totalprice) — one order per row, several per day
    (1, 10.0), (1, 5.0), (2, 8.0), (2, 8.0), (2, 1.0),
    (3, 30.0), (4, 2.0), (4, 2.5), (5, 20.0), (5, 1.0), (5, 1.0),
    (6, 4.0), (7, 9.0), (7, 3.0), (8, 15.0), (9, 6.0), (9, 6.5),
    (10, 11.0), (11, 2.2), (12, 7.7), (12, 1.1), (13, 13.0),
]


def _plant_daily(spark, tmp_path):
    base = datetime.date(1995, 3, 1)
    rows = [
        (i, i % 7, tp, base + datetime.timedelta(days=d), "3-MEDIUM")
        for i, (d, tp) in enumerate(DAILY_ORDERS)
    ]
    _write_orders(spark, tmp_path, rows)


def _daily_series():
    agg = {}
    for d, tp in DAILY_ORDERS:
        rev, cnt = agg.get(d, (0, 0))
        agg[d] = (rev + round(tp * 100), cnt + 1)
    days = sorted(agg)
    return days, [agg[d][0] for d in days], [agg[d][1] for d in days]


def test_gk_gamma_exact(spark, tmp_path):
    _plant_daily(spark, tmp_path)
    (r,) = _run("agg_gk_gamma", spark, tmp_path)
    days, revs, cnts = _daily_series()
    conc = disc = 0
    for i in range(len(days)):
        for j in range(i + 1, len(days)):
            p = (revs[j] - revs[i]) * (cnts[j] - cnts[i])
            conc += p > 0
            disc += p < 0
    assert r["n_days"] == len(days)
    assert (r["conc"], r["disc"]) == (conc, disc)
    assert r["gamma"] == pytest.approx(
        FLOOR6((conc - disc) / (conc + disc)), abs=1e-12
    )


def _ntile(vals, tiebreak, k):
    """Replicate SQL ntile(k) OVER (ORDER BY vals, tiebreak)."""
    order = sorted(range(len(vals)), key=lambda i: (vals[i], tiebreak[i]))
    n = len(vals)
    base, extra = divmod(n, k)
    out = [0] * n
    pos = 0
    for b in range(1, k + 1):
        size = base + (1 if b <= extra else 0)
        for _ in range(size):
            out[order[pos]] = b
            pos += 1
    return out


def test_stuart_tau_c_exact(spark, tmp_path):
    _plant_daily(spark, tmp_path)
    (r,) = _run("agg_stuart_tau_c", spark, tmp_path)
    days, revs, cnts = _daily_series()
    qx = _ntile(revs, days, 5)
    qy = _ntile(cnts, days, 5)
    n = len(days)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            p = (qx[j] - qx[i]) * (qy[j] - qy[i])
            conc += p > 0
            disc += p < 0
    tau_c = 2 * 5 * (conc - disc) / (n * n * (5 - 1))
    assert r["n_days"] == n
    assert (r["conc"], r["disc"]) == (conc, disc)
    assert r["tau_c"] == pytest.approx(FLOOR6(tau_c), abs=1e-12)


def test_blomqvist_beta_exact(spark, tmp_path):
    _plant_daily(spark, tmp_path)
    (r,) = _run("agg_blomqvist_beta", spark, tmp_path)
    days, revs, cnts = _daily_series()
    n = len(days)
    # lower median with (value, day) order: element at position
    # floor((n+1)/2) of the sorted sequence
    med_x = sorted(zip(revs, days))[(n + 1) // 2 - 1][0]
    med_y = sorted(zip(cnts, days))[(n + 1) // 2 - 1][0]
    agree = sum(
        1
        for x, y in zip(revs, cnts)
        if (x > med_x and y > med_y) or (x < med_x and y < med_y)
    )
    disagree = sum(
        1
        for x, y in zip(revs, cnts)
        if (x > med_x and y < med_y) or (x < med_x and y > med_y)
    )
    beta = (agree - disagree) / (agree + disagree)
    assert r["n_days"] == n
    assert r["n_used"] == agree + disagree
    assert r["beta"] == pytest.approx(FLOOR6(beta), abs=1e-12)
    assert r["dependent"] == (
        abs(FLOOR6(beta) * math.sqrt(agree + disagree)) > 1.96
    )
