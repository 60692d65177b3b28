"""Round-12 planted-model sweep, part 2: exact pins for the stats.py
estimation / categorical / reliability operators (capability, odds
ratio, runs, entropy rate, McNemar, median CI, Weibull, Poisson CI,
EB shrinkage, Bartlett, partial correlation, Friedman, BH step-up,
GK lambda, Theil's U, Cronbach alpha). Same doctrine as
tests/test_round12.py: the statistic comes from an independent
pure-Python textbook model on planted data; documented quantizations
(micro-unit floors, doubled ranks, A&S polynomial) are replicated as
the spec they are."""

from __future__ import annotations

import datetime
import math
import statistics

import pytest

from data_ingestion_poc_spark import registry
from tests.test_round12 import (  # noqa: F401  (shared fixtures/helpers)
    _quantile_cont,
    _run,
    _write_events,
    _write_lineitem,
    _write_orders,
    spark,
)


def _write_customer(spark, tmp_path, rows):
    """rows: (c_custkey, c_nationkey)."""
    spark.createDataFrame(
        [(k, f"Customer{k}", nk, 0.0) for k, nk in rows],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))


# ---------------------------------------------------------------------------
# Capability: Cp = width/6sd, Cpk = nearest-limit distance/3sd.


def test_capability_exact_cp_cpk(spark, tmp_path):
    vals = [100.0, 150.0, 200.0, 250.0]  # mean 175, off-center low
    _write_events(
        spark, tmp_path, [(i, 0, 1 + i, "click", v) for i, v in enumerate(vals)]
    )
    (r,) = _run("agg_capability_index", spark, tmp_path)
    mu, sd = statistics.mean(vals), statistics.stdev(vals)
    cp = (450.0 - 50.0) / (6 * sd)
    cpk = min((450.0 - mu) / (3 * sd), (mu - 50.0) / (3 * sd))
    assert r["cp"] == pytest.approx(round(cp, 4), abs=1e-9)
    assert r["cpk"] == pytest.approx(round(cpk, 4), abs=1e-9)
    assert r["capable"] == (cpk >= 1.33)
    assert cpk < cp  # off-center plant: re-center, don't re-engineer


# ---------------------------------------------------------------------------
# Odds ratio: Woolf CI over a hand 2x2.


def test_odds_ratio_exact_woolf_ci(spark, tmp_path):
    # per-order (exposed=high priority, outcome=any returned line):
    # a=6 exposed+returned, b=2 exposed clean, c=3 control+returned,
    # d=9 control clean
    orders, lines, k = [], [], 0
    for exposed, outcome, cnt in [
        (True, True, 6), (True, False, 2), (False, True, 3), (False, False, 9),
    ]:
        for _ in range(cnt):
            pri = "1-URGENT" if exposed else "5-LOW"
            orders.append((k, 1, 100.0, datetime.date(2024, 1, 1), pri))
            lines.append((k, "R" if outcome else "N", 100.0, 0.0, 1.0))
            k += 1
    _write_orders(spark, tmp_path, orders)
    _write_lineitem(spark, tmp_path, lines)
    (r,) = _run("agg_odds_ratio", spark, tmp_path)
    a, b, c, d = 6, 2, 3, 9
    orat = (a * d) / (b * c)
    half = 1.96 * math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    lo, hi = math.exp(math.log(orat) - half), math.exp(math.log(orat) + half)
    assert (r["n_exposed_outcome"], r["n_exposed_clean"]) == (a, b)
    assert (r["n_control_outcome"], r["n_control_clean"]) == (c, d)
    assert r["odds_ratio"] == pytest.approx(round(orat, 4), abs=1e-9)
    assert r["odds_ratio"] == 9.0
    assert r["ci_lo"] == pytest.approx(round(lo, 4), abs=1e-9)
    assert r["ci_hi"] == pytest.approx(round(hi, 4), abs=1e-9)
    assert r["significant"] == (not (lo <= 1.0 <= hi))


# ---------------------------------------------------------------------------
# Runs test: Wald-Wolfowitz z on the above/below-median sign sequence.


def test_runs_test_exact_z(spark, tmp_path):
    daily = [10.0, 11.0, 12.0, 13.0, 2.0, 3.0, 4.0, 5.0]  # two long runs
    _write_orders(
        spark,
        tmp_path,
        [
            (i, 1, v, datetime.date(2024, 1, 1) + datetime.timedelta(days=i), "1-URGENT")
            for i, v in enumerate(daily)
        ],
    )
    (r,) = _run("agg_runs_test", spark, tmp_path)
    cents = [round(v * 100) for v in daily]
    med = _quantile_cont(sorted(cents), 0.5)
    signs = [1 if c > med else 0 for c in cents if c != med]
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    n1, n2 = sum(signs), len(signs) - sum(signs)
    exp_r = 1.0 + 2.0 * n1 * n2 / (n1 + n2)
    var_r = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1.0))
    )
    z = (runs - exp_r) / math.sqrt(var_r)
    assert (r["n_above"], r["n_below"], r["n_runs"]) == (n1, n2, runs)
    assert r["n_runs"] == 2
    assert r["expected_runs"] == pytest.approx(round(exp_r, 4), abs=1e-9)
    assert r["z_stat"] == pytest.approx(round(z, 4), abs=1e-9)
    assert r["nonrandom"] == (abs(z) > 1.96)


# ---------------------------------------------------------------------------
# Entropy rate: non-corner conditional entropies + weighted rate.


def test_entropy_rate_exact_noncorner(spark, tmp_path):
    # u1: v,c,v,v ; u2: v,p  -> from v: c x1, v x1, p x1 (H=log2 3);
    # from c: v x1 (H=0)
    rows = [
        (0, 0, 1, "view", 1.0),
        (1, 1, 1, "click", 1.0),
        (2, 2, 1, "view", 1.0),
        (3, 3, 1, "view", 1.0),
        (4, 0, 2, "view", 1.0),
        (5, 1, 2, "purchase", 1.0),
    ]
    _write_events(spark, tmp_path, rows)
    out = {r["from_type"]: r for r in _run("agg_entropy_rate", spark, tmp_path)}
    trans = {"view": {"click": 1, "view": 1, "purchase": 1}, "click": {"view": 1}}
    total = 4
    hus = {}
    for cur, nxts in trans.items():
        row_t = sum(nxts.values())
        hus[cur] = sum(
            math.floor(-(n / row_t) * math.log(n / row_t) / math.log(2) * 1e6)
            for n in nxts.values()
        )
        assert out[cur]["n_from"] == row_t
        assert out[cur]["conditional_entropy_bits"] == pytest.approx(
            round(hus[cur] / 1e6, 6), abs=1e-9
        )
    rate = sum(
        hu * (sum(trans[cur].values()) / total) for cur, hu in hus.items()
    ) / 1e6
    for r in out.values():
        assert r["entropy_rate_bits"] == pytest.approx(round(rate, 6), abs=1e-9)
    # published constant: H(next|view) = log2(3) bits, minus at most
    # 3 micro-units (one per-term floor per transition cell)
    assert out["view"]["conditional_entropy_bits"] == pytest.approx(
        math.log2(3), abs=4e-6
    )


# ---------------------------------------------------------------------------
# McNemar on a NON-corner discordance (b != c): chi2 = (b-c)^2/(b+c).


def test_mcnemar_exact_noncorner(spark, tmp_path):
    # flags per order: (returned, late) counts a=2 both, b=5 returned
    # only, c=1 late only, d=4 neither
    orders, lines, k = [], [], 0
    for ret, late, cnt in [
        (True, True, 2), (True, False, 5), (False, True, 1), (False, False, 4),
    ]:
        for _ in range(cnt):
            od = datetime.date(2024, 1, 1)
            orders.append((k, 1, 100.0, od, "1-URGENT"))
            # ship 100 days late or same-day
            sd = od + datetime.timedelta(days=100 if late else 1)
            lines.append((k, "R" if ret else "N", 100.0, 0.0, 1.0, sd))
            k += 1
    _write_orders(spark, tmp_path, orders)
    spark.createDataFrame(
        [
            (ok, ok, 1, i, float(q), float(ep), float(disc), 0.0, rf, "O",
             datetime.datetime.combine(sd, datetime.time()))
            for i, (ok, rf, ep, disc, q, sd) in enumerate(lines)
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    (r,) = _run("agg_mcnemar_test", spark, tmp_path)
    b, c = 5, 1
    chi2 = (b - c) ** 2 / (b + c)
    assert (r["n_both"], r["n_returned_only"], r["n_late_only"], r["n_neither"]) == (2, 5, 1, 4)
    assert r["mcnemar_chi2"] == pytest.approx(round(chi2, 4), abs=1e-9)
    assert r["mcnemar_chi2"] == pytest.approx(16 / 6, abs=1e-4)
    assert r["rates_differ"] == (chi2 > 3.8415)


# ---------------------------------------------------------------------------
# Median CI: binomial order-statistic endpoints.


def test_median_ci_exact_order_stats(spark, tmp_path):
    vals = [float(v) for v in range(1, 26)]  # 1..25
    _write_events(
        spark, tmp_path, [(i, 0, 1 + i, "click", v) for i, v in enumerate(vals)]
    )
    (r,) = _run("agg_median_ci", spark, tmp_path)
    n = len(vals)
    lo_rank = math.floor((n - 1.96 * math.sqrt(n)) / 2)
    hi_rank = math.ceil(1 + (n + 1.96 * math.sqrt(n)) / 2)
    s = sorted(round(v * 100) for v in vals)
    lo = s[lo_rank - 1]  # smallest value with cum count >= rank
    hi = s[hi_rank - 1]
    med = _quantile_cont(s, 0.5) / 100.0
    assert r["n"] == n
    assert r["median"] == pytest.approx(round(med, 4), abs=1e-9)
    assert r["ci_lo"] == pytest.approx(round(lo / 100.0, 2), abs=1e-9)
    assert r["ci_hi"] == pytest.approx(round(hi / 100.0, 2), abs=1e-9)
    assert (r["ci_lo"], r["ci_hi"]) == (7.0, 19.0)  # hand ranks 7 / 19


# ---------------------------------------------------------------------------
# Weibull median-rank regression: slope/scale from Benard points.


def test_weibull_exact_benard_regression(spark, tmp_path):
    # customer 1 orders at day 0, 7, 21 -> gaps 7, 14
    # customer 2 orders at day 0, 14, 44 -> gaps 14, 30
    d0 = datetime.date(2024, 1, 1)
    rows = []
    k = 0
    for cust, offs in [(1, [0, 7, 21]), (2, [0, 14, 44])]:
        for off in offs:
            rows.append((k, cust, 100.0, d0 + datetime.timedelta(days=off), "1-URGENT"))
            k += 1
    _write_orders(spark, tmp_path, rows)
    (r,) = _run("agg_weibull_fit", spark, tmp_path)
    gaps = sorted([7, 14, 14, 30])
    n = len(gaps)
    # empirical CDF on the distinct-gap domain, excluding cum == n
    pts = []
    cum = 0
    from collections import Counter

    for tval, c in sorted(Counter(gaps).items()):
        cum += c
        if cum < n:
            pts.append(
                (math.log(tval), math.log(-math.log(1 - (cum - 0.3) / (n + 0.4))))
            )
    xs, ys = [x for x, _ in pts], [y for _, y in pts]
    m = len(pts)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    scale = math.exp(sx / m - (sy / m) / slope)
    assert r["n_intervals"] == n
    assert r["weibull_shape"] == pytest.approx(round(slope, 4), abs=1e-9)
    assert r["weibull_scale_days"] == pytest.approx(round(scale, 4), abs=1e-9)
    assert r["fit_r2"] == 1.0  # two points: exact fit
    assert r["hazard_increasing"] == (slope > 1.0)


# ---------------------------------------------------------------------------
# Poisson rate CI: n +/- 1.96 sqrt(n) over the day span.


def test_poisson_ci_exact(spark, tmp_path):
    rows = [(i, i % 5, 1, "click", 1.0) for i in range(9)]  # 9 over 5 days
    _write_events(spark, tmp_path, rows)
    (r,) = _run("agg_poisson_rate_ci", spark, tmp_path)
    n, span = 9, 5
    assert (r["n"], r["n_days"]) == (n, span)
    assert r["rate_per_day"] == pytest.approx(round(n / span, 4), abs=1e-9)
    assert r["rate_ci_lo"] == pytest.approx(
        round((n - 1.96 * 3) / span, 4), abs=1e-9
    )
    assert r["rate_ci_hi"] == pytest.approx(
        round((n + 1.96 * 3) / span, 4), abs=1e-9
    )


# ---------------------------------------------------------------------------
# EB shrinkage: Beta moment-matched prior, posterior-mean pull.


def test_eb_shrinkage_exact_posterior_means(spark, tmp_path):
    # suppliers with (lines, returns): rates 0.2, 0.4, 0.6
    supp = {1: (5, 1), 2: (5, 2), 3: (5, 3)}
    lines = []
    k = 0
    for sk, (n, x) in supp.items():
        for i in range(n):
            lines.append((k, sk, "R" if i < x else "N"))
            k += 1
    spark.createDataFrame(
        [
            (ok, ok, sk, i, 1.0, 100.0, 0.0, 0.0, rf, "O",
             datetime.datetime(2024, 1, 1))
            for i, (ok, sk, rf) in enumerate(lines)
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = {r["l_suppkey"]: r for r in _run("agg_eb_shrinkage", spark, tmp_path)}
    rates = [x / n for n, x in supp.values()]
    m, v = statistics.mean(rates), statistics.variance(rates)
    kk = m * (1 - m) / v - 1
    a, b = m * kk, (1 - m) * kk
    for sk, (n, x) in supp.items():
        r = out[sk]
        assert r["raw_rate"] == pytest.approx(round(x / n, 6), abs=1e-9)
        assert r["shrunk_rate"] == pytest.approx(
            round((a + x) / (a + b + n), 6), abs=1e-9
        )
        assert r["prior_alpha"] == pytest.approx(round(a, 4), abs=1e-9)
        assert r["prior_beta"] == pytest.approx(round(b, 4), abs=1e-9)
        # shrinkage pulls toward the prior mean
        assert abs((a + x) / (a + b + n) - m) <= abs(x / n - m) + 1e-12


# ---------------------------------------------------------------------------
# Bartlett: T from the spec's integer-quantized per-arm terms.


def test_bartlett_exact_t_stat(spark, tmp_path):
    arms = {
        "purchase": [1.0, 2.0, 9.0, 10.0],
        "click": [5.0, 5.0, 5.0, 6.0],
        "view": [3.0, 4.0, 5.0, 6.0],
    }
    rows, eid = [], 0
    for et, vals in arms.items():
        for v in vals:
            rows.append((eid, 0, 1 + eid, et, v)); eid += 1
    _write_events(spark, tmp_path, rows)
    (r,) = _run("agg_bartlett_test", spark, tmp_path)
    terms = []
    for vals in arms.values():
        cents = [round(v * 100) for v in vals]
        n = len(cents)
        s1, s2 = sum(cents), sum(c * c for c in cents)
        ss = s2 - s1 * (s1 / n)
        terms.append(
            (
                n,
                math.floor(ss),
                math.floor((n - 1) * math.log(ss / (n - 1)) * 1e6),
                math.floor(1e9 / (n - 1)),
            )
        )
    k = len(terms)
    nt = sum(n for n, *_ in terms)
    sa = sum(a for _, a, _, _ in terms)
    sb = sum(b for _, _, b, _ in terms)
    sd = sum(d for *_, d in terms)
    t_stat = ((nt - k) * math.log(sa / (nt - k)) - sb / 1e6) / (
        1 + (sd / 1e9 - 1.0 / (nt - k)) / (3.0 * (k - 1))
    )
    assert (r["k"], r["n"], r["dof"]) == (3, 12, 2)
    assert r["bartlett_t"] == pytest.approx(round(t_stat, 4), abs=1e-9)
    assert r["heteroscedastic"] == (t_stat > 5.9915)  # chi2(2)


# ---------------------------------------------------------------------------
# Partial correlation: r_xy.z from the three raw Pearson r's.


def test_partial_corr_exact(spark, tmp_path):
    # (quantity, price, discount) with deliberate confounding
    rows = [
        (1.0, 10.0, 0.01),
        (2.0, 25.0, 0.02),
        (3.0, 28.0, 0.02),
        (4.0, 50.0, 0.05),
        (5.0, 44.0, 0.04),
    ]
    _write_lineitem(
        spark,
        tmp_path,
        [(i, "A", p, d, q) for i, (q, p, d) in enumerate(rows)],
    )
    (r,) = _run("agg_partial_corr", spark, tmp_path)
    xs = [int(q) for q, _, _ in rows]
    ys = [round(p * 100) for _, p, _ in rows]
    zs = [round(d * 100) for _, _, d in rows]

    def pearson(a, b):
        n = len(a)
        sa, sb = sum(a), sum(b)
        return (n * sum(x * y for x, y in zip(a, b)) - sa * sb) / math.sqrt(
            (n * sum(x * x for x in a) - sa * sa)
            * (n * sum(y * y for y in b) - sb * sb)
        )

    rxy, rxz, ryz = pearson(xs, ys), pearson(xs, zs), pearson(ys, zs)
    partial = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    assert r["r_qty_price"] == pytest.approx(round(rxy, 6), abs=1e-9)
    assert r["r_qty_discount"] == pytest.approx(round(rxz, 6), abs=1e-9)
    assert r["r_price_discount"] == pytest.approx(round(ryz, 6), abs=1e-9)
    assert r["partial_r_qty_price"] == pytest.approx(round(partial, 6), abs=1e-9)


# ---------------------------------------------------------------------------
# Friedman: Q over doubled within-block midranks of quantized cell means.


def test_friedman_exact_q(spark, tmp_path):
    # 2 nations x 3 priorities, one order per cell with chosen price
    cells = {
        (10, "1-URGENT"): 10.0, (10, "2-HIGH"): 20.0, (10, "3-MEDIUM"): 30.0,
        (20, "1-URGENT"): 15.0, (20, "2-HIGH"): 35.0, (20, "3-MEDIUM"): 25.0,
    }
    orders, custs, k = [], {}, 0
    for (nat, pri), price in cells.items():
        ck = 100 + k
        custs[ck] = nat
        orders.append((k, ck, price, datetime.date(2024, 1, 1), pri))
        k += 1
    _write_orders(spark, tmp_path, orders)
    _write_customer(spark, tmp_path, list(custs.items()))
    (r,) = _run("agg_friedman_test", spark, tmp_path)
    # model: within each block, doubled midranks of the cell means
    blocks = {}
    for (nat, pri), price in cells.items():
        m_u = math.floor(10000.0 * round(price * 100))  # one order per cell
        blocks.setdefault(nat, []).append((pri, m_u))
    two_rj = {}
    for vals in blocks.values():
        s = sorted(m for _, m in vals)
        for pri, m in vals:
            first = s.index(m) + 1
            two_r = 2 * first + s.count(m) - 1
            two_rj[pri] = two_rj.get(pri, 0) + two_r
    kk, nb = 3, 2
    s2r = sum(v * v for v in two_rj.values())
    q = 12.0 * (s2r / 4.0) / (nb * kk * (kk + 1)) - 3.0 * nb * (kk + 1)
    assert (r["k"], r["n_blocks"], r["dof"]) == (3, 2, 2)
    assert r["friedman_q"] == pytest.approx(round(q, 4), abs=1e-9)
    assert r["treatment_effect"] == (q > 5.9915)


# ---------------------------------------------------------------------------
# Benjamini-Hochberg: the step-up cutoff over planted proportions.


def test_bh_exact_step_up(spark, tmp_path):
    # nations with (orders, urgent): one extreme, one mild, two at base
    nations = {1: (40, 38), 2: (40, 24), 3: (40, 20), 4: (40, 18)}
    orders, custs, k = [], [], 0
    for nat, (n, x) in nations.items():
        ck = 1000 + nat
        custs.append((ck, nat))
        for i in range(n):
            pri = "1-URGENT" if i < x else "5-LOW"
            orders.append((k, ck, 100.0, datetime.date(2024, 1, 1), pri))
            k += 1
    _write_orders(spark, tmp_path, orders)
    _write_customer(spark, tmp_path, custs)
    out = {r["nation"]: r for r in _run("agg_benjamini_hochberg", spark, tmp_path)}
    nt = sum(n for n, _ in nations.values())
    xt = sum(x for _, x in nations.values())
    p0 = xt / nt
    ps = {}
    for nat, (n, x) in nations.items():
        za = abs((x / n - p0) / math.sqrt(p0 * (1 - p0) / n))
        tt = 1.0 / (1.0 + 0.2316419 * za)
        poly = (
            0.319381530 * tt
            - 0.356563782 * tt**2
            + 1.781477937 * tt**3
            - 1.821255978 * tt**4
            + 1.330274429 * tt**5
        )
        ps[nat] = round(
            2.0 * (math.exp(-za * za / 2.0) / 2.5066282746310002) * poly, 10
        )
    ranked = sorted(ps.items(), key=lambda kv: (kv[1], kv[0]))
    m = len(ranked)
    cutoff = max(
        (rk for rk, (_, p) in enumerate(ranked, 1) if p <= rk * 0.05 / m),
        default=0,
    )
    for rk, (nat, p) in enumerate(ranked, 1):
        r = out[nat]
        assert r["p_value"] == pytest.approx(round(p, 6), abs=1e-9)
        assert r["p_rank"] == rk
        assert r["bh_threshold"] == pytest.approx(round(rk * 0.05 / m, 6), abs=1e-9)
        assert r["discovery"] == (rk <= cutoff)
    # the step-up rule must have fired on the extreme nation
    assert out[1]["discovery"]


# ---------------------------------------------------------------------------
# Goodman-Kruskal lambda: proportional reduction in modal error.


def test_gk_lambda_exact(spark, tmp_path):
    # contingency (priority x status): rows with different modes
    cells = {
        ("1-URGENT", "F"): 6, ("1-URGENT", "O"): 2,
        ("5-LOW", "F"): 3, ("5-LOW", "O"): 7,
    }
    orders, k = [], 0
    for (pri, st), cnt in cells.items():
        for _ in range(cnt):
            orders.append(
                (k, 1, "status:" + st, 100.0, datetime.date(2024, 1, 1), pri)
            )
            k += 1
    spark.createDataFrame(
        [
            (ok, c, st.split(":")[1], tp, datetime.datetime.combine(d, datetime.time()), pri)
            for ok, c, st, tp, d, pri in orders
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    (r,) = _run("agg_goodman_kruskal_lambda", spark, tmp_path)
    n = sum(cells.values())
    row_modes = {}
    for (pri, _), cnt in cells.items():
        row_modes[pri] = max(row_modes.get(pri, 0), cnt)
    col_tot = {}
    for (_, st), cnt in cells.items():
        col_tot[st] = col_tot.get(st, 0) + cnt
    col_mode = max(col_tot.values())
    lam = (sum(row_modes.values()) - col_mode) / (n - col_mode)
    assert r["n"] == n and r["col_mode"] == col_mode == 9
    assert r["sum_row_modes"] == sum(row_modes.values()) == 13
    assert r["lambda_y_given_x"] == pytest.approx(round(lam, 6), abs=1e-9)
    assert r["lambda_y_given_x"] == pytest.approx(round(4 / 9, 6), abs=1e-9)


# ---------------------------------------------------------------------------
# Theil's U: MI / marginal entropies with the 6-dp per-term rounding.


def test_theils_u_exact(spark, tmp_path):
    cells = {
        ("1-URGENT", "F"): 6, ("1-URGENT", "O"): 2,
        ("5-LOW", "F"): 3, ("5-LOW", "O"): 7,
    }
    orders, k = [], 0
    for (pri, st), cnt in cells.items():
        for _ in range(cnt):
            orders.append((k, 1, st, 100.0, datetime.date(2024, 1, 1), pri))
            k += 1
    spark.createDataFrame(
        [
            (ok, c, st, tp, datetime.datetime.combine(d, datetime.time()), pri)
            for ok, c, st, tp, d, pri in orders
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    (r,) = _run("agg_theils_u", spark, tmp_path)
    n = sum(cells.values())
    row_t, col_t = {}, {}
    for (x, y), c in cells.items():
        row_t[x] = row_t.get(x, 0) + c
        col_t[y] = col_t.get(y, 0) + c
    mi = sum(
        round((c / n) * math.log2(c * n / (row_t[x] * col_t[y])), 6)
        for (x, y), c in cells.items()
    )
    h_y = sum(round(-(s / n) * math.log2(s / n), 6) for s in col_t.values())
    h_x = sum(round(-(s / n) * math.log2(s / n), 6) for s in row_t.values())
    assert r["mi_bits"] == pytest.approx(round(mi, 6), abs=1e-9)
    assert r["h_y"] == pytest.approx(round(h_y, 6), abs=1e-9)
    assert r["h_x"] == pytest.approx(round(h_x, 6), abs=1e-9)
    assert r["u_y_given_x"] == pytest.approx(round(mi / h_y, 6), abs=1e-9)
    assert r["u_x_given_y"] == pytest.approx(round(mi / h_x, 6), abs=1e-9)


# ---------------------------------------------------------------------------
# Cronbach alpha: k/(k-1) * (1 - sum item var / total var), population
# variances.


def test_cronbach_alpha_exact(spark, tmp_path):
    # items per row: (quantity, discount c-units, tax c-units)
    rows = [(1.0, 0.02, 0.01), (2.0, 0.04, 0.03), (3.0, 0.05, 0.06), (4.0, 0.08, 0.07)]
    spark.createDataFrame(
        [
            (i, i, 1, i, float(q), 100.0, float(d), float(x), "N", "O",
             datetime.datetime(2024, 1, 1))
            for i, (q, d, x) in enumerate(rows)
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    (r,) = _run("agg_cronbach_alpha", spark, tmp_path)
    qs = [int(q) for q, _, _ in rows]
    ds = [round(d * 100) for _, d, _ in rows]
    xs = [round(x * 100) for _, _, x in rows]
    ts = [a + b + c for a, b, c in zip(qs, ds, xs)]

    def pvar(v):
        n = len(v)
        return sum(x * x for x in v) / n - (sum(v) / n) ** 2

    item_var = pvar(qs) + pvar(ds) + pvar(xs)
    total_var = pvar(ts)
    alpha = (3.0 / 2.0) * (1 - item_var / total_var)
    assert r["sum_item_var"] == pytest.approx(round(item_var, 6), abs=1e-9)
    assert r["total_var"] == pytest.approx(round(total_var, 6), abs=1e-9)
    assert r["alpha"] == pytest.approx(round(alpha, 6), abs=1e-9)


# ---------------------------------------------------------------------------
# Winsorized mean: exact [p5, p95] clamp-then-average.


def test_winsorized_mean_exact_clamped_average(spark, tmp_path):
    prices = [float(v) for v in (10, 20, 30, 40, 50, 60, 70, 80, 90, 1000)]
    _write_lineitem(
        spark, tmp_path, [(i, "A", p, 0.0, 1.0) for i, p in enumerate(prices)]
    )
    (r,) = _run("agg_winsorized_mean", spark, tmp_path)
    s = sorted(prices)
    lo, hi = _quantile_cont(s, 0.05), _quantile_cont(s, 0.95)
    clamped = [min(max(p, lo), hi) for p in prices]
    assert r["n"] == len(prices)
    assert r["raw_mean"] == pytest.approx(
        round(statistics.mean(prices), 2), abs=1e-9
    )
    assert r["winsorized_mean"] == pytest.approx(
        round(statistics.mean(clamped), 2), abs=1e-9
    )
    assert r["p05"] == pytest.approx(round(lo, 2), abs=1e-9)
    assert r["p95"] == pytest.approx(round(hi, 2), abs=1e-9)
