"""Round-12 planted-model sweep, part 3: exact pins for the per-USER
stream window indicators (RSI, Bollinger, stochastic, ulcer, OBV,
EWMA + crossover, Holt, Kalman, Theil-Sen, seasonal baseline, SPC
rules, z-score, CUSUM, drawdown, rolling median/MAD/distinct, NTILE,
VWAP). Models are independent pure-Python implementations of each
indicator's published definition over the same planted series;
documented lattice quantizations are replicated as spec."""

from __future__ import annotations

import datetime
import math
import statistics

import pytest

from data_ingestion_poc_spark import registry
from tests.test_round12 import (  # noqa: F401
    _run,
    _write_events,
    _write_lineitem,
    spark,
)

#: One deterministic "price path" reused across stream indicators —
#: 2-dp values with mixed up/down moves and a mid-series spike.
SERIES = [
    50.00, 51.25, 50.75, 52.10, 53.00, 52.40, 54.15, 55.00, 54.30, 56.20,
    55.10, 57.35, 58.00, 57.25, 59.40, 60.10, 59.00, 61.25, 62.50, 61.75,
    63.10, 64.00, 62.90, 65.25, 66.40,
]


def _plant_series(spark, tmp_path, vals=SERIES, uid=1):
    _write_events(
        spark, tmp_path, [(i, 0, uid, "click", v) for i, v in enumerate(vals)]
    )


# ---------------------------------------------------------------------------
# RSI (Cutler): 100 * sum(gains) / (sum(gains) + sum(losses)).


def test_rsi_exact_cutler(spark, tmp_path):
    _plant_series(spark, tmp_path)
    out = {r["event_id"]: r for r in _run("win_rsi", spark, tmp_path)}
    diffs = [None] + [
        round(b - a, 2) for a, b in zip(SERIES, SERIES[1:])
    ]
    for i in range(len(SERIES)):
        frame = [d for d in diffs[max(0, i - 13) : i + 1] if d is not None]
        r = out[i]
        assert r["n_diffs"] == len(frame)
        if len(frame) == 14:
            sg = round(sum(d for d in frame if d > 0), 2)
            sl = round(sum(-d for d in frame if d < 0), 2)
            rsi = 100 * sg / (sg + sl)
            assert r["rsi"] == pytest.approx(
                math.floor(rsi * 1e4) / 1e4, abs=1e-9
            ), i
            assert r["is_overbought"] == (rsi > 70)
            assert r["is_oversold"] == (rsi < 30)
        else:
            assert r["rsi"] is None


# ---------------------------------------------------------------------------
# Bollinger: trailing-20 mean +/- 2 sample sd, %B position.


def test_bollinger_exact_bands(spark, tmp_path):
    _plant_series(spark, tmp_path)
    out = {r["event_id"]: r for r in _run("win_bollinger", spark, tmp_path)}
    cents = [round(v * 100) for v in SERIES]
    for i in range(len(SERIES)):
        frame = cents[max(0, i - 19) : i + 1]
        r = out[i]
        if len(frame) < 20:
            assert r["boll_mid"] is None
            continue
        # sums fold as exact integer cents on both engines; divide in
        # the same order (sum/100 then /n) to stay bit-identical
        n = 20
        s1 = sum(frame) / 100
        s2 = sum(c * c for c in frame) / 10_000
        mid = s1 / n
        sd = math.sqrt(max((s2 - s1 * s1 / n) / (n - 1), 0.0))
        fs = lambda x: math.floor(x * 1e4) / 1e4  # noqa: E731
        assert r["boll_mid"] == pytest.approx(fs(mid), abs=1e-9), i
        assert r["boll_upper"] == pytest.approx(fs(mid + 2 * sd), abs=1e-9)
        assert r["boll_lower"] == pytest.approx(fs(mid - 2 * sd), abs=1e-9)
        assert r["pct_b"] == pytest.approx(
            fs((frame[-1] / 100 - (mid - 2 * sd)) / (4 * sd)), abs=1e-9
        )


# ---------------------------------------------------------------------------
# Stochastic %K / %D.


def test_stochastic_exact_k_and_d(spark, tmp_path):
    _plant_series(spark, tmp_path)
    out = {r["event_id"]: r for r in _run("win_stochastic_oscillator", spark, tmp_path)}
    cents = [round(v * 100) for v in SERIES]
    ks = []
    for i in range(len(SERIES)):
        frame = cents[max(0, i - 13) : i + 1]
        if len(frame) == 14 and max(frame) > min(frame):
            k = (
                math.floor(
                    100.0 * (cents[i] - min(frame)) / (max(frame) - min(frame)) * 1e4
                )
                / 1e4
            )
        else:
            k = None
        ks.append(k)
        r = out[i]
        if k is None:
            assert r["pct_k"] is None
        else:
            assert r["pct_k"] == pytest.approx(k, abs=1e-9), i
        dframe = [x for x in ks[max(0, i - 2) : i + 1] if x is not None]
        if len(dframe) == 3:
            assert r["pct_d"] == pytest.approx(
                round(sum(dframe) / 3, 4), abs=1e-9
            )
        else:
            assert r["pct_d"] is None


# ---------------------------------------------------------------------------
# Ulcer index: RMS of trailing-14 percentage drawdowns from running peak.


def test_ulcer_exact_rms_drawdown(spark, tmp_path):
    _plant_series(spark, tmp_path)
    out = {r["event_id"]: r for r in _run("win_ulcer_index", spark, tmp_path)}
    cents = [round(v * 100) for v in SERIES]
    dd2 = []
    peak = 0
    for c in cents:
        peak = max(peak, c)
        dd2.append(math.floor((100.0 * (peak - c) / peak) ** 2 * 1e4))
    for i in range(len(SERIES)):
        r = out[i]
        if i < 13:
            assert r["ulcer_index"] is None
        else:
            ui = math.sqrt(sum(dd2[i - 13 : i + 1]) / (14 * 1e4))
            assert r["ulcer_index"] == pytest.approx(round(ui, 6), abs=1e-9), i


# ---------------------------------------------------------------------------
# OBV: cumulative up-minus-down tick count.


def test_obv_exact_prefix(spark, tmp_path):
    vals = [10.0, 11.0, 11.0, 10.5, 12.0, 11.0, 13.0]
    _plant_series(spark, tmp_path, vals)
    out = {r["event_id"]: r for r in _run("win_obv", spark, tmp_path)}
    obv, prev = 0, None
    for i, v in enumerate(vals):
        c = round(v * 100)
        if prev is not None:
            obv += (c > prev) - (c < prev)
        prev = c
        assert out[i]["obv"] == obv
    assert out[len(vals) - 1]["obv"] == 1  # hand: +1+0-1+1-1+1


# ---------------------------------------------------------------------------
# EWMA (adjust=True, alpha=1/2, 16-row truncation).


def _ewma_model(frame):
    n = len(frame)
    num = sum(x * 0.5 ** (n - 1 - i) for i, x in enumerate(frame))
    return num / (2.0 - 0.5 ** (n - 1))


def test_ewma_exact_weighted_fold(spark, tmp_path):
    _plant_series(spark, tmp_path)
    out = {r["event_id"]: r for r in _run("win_ewma", spark, tmp_path)}
    for i in range(len(SERIES)):
        frame = SERIES[max(0, i - 15) : i + 1]
        assert out[i]["ewma"] == pytest.approx(
            round(_ewma_model(frame), 6), abs=1e-9
        ), i


def test_ewma_crossover_exact_stances(spark, tmp_path):
    _plant_series(spark, tmp_path)
    out = {r["event_id"]: r for r in _run("win_ewma_crossover", spark, tmp_path)}
    stances = []
    for i in range(len(SERIES)):
        fast = math.floor(_ewma_model(SERIES[max(0, i - 3) : i + 1]) * 1e4)
        slow = math.floor(_ewma_model(SERIES[max(0, i - 15) : i + 1]) * 1e4)
        st = 1 if fast > slow else -1 if fast < slow else 0
        stances.append(st)
        r = out[i]
        assert r["stance"] == st, i
        prev = stances[i - 1] if i else None
        want = None
        if prev is not None and prev != st and st != 0:
            want = "golden_cross" if st == 1 else "death_cross"
        assert r["crossover"] == want, i


# ---------------------------------------------------------------------------
# Holt linear: l = x/2 + (l+t)/2 ; t = (l_new - l_prev)/4 + 3t/4.


def test_holt_exact_recursion(spark, tmp_path):
    vals = SERIES[:12]
    _plant_series(spark, tmp_path, vals)
    out = {r["event_id"]: r for r in _run("win_holt_linear", spark, tmp_path)}
    for i in range(len(vals)):
        frame = vals[max(0, i - 15) : i + 1]
        level, trend = frame[0], 0.0
        for x in frame[1:]:
            new_l = x * 0.5 + (level + trend) * 0.5
            trend = (new_l - level) * 0.25 + trend * 0.75
            level = new_l
        fs = lambda x: math.floor(x * 1e6) / 1e6  # noqa: E731
        r = out[i]
        assert r["holt_level"] == pytest.approx(fs(level), abs=1e-9), i
        assert r["holt_trend"] == pytest.approx(fs(trend), abs=1e-9)
        assert r["forecast_next"] == pytest.approx(fs(level + trend), abs=1e-9)


# ---------------------------------------------------------------------------
# Kalman 1-D: predict p+q, gain k=(p+q)/(p+q+1), update.


def test_kalman_exact_recursion(spark, tmp_path):
    vals = SERIES[:10]
    _plant_series(spark, tmp_path, vals)
    out = {r["event_id"]: r for r in _run("win_kalman_1d", spark, tmp_path)}
    for i in range(len(vals)):
        frame = vals[max(0, i - 15) : i + 1]
        x, p = frame[0], 1.0
        for z in frame[1:]:
            p_pred = p + 0.25
            k = p_pred / (p_pred + 1.0)
            x = x + k * (z - x)
            p = (1.0 - k) * p_pred
        fs = lambda v: math.floor(v * 1e6) / 1e6  # noqa: E731
        r = out[i]
        assert r["kalman_x"] == pytest.approx(fs(x), abs=1e-9), i
        assert r["kalman_p"] == pytest.approx(fs(p), abs=1e-9)


# ---------------------------------------------------------------------------
# Theil-Sen: median of all pairwise slopes over the trailing 9 rows.


def test_theil_sen_exact_pairwise_median(spark, tmp_path):
    vals = [10.0, 12.0, 11.0, 15.0, 14.0, 18.0, 17.0, 21.0, 20.0, 24.0]
    _plant_series(spark, tmp_path, vals)
    out = {r["event_id"]: r for r in _run("win_theil_sen", spark, tmp_path)}
    for i in range(len(vals)):
        a = vals[max(0, i - 8) : i + 1]
        slopes = sorted(
            (a[j] - a[k]) / (j - k)
            for k in range(len(a))
            for j in range(k + 1, len(a))
        )
        r = out[i]
        assert r["n_slopes"] == len(slopes)
        if not slopes:
            assert r["theil_sen_slope"] is None
            continue
        m = len(slopes)
        med = (
            slopes[m // 2]
            if m % 2 == 1
            else (slopes[m // 2 - 1] + slopes[m // 2]) / 2
        )
        assert r["theil_sen_slope"] == pytest.approx(
            math.floor(med * 1e6) / 1e6, abs=1e-9
        ), i


# ---------------------------------------------------------------------------
# Seasonal baseline: (type, hour) cell mean/sigma, 3-sigma flag.


def test_seasonal_baseline_exact_cells(spark, tmp_path):
    rows, eid = [], 0
    cells = {8: [10.0, 12.0, 14.0, 16.0], 20: [100.0, 110.0, 120.0, 90.0]}
    for h, vals in cells.items():
        for d, v in enumerate(vals):
            rows.append(
                (eid, datetime.datetime(2024, 1, 1 + d, h, 0, 0), 1, "click", v)
            )
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = {r["event_id"]: r for r in _run("win_seasonal_baseline", spark, tmp_path)}
    eid = 0
    for h, vals in cells.items():
        s1 = round(sum(vals), 2)
        s2 = round(sum(v * v for v in vals), 2)
        n = len(vals)
        mu = s1 / n
        sigma = math.sqrt((s2 - s1 * s1 / n) / (n - 1))
        for v in vals:
            r = out[eid]
            assert r["hour_of_day"] == h
            assert r["seasonal_mean"] == pytest.approx(
                math.floor(mu * 1e4) / 1e4, abs=1e-9
            )
            assert r["residual"] == pytest.approx(
                math.floor((v - mu) * 1e4) / 1e4, abs=1e-9
            )
            assert r["is_anomaly"] == (n >= 30 and abs(v - mu) > 3 * sigma)
            eid += 1


# ---------------------------------------------------------------------------
# SPC Western Electric rules on a crafted series.


def test_spc_rules_exact_flags(spark, tmp_path):
    # global limits come from the one event type's own mean/sd
    vals = [50.0, 52.0, 48.0, 51.0, 49.0, 50.0, 52.0, 48.0, 51.0, 49.0,
            50.0, 52.0, 48.0, 51.0, 49.0, 50.0, 90.0]  # one extreme point
    _plant_series(spark, tmp_path, vals)
    out = {r["event_id"]: r for r in _run("win_spc_rules", spark, tmp_path)}
    cents = [round(v * 100) for v in vals]
    n = len(cents)
    s1, s2 = sum(cents), sum(c * c for c in cents)
    mu = s1 / 100.0 / n
    sigma = math.sqrt((s2 / 1e4 - (s1 / 100.0) ** 2 / n) / (n - 1))
    sides = [1 if v > mu else -1 if v < mu else 0 for v in vals]
    b3 = [abs(v - mu) > 3 * sigma for v in vals]
    b2 = [
        1 if v - mu > 2 * sigma else -1 if mu - v > 2 * sigma else 0
        for v in vals
    ]
    for i in range(n):
        r = out[i]
        assert r["rule1_beyond_3s"] == b3[i], i
        w3 = b2[max(0, i - 2) : i + 1]
        r2 = w3.count(1) >= 2 or w3.count(-1) >= 2
        assert r["rule2_two_of_three"] == r2, i
        w8 = sides[max(0, i - 7) : i + 1]
        r4 = i >= 7 and (w8.count(1) == 8 or w8.count(-1) == 8)
        assert r["rule4_run_of_8"] == r4, i
        assert r["out_of_control"] == (b3[i] or r2 or r4)
    # the crafted extreme must actually fire rule 1
    assert out[16]["rule1_beyond_3s"]


# ---------------------------------------------------------------------------
# Z-score anomaly: exact z against the strictly-preceding frame.


def test_zscore_exact_value(spark, tmp_path):
    vals = [10.0, 12.0, 11.0, 13.0, 10.0, 12.0, 11.0, 13.0, 10.0, 12.0,
            11.0, 13.0, 60.0]
    _plant_series(spark, tmp_path, vals)
    out = _run("win_zscore_anomaly", spark, tmp_path)
    assert [r["event_id"] for r in out] == [12]
    base = vals[:12]
    mu, sd = statistics.mean(base), statistics.stdev(base)
    z = (60.0 - mu) / sd
    assert out[0]["n_baseline"] == 12
    assert out[0]["z"] == pytest.approx(round(z, 3), abs=1e-9)


# ---------------------------------------------------------------------------
# CUSUM: the emitted statistic equals the TEXTBOOK recursion
# S_i = max(0, S_{i-1} + dev_i) — an independent model of the
# prefix-min identity the engine uses.


def test_cusum_exact_vs_textbook_recursion(spark, tmp_path):
    vals = [50.0, 70.0, 80.0, 90.0, 200.0, 250.0, 300.0, 40.0, 350.0]
    _plant_series(spark, tmp_path, vals)
    out = {r["event_id"]: r for r in _run("win_cusum_drift", spark, tmp_path)}
    s = 0.0
    model = []
    for v in vals:
        s = max(0.0, s + (v - 60.0))
        model.append(s)
    for i, m in enumerate(model):
        if m > 400.0:
            assert out[i]["cusum"] == pytest.approx(round(m, 4), abs=1e-9), i
        else:
            assert i not in out, i
    assert out, "plant must alarm"


# ---------------------------------------------------------------------------
# Drawdown: exact running peak / drawdown / max drawdown.


def test_drawdown_exact_running(spark, tmp_path):
    vals = [100.0, 120.0, 90.0, 110.0, 80.0, 130.0]
    _plant_series(spark, tmp_path, vals)
    out = {r["event_id"]: r for r in _run("win_drawdown", spark, tmp_path)}
    peak, worst = 0.0, 0.0
    for i, v in enumerate(vals):
        peak = max(peak, v)
        dd = (peak - v) / peak
        worst = max(worst, dd)
        r = out[i]
        assert r["peak"] == peak
        assert r["drawdown"] == pytest.approx(round(dd, 6), abs=1e-9)
        assert r["max_drawdown"] == pytest.approx(round(worst, 6), abs=1e-9)
    assert out[4]["max_drawdown"] == pytest.approx(round(1 / 3, 6), abs=1e-9)


# ---------------------------------------------------------------------------
# Rolling median: exact midpoint pick incl. even frames.


def test_median_rolling_exact(spark, tmp_path):
    vals = [5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0]
    _plant_series(spark, tmp_path, vals)
    out = {r["event_id"]: r for r in _run("win_median_rolling", spark, tmp_path)}
    for i in range(len(vals)):
        frame = sorted(vals[max(0, i - 20) : i + 1])
        m = len(frame)
        med = frame[m // 2] if m % 2 == 1 else (frame[m // 2 - 1] + frame[m // 2]) / 2
        assert out[i]["n_frame"] == m
        assert out[i]["med_21"] == pytest.approx(round(med, 6), abs=1e-9), i


# ---------------------------------------------------------------------------
# MAD anomaly: exact modified z on a flagged spike.


def test_mad_exact_robust_z(spark, tmp_path):
    vals = [10.0, 10.5, 9.5, 10.0, 10.5, 9.5, 10.0, 10.5, 9.5, 10.0, 50.0]
    _plant_series(spark, tmp_path, vals)
    out = _run("win_mad_anomaly", spark, tmp_path)
    assert [r["event_id"] for r in out] == [10]
    frame = sorted(vals)

    def med(a):
        m = len(a)
        return a[m // 2] if m % 2 == 1 else (a[m // 2 - 1] + a[m // 2]) / 2

    md = med(frame)
    mad = med(sorted(abs(x - md) for x in frame))
    rz = (50.0 - md) / (1.4826 * mad)
    assert out[0]["med_21"] == pytest.approx(round(md, 6), abs=1e-9)
    assert out[0]["mad_21"] == pytest.approx(round(mad, 6), abs=1e-9)
    assert out[0]["robust_z"] == pytest.approx(round(rz, 3), abs=1e-9)


# ---------------------------------------------------------------------------
# Distinct rolling: exact per-frame distinct type counts.


def test_distinct_rolling_exact(spark, tmp_path):
    types = ["view", "click", "view", "purchase", "click", "view"]
    _write_events(
        spark, tmp_path, [(i, 0, 1, et, 1.0) for i, et in enumerate(types)]
    )
    out = {r["event_id"]: r for r in _run("win_distinct_rolling", spark, tmp_path)}
    for i in range(len(types)):
        frame = types[max(0, i - 19) : i + 1]
        assert out[i]["distinct_types_20"] == len(set(frame))
        assert out[i]["n_frame"] == len(frame)


# ---------------------------------------------------------------------------
# NTILE quartiles: exact NTILE(4) semantics vs the closed-form model.


def test_ntile_exact_quartile_assignment(spark, tmp_path):
    # 10 customers in one segment: quartile sizes must be 3,3,2,2
    bals = [5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0, 4.0, 6.0, 10.0]
    spark.createDataFrame(
        [(i, f"C{i}", 0, "BUILDING", float(b)) for i, b in enumerate(bals)],
        "c_custkey long, c_name string, c_nationkey long,"
        " c_mktsegment string, c_acctbal double",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    out = {r["c_custkey"]: r for r in _run("win_ntile_quartiles", spark, tmp_path)}
    order = sorted(range(len(bals)), key=lambda i: (bals[i], i))
    n, k = len(bals), 4
    base, rem = n // k, n % k
    tile_of = {}
    pos = 0
    for tile in range(1, k + 1):
        size = base + (1 if tile <= rem else 0)
        for ck in order[pos : pos + size]:
            tile_of[ck] = tile
        pos += size
    for ck, tile in tile_of.items():
        assert out[ck]["balance_quartile"] == tile, ck


# ---------------------------------------------------------------------------
# VWAP: exact cumulative revenue / quantity per part.


def test_vwap_exact_running_ratio(spark, tmp_path):
    # one part, lines shipped on successive days
    lines = [(10.0, 2.0), (30.0, 3.0), (20.0, 5.0)]
    spark.createDataFrame(
        [
            (i, 7, 1, i, float(q), float(ep), 0.0, 0.0, "N", "O",
             datetime.datetime(2024, 1, 1 + i))
            for i, (ep, q) in enumerate(lines)
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = sorted(_run("win_vwap", spark, tmp_path), key=lambda r: r["l_orderkey"])
    cum_c = cum_q = 0
    for r, (ep, q) in zip(out, lines):
        cum_c += round(ep * 100)
        cum_q += int(q)
        assert r["cum_cents"] == cum_c and r["cum_qty"] == cum_q
        assert r["vwap"] == pytest.approx(
            math.floor(cum_c / 100.0 / cum_q * 1e4) / 1e4, abs=1e-9
        )
    assert out[-1]["vwap"] == 6.0  # hand: 60 / 10
