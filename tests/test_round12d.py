"""Round-12 planted-model sweep, part 4: exact pins for the daily-BAR
window indicators (Qstick, Balance of Power, Awesome Oscillator,
Chande Momentum, DPO, Williams %R, ATR, Donchian, Keltner, pivot
points). One planted month of two-event days (open + close, giving a
real intraday range) drives every test; each model recomputes the
indicator from the OHLC definition in plain Python."""

from __future__ import annotations

import math

import pytest

from data_ingestion_poc_spark import registry
from tests.test_round12 import _run, _write_events, spark  # noqa: F401

N_DAYS = 26


def _bar(d):
    """Deterministic two-event day: (open, close) with real range."""
    opn = 50.0 + ((7 * d * d + 3 * d) % 41)
    cls = 48.0 + ((5 * d * d + 11 * d) % 37)
    return opn, cls


BARS = [_bar(d) for d in range(N_DAYS)]


@pytest.fixture(scope="module")
def bar_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bars12d")
    rows = []
    for d, (opn, cls) in enumerate(BARS):
        rows.append((2 * d, d, 1, "purchase", opn))
        rows.append((2 * d + 1, d, 1, "purchase", cls))
    _write_events(spark, tmp, rows)
    return tmp


def _ohlc():
    """(hi, lo, opn, cls) integer cents per day."""
    out = []
    for opn, cls in BARS:
        o, c = round(opn * 100), round(cls * 100)
        out.append((max(o, c), min(o, c), o, c))
    return out


OHLC = _ohlc()
DAYS = [f"2024-01-{d + 1:02d}" for d in range(N_DAYS)]
FLOOR4 = lambda x: math.floor(x * 1e4) / 1e4  # noqa: E731


def _by_day(rows):
    return {r["day"]: r for r in rows}


# ---------------------------------------------------------------------------


def test_qstick_exact(spark, bar_dir):
    out = _by_day(_run("win_qstick", spark, bar_dir))
    for i in range(N_DAYS):
        body = sum(c - o for _, _, o, c in OHLC[max(0, i - 7) : i + 1])
        if i + 1 < 8:
            assert DAYS[i] not in out
            continue
        r = out[DAYS[i]]
        assert r["qstick"] == pytest.approx(FLOOR4(body / 800.0), abs=1e-9), i
        assert r["net_bullish"] == (body > 0)


def test_balance_of_power_exact(spark, bar_dir):
    out = _by_day(_run("win_balance_of_power", spark, bar_dir))
    bops = [
        FLOOR4((c - o) / (h - lo)) if h > lo else None
        for h, lo, o, c in OHLC
    ]
    for i in range(N_DAYS):
        frame = [b for b in bops[max(0, i - 13) : i + 1] if b is not None]
        if len(frame) < 14:
            assert DAYS[i] not in out
            continue
        r = out[DAYS[i]]
        assert r["bop"] == pytest.approx(bops[i], abs=1e-9), i
        assert r["bop_sma"] == pytest.approx(
            round(sum(frame) / 14, 4), abs=1e-9
        )


def test_awesome_oscillator_exact(spark, bar_dir):
    out = _by_day(_run("win_awesome_oscillator", spark, bar_dir))
    mid2 = [h + lo for h, lo, _, _ in OHLC]
    for i in range(N_DAYS):
        if i + 1 < 21:
            assert DAYS[i] not in out
            continue
        s_fast = sum(mid2[i - 4 : i + 1])
        s_slow = sum(mid2[i - 20 : i + 1])
        num = 21 * s_fast - 5 * s_slow
        r = out[DAYS[i]]
        assert r["awesome_osc"] == pytest.approx(
            FLOOR4(num / (2.0 * 5 * 21 * 100.0)), abs=1e-9
        ), i
        assert r["above_zero"] == (num > 0)


def test_chande_momentum_exact(spark, bar_dir):
    out = _by_day(_run("win_chande_momentum", spark, bar_dir))
    cls = [c for _, _, _, c in OHLC]
    chg = [None] + [b - a for a, b in zip(cls, cls[1:])]
    for i in range(N_DAYS):
        if i + 1 < 15:
            assert DAYS[i] not in out
            continue
        frame = [c for c in chg[i - 13 : i + 1] if c is not None]
        su = sum(c for c in frame if c > 0)
        sd = sum(-c for c in frame if c < 0)
        r = out[DAYS[i]]
        if su + sd == 0:
            assert r["cmo"] is None
        else:
            assert r["cmo"] == pytest.approx(
                FLOOR4(100.0 * (su - sd) / (su + sd)), abs=1e-9
            ), i


def test_dpo_exact(spark, bar_dir):
    out = _by_day(_run("win_dpo", spark, bar_dir))
    cls = [c for _, _, _, c in OHLC]
    span, shift = 14, 8
    for i in range(N_DAYS):
        lo_idx, hi_idx = i - (span + shift - 1), i - shift
        if lo_idx < 0:
            assert DAYS[i] not in out
            continue
        s_disp = sum(cls[lo_idx : hi_idx + 1])
        num = span * cls[i] - s_disp
        r = out[DAYS[i]]
        assert r["dpo"] == pytest.approx(
            FLOOR4(num / (span * 100.0)), abs=1e-9
        ), i
        assert r["above_trend"] == (num > 0)


def test_williams_r_exact(spark, bar_dir):
    out = _by_day(_run("win_williams_r", spark, bar_dir))
    for i in range(N_DAYS):
        if i + 1 < 14:
            assert DAYS[i] not in out
            continue
        frame = OHLC[i - 13 : i + 1]
        hh = max(h for h, *_ in frame)
        ll = min(lo for _, lo, _, _ in frame)
        r = out[DAYS[i]]
        if hh == ll:
            assert r["williams_r"] is None
            continue
        pos = (hh - OHLC[i][3]) / (hh - ll)
        assert r["williams_r"] == pytest.approx(
            FLOOR4(-100.0 * pos), abs=1e-9
        ), i
        assert r["oversold"] == (100.0 * pos >= 80)


def test_atr_exact(spark, bar_dir):
    out = _by_day(_run("win_atr", spark, bar_dir))
    trs = []
    for i, (h, lo, _, c) in enumerate(OHLC):
        if i == 0:
            tr = h - lo
        else:
            pc = OHLC[i - 1][3]
            tr = max(h - lo, abs(h - pc), abs(lo - pc))
        trs.append(tr)
        r = out[DAYS[i]]
        assert r["true_range"] == pytest.approx(round(tr / 100.0, 2), abs=1e-9)
        frame = trs[max(0, i - 13) : i + 1]
        assert r["atr"] == pytest.approx(
            round(sum(frame) / len(frame) / 100.0, 4), abs=1e-9
        ), i


def test_donchian_exact(spark, bar_dir):
    out = _by_day(_run("win_donchian", spark, bar_dir))
    for i in range(N_DAYS):
        if i == 0:
            assert DAYS[i] not in out
            continue
        frame = OHLC[max(0, i - 20) : i]
        ch_hi = max(h for h, *_ in frame)
        ch_lo = min(lo for _, lo, _, _ in frame)
        r = out[DAYS[i]]
        assert r["channel_high"] == pytest.approx(round(ch_hi / 100.0, 2), abs=1e-9)
        assert r["channel_low"] == pytest.approx(round(ch_lo / 100.0, 2), abs=1e-9)
        assert r["breakout_up"] == (OHLC[i][0] > ch_hi), i
        assert r["breakout_down"] == (OHLC[i][1] < ch_lo), i


def test_keltner_exact(spark, bar_dir):
    out = _by_day(_run("win_keltner", spark, bar_dir))
    for i in range(N_DAYS):
        if i + 1 < 10:
            assert DAYS[i] not in out
            continue
        frame = OHLC[i - 9 : i + 1]
        s_mid2 = sum(h + lo for h, lo, _, _ in frame)
        s_rng = sum(h - lo for h, lo, _, _ in frame)
        center = s_mid2 / 20.0
        band = s_rng / 10.0
        r = out[DAYS[i]]
        assert r["center"] == pytest.approx(round(center / 100.0, 4), abs=1e-9), i
        assert r["upper_band"] == pytest.approx(
            round((center + band) / 100.0, 4), abs=1e-9
        )
        assert r["lower_band"] == pytest.approx(
            round((center - band) / 100.0, 4), abs=1e-9
        )
        assert r["break_upper"] == (OHLC[i][0] > center + band)
        assert r["break_lower"] == (OHLC[i][1] < center - band)


def test_pivot_points_exact(spark, bar_dir):
    out = _by_day(_run("win_pivot_points", spark, bar_dir))
    k = 3
    for i in range(N_DAYS):
        if i < k or i >= N_DAYS - k:
            assert DAYS[i] not in out  # incomplete +/-3 window
            continue
        window = OHLC[i - k : i + k + 1]
        r = out[DAYS[i]]
        assert r["pivot_high"] == (OHLC[i][0] == max(h for h, *_ in window)), i
        assert r["pivot_low"] == (
            OHLC[i][1] == min(lo for _, lo, _, _ in window)
        ), i
    # sanity: the plant produces at least one pivot each way
    assert any(r["pivot_high"] for r in out.values())
    assert any(r["pivot_low"] for r in out.values())
