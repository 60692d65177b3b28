"""Round-13 mini-batch-2 planted pins: Cox-Stuart trend, Bartels rank
von Neumann, paired sign test."""

from __future__ import annotations

import math

import pytest

from tests.test_round12 import _run, spark  # noqa: F401
from tests.test_round13 import _plant_pairs, _write_daily_orders

FLOOR4 = lambda x: math.floor(x * 1e4) / 1e4  # noqa: E731


def _cox_stuart_model(daily):
    ys = [round(v * 100) for v in daily]
    n = len(ys)
    off = math.ceil(n / 2)
    pairs = [(ys[i], ys[i + off]) for i in range(n - off)]
    k = sum(1 for a, b in pairs if a != b)
    plus = sum(1 for a, b in pairs if b > a)
    z = (2 * plus - k) / math.sqrt(k)
    return k, plus, z


def test_cox_stuart_increasing(spark, tmp_path):
    daily = [100 + 3 * i + (5 if i % 3 == 0 else -2) for i in range(13)]
    _write_daily_orders(spark, tmp_path, daily)
    (r,) = _run("agg_cox_stuart", spark, tmp_path)
    k, plus, z = _cox_stuart_model(daily)
    assert (r["n_pairs"], r["n_plus"]) == (k, plus)
    assert r["z_stat"] == pytest.approx(FLOOR4(z), abs=1e-9)
    assert r["trend"] == (
        "none" if abs(FLOOR4(z)) <= 1.96
        else "increasing" if 2 * plus > k else "decreasing"
    )
    assert r["trend"] == "increasing"  # planted upward drift


def test_cox_stuart_tie_drops_and_no_trend(spark, tmp_path):
    # even n with one exact tie across halves and no real drift
    daily = [100, 105, 95, 102, 100, 98, 104, 101]
    _write_daily_orders(spark, tmp_path, daily)
    (r,) = _run("agg_cox_stuart", spark, tmp_path)
    k, plus, z = _cox_stuart_model(daily)
    assert (r["n_pairs"], r["n_plus"]) == (k, plus)
    assert k == 3  # pair (100, 100) dropped as a tie
    assert r["z_stat"] == pytest.approx(FLOOR4(z), abs=1e-9)
    assert r["trend"] == "none"


def _bartels_model(daily):
    ys = [round(v * 100) for v in daily]
    n = len(ys)
    # midranks in value order, applied back in day order
    by_v = {}
    for v in sorted(set(ys)):
        lt = sum(1 for u in ys if u < v)
        eq = sum(1 for u in ys if u == v)
        by_v[v] = lt + (eq + 1) / 2
    r = [by_v[v] for v in ys]
    rbar = (n + 1) / 2
    nm = sum((r[i] - r[i + 1]) ** 2 for i in range(n - 1))
    d = sum((x - rbar) ** 2 for x in r)
    rvn = nm / d
    var = 4.0 * (n - 2) * (5.0 * n * n - 2 * n - 9) / (
        5.0 * n * (n + 1) * (n - 1) ** 2
    )
    z = (rvn - 2) / math.sqrt(var)
    return rvn, z


def test_bartels_trending_series(spark, tmp_path):
    # monotone-ish series: adjacent ranks close -> RVN well below 2
    daily = [100 + 5 * i + (1 if i % 2 == 0 else -1) for i in range(14)]
    _write_daily_orders(spark, tmp_path, daily)
    (r,) = _run("agg_bartels_rank", spark, tmp_path)
    rvn, z = _bartels_model(daily)
    assert r["n_days"] == 14
    assert r["rvn_stat"] == pytest.approx(FLOOR4(rvn), abs=1e-9)
    assert r["z_stat"] == pytest.approx(FLOOR4(z), abs=1e-9)
    assert rvn < 2 and r["verdict"] == "positive_serial_corr"


def test_bartels_alternating_series_with_tie(spark, tmp_path):
    # alternating high/low (negative serial corr), one tied value pair
    daily = [100, 200, 101, 201, 102, 202, 103, 203, 100, 204, 104, 205]
    _write_daily_orders(spark, tmp_path, daily)
    (r,) = _run("agg_bartels_rank", spark, tmp_path)
    rvn, z = _bartels_model(daily)
    assert r["rvn_stat"] == pytest.approx(FLOOR4(rvn), abs=1e-9)
    assert r["z_stat"] == pytest.approx(FLOOR4(z), abs=1e-9)
    assert rvn > 2
    assert r["verdict"] == (
        "random" if abs(FLOOR4(z)) <= 1.96 else "negative_serial_corr"
    )


def test_sign_test_exact(spark, tmp_path):
    pairs = (
        [(5.0, 2.0)] * 9      # +
        + [(2.0, 5.0)] * 2    # -
        + [(3.0, 3.0)] * 3    # ties drop
    )
    _plant_pairs(spark, tmp_path, pairs)
    (r,) = _run("agg_sign_test", spark, tmp_path)
    n, k = 11, 9
    z = (2 * k - n) / math.sqrt(n)
    assert (r["n_pairs"], r["n_plus"]) == (n, k)
    assert r["z_stat"] == pytest.approx(FLOOR4(z), abs=1e-9)
    assert bool(r["location_shifted"]) == (abs(FLOOR4(z)) > 1.96)
    assert bool(r["location_shifted"]) is True
