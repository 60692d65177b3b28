"""Round-12 planted-model sweep, part 7: exact mid-range pins for the
ml-metrics family (AUC with ties, Brier + Murphy decomposition, log
loss + skill, PR thresholds, lift deciles, MCC, Cohen's kappa) and
Neyman allocation. The existing r8/r9 tests pinned corners (perfect
separation, all-tied); a wrong constant factor can leave corners
intact, so these add interior exact values. The deterministic logistic
score is the documented fixture spec and is replicated; every METRIC
formula is recomputed independently in plain Python."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from data_ingestion_poc_spark import registry
from tests.test_round12 import _run, _write_events, spark  # noqa: F401

#: Planted (value, is_purchase) rows: scores straddle 0.5 with a tie
#: group at value 70 and imperfect separation (some low-score
#: purchases, some high-score clicks).
ROWS = [
    (30.0, 0), (30.0, 1), (40.0, 0), (45.0, 0), (50.0, 1),
    (55.0, 0), (60.0, 1), (70.0, 1), (70.0, 0), (70.0, 1),
    (80.0, 1), (90.0, 0),
]


def _plant(spark, tmp_path):
    _write_events(
        spark,
        tmp_path,
        [
            (i, 0, 1 + i, "purchase" if y else "click", v)
            for i, (v, y) in enumerate(ROWS)
        ],
    )


def _scored():
    """(y, p_u) pairs under the documented logistic spec."""
    out = []
    for v, y in ROWS:
        p = 1 / (1 + math.exp(-(v - 50) / 20.0))
        out.append((y, round(p * 1e6)))
    return out


# ---------------------------------------------------------------------------


def test_auc_exact_with_ties(spark, tmp_path):
    _plant(spark, tmp_path)
    (r,) = _run("agg_auc_roc", spark, tmp_path)
    sc = _scored()
    pos = [p for y, p in sc if y]
    neg = [p for y, p in sc if not y]
    # AUC = P(pos > neg) + 0.5 P(tie), by direct pair enumeration
    wins = sum(1 for a in pos for b in neg if a > b)
    ties = sum(1 for a in pos for b in neg if a == b)
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert (r["n_pos"], r["n_neg"]) == (len(pos), len(neg))
    assert r["auc"] == pytest.approx(round(auc, 6), abs=1e-9)
    assert 0.5 < r["auc"] < 1.0  # interior, not a corner


def test_brier_exact_murphy_terms(spark, tmp_path):
    _plant(spark, tmp_path)
    (r,) = _run("agg_brier_score", spark, tmp_path)
    sc = _scored()
    n = len(sc)
    brier = sum((p / 1e6 - y) ** 2 for y, p in sc) / n
    buckets = {}
    for y, p in sc:
        b = min(p * 10 // 1_000_000, 9)
        cnt, pos, sp = buckets.get(b, (0, 0, 0))
        buckets[b] = (cnt + 1, pos + y, sp + p)
    base = sum(y for y, _ in sc) / n
    rel = sum(
        cnt * (sp / 1e6 / cnt - pos / cnt) ** 2
        for cnt, pos, sp in buckets.values()
    ) / n
    res = sum(
        cnt * (pos / cnt - base) ** 2 for cnt, pos, sp in buckets.values()
    ) / n
    assert r["n"] == n
    assert r["brier"] == pytest.approx(round(brier, 6), abs=1e-9)
    assert r["reliability"] == pytest.approx(round(rel, 6), abs=1e-9)
    assert r["resolution"] == pytest.approx(round(res, 6), abs=1e-9)
    assert r["uncertainty"] == pytest.approx(
        round(base * (1 - base), 6), abs=1e-9
    )
    # Murphy identity over the BUCKETED forecasts: using each bucket's
    # mean forecast, brier_bucketed = rel - res + unc exactly
    brier_bucketed = sum(
        (sp / 1e6 / cnt - y) ** 2
        for cnt, pos, sp in buckets.values()
        for y in [1] * pos + [0] * (cnt - pos)
    ) / n
    assert brier_bucketed == pytest.approx(
        rel - res + base * (1 - base), abs=1e-12
    )


def test_log_loss_exact(spark, tmp_path):
    _plant(spark, tmp_path)
    (r,) = _run("agg_log_loss", spark, tmp_path)
    sc = _scored()
    n = len(sc)
    st = sum(
        math.floor(
            -(
                y * math.log(min(max(p, 1), 999_999) / 1e6)
                + (1 - y) * math.log(1 - min(max(p, 1), 999_999) / 1e6)
            )
            * 1e6
        )
        for y, p in sc
    )
    ll = st / 1e6 / n
    base = sum(y for y, _ in sc) / n
    h = -(base * math.log(base) + (1 - base) * math.log(1 - base))
    assert r["log_loss"] == pytest.approx(round(ll, 6), abs=1e-9)
    assert r["baseline_entropy"] == pytest.approx(round(h, 6), abs=1e-9)
    assert r["skill"] == pytest.approx(round(1 - ll / h, 6), abs=1e-9)


def test_pr_thresholds_exact(spark, tmp_path):
    _plant(spark, tmp_path)
    out = {r["tau"]: r for r in _run("agg_pr_thresholds", spark, tmp_path)}
    sc = _scored()
    pos_total = sum(y for y, _ in sc)
    for tau in (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9):
        pred = [(y, p) for y, p in sc if p >= tau * 1e6]
        tp = sum(y for y, _ in pred)
        r = out[tau]
        assert r["predicted_pos"] == len(pred), tau
        assert r["true_pos"] == tp
        if pred:
            assert r["precision"] == pytest.approx(
                round(tp / len(pred), 6), abs=1e-9
            )
        else:
            assert r["precision"] is None
        assert r["recall"] == pytest.approx(
            round(tp / pos_total, 6), abs=1e-9
        )


def test_lift_deciles_exact(spark, tmp_path):
    _plant(spark, tmp_path)
    out = {r["decile"]: r for r in _run("agg_lift_deciles", spark, tmp_path)}
    sc = _scored()
    n = len(sc)
    base = sum(y for y, _ in sc) / n
    groups = {}
    for y, p in sc:
        cnt, pos = groups.get(p, (0, 0))
        groups[p] = (cnt + 1, pos + y)
    cum = 0
    dec = {}
    for p in sorted(groups, reverse=True):
        cnt, pos = groups[p]
        d = min(10 * cum // n, 9)  # the documented tie rule
        dn, dp = dec.get(d, (0, 0))
        dec[d] = (dn + cnt, dp + pos)
        cum += cnt
    assert set(out) == set(dec)
    for d, (dn, dp) in dec.items():
        r = out[d]
        assert (r["n"], r["responders"]) == (dn, dp), d
        assert r["response_rate"] == pytest.approx(round(dp / dn, 6), abs=1e-9)
        assert r["lift"] == pytest.approx(round(dp / dn / base, 4), abs=1e-9)


def test_mcc_exact_interior(spark, tmp_path):
    _plant(spark, tmp_path)
    (r,) = _run("agg_matthews_corr", spark, tmp_path)
    sc = _scored()
    tp = sum(1 for y, p in sc if y and p >= 500_000)
    fp = sum(1 for y, p in sc if not y and p >= 500_000)
    fn = sum(1 for y, p in sc if y and p < 500_000)
    tn = sum(1 for y, p in sc if not y and p < 500_000)
    mcc = (tp * tn - fp * fn) / (
        math.sqrt(tp + fp) * math.sqrt(tp + fn)
        * math.sqrt(tn + fp) * math.sqrt(tn + fn)
    )
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (tp, fp, fn, tn)
    assert r["mcc"] == pytest.approx(round(mcc, 6), abs=1e-9)
    assert 0 < r["mcc"] < 1  # interior


def test_kappa_exact_interior(spark, tmp_path):
    _plant(spark, tmp_path)
    (r,) = _run("agg_cohens_kappa", spark, tmp_path)
    sc = _scored()
    n = len(sc)
    tp = sum(1 for y, p in sc if y and p >= 500_000)
    tn = sum(1 for y, p in sc if not y and p < 500_000)
    pred_pos = sum(1 for _, p in sc if p >= 500_000)
    true_pos = sum(y for y, _ in sc)
    po = (tp + tn) / n
    pe = (pred_pos / n) * (true_pos / n) + ((n - pred_pos) / n) * (
        (n - true_pos) / n
    )
    kappa = (po - pe) / (1 - pe)
    assert r["observed_agreement"] == pytest.approx(round(po, 6), abs=1e-9)
    assert r["chance_agreement"] == pytest.approx(round(pe, 6), abs=1e-9)
    assert r["kappa"] == pytest.approx(round(kappa, 6), abs=1e-9)
    assert 0 < r["kappa"] < 1


# ---------------------------------------------------------------------------
# Neyman allocation: n_h = floor(B * N_h S_h / sum(N S)).


def test_neyman_allocation_exact(spark, tmp_path):
    docs = {
        "en": ["a" * 10, "b" * 30, "c" * 50],  # spread
        "de": ["x" * 20, "y" * 20, "z" * 20, "w" * 20],  # zero spread
        "fr": ["p" * 5, "q" * 95],  # wide spread, small stratum
    }
    rows, i = [], 0
    for lg, texts in docs.items():
        for tx in texts:
            rows.append((i, tx, lg, "web", len(tx)))
            i += 1
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["lang"]: r for r in _run("sample_neyman_allocation", spark, tmp_path)}
    w_u = {}
    for lg, texts in docs.items():
        lens = [len(t) for t in texts]
        n_h = len(lens)
        var = sum(x * x for x in lens) / n_h - (sum(lens) / n_h) ** 2
        sd_u = math.floor(math.sqrt(var) * 1e6)  # micro-unit spec
        w_u[lg] = (n_h, sd_u, n_h * sd_u)
    tot = sum(w for _, _, w in w_u.values())
    for lg, (n_h, sd_u, w) in w_u.items():
        r = out[lg]
        assert r["n_h"] == n_h
        assert r["stratum_sd"] == pytest.approx(round(sd_u / 1e6, 4), abs=1e-9)
        assert r["n_alloc"] == (200 * w) // tot, lg
        assert r["alloc_share"] == pytest.approx(round(w / tot, 6), abs=1e-9)
    # the zero-spread stratum gets nothing; floor under-spend bounded
    assert out["de"]["n_alloc"] == 0
    spent = sum(r["n_alloc"] for r in out.values())
    assert 200 - (len(docs) - 1) <= spent <= 200
