"""Semantics tests for the round-8 additions: the binary-classifier
evaluation family (AUC, Brier decomposition, log loss, PR thresholds,
lift deciles). Oracle parity is covered by check_oracle / the driver;
these pin hand-computable values and edge behavior."""

from __future__ import annotations

import datetime
import math

import pytest

from data_ingestion_poc_spark import registry

SF001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from data_ingestion_poc_spark.session import get_spark

    return get_spark(shuffle_partitions=4)


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, user_id, event_type, value)."""
    base = datetime.datetime(2024, 1, 1)
    data = [
        (eid, base + datetime.timedelta(minutes=eid), uid, et, float(v), None)
        for eid, uid, et, v in rows
    ]
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def _sep_rows(n=20):
    """Perfectly separable: purchases at value 100, clicks at value 0."""
    rows = [(i, 1, "purchase", 100.0) for i in range(n)]
    rows += [(100 + i, 1, "click", 0.0) for i in range(n)]
    return rows


# --- agg_auc_roc


def test_auc_perfect_separation(spark, tmp_path):
    _write_events(spark, tmp_path, _sep_rows())
    r = registry.get("agg_auc_roc").fn(spark, str(tmp_path)).collect()[0]
    assert r["n_pos"] == 20 and r["n_neg"] == 20
    assert r["auc"] == 1.0


def test_auc_all_tied_is_half(spark, tmp_path):
    rows = [(i, 1, "purchase", 50.0) for i in range(5)]
    rows += [(10 + i, 1, "click", 50.0) for i in range(7)]
    _write_events(spark, tmp_path, rows)
    r = registry.get("agg_auc_roc").fn(spark, str(tmp_path)).collect()[0]
    assert r["auc"] == 0.5


# --- agg_brier_score


def test_brier_murphy_identity(spark, tmp_path):
    # two distinct scores => p constant within each bucket => the
    # bucketed Murphy identity brier = rel - res + unc holds exactly
    _write_events(spark, tmp_path, _sep_rows())
    r = registry.get("agg_brier_score").fn(spark, str(tmp_path)).collect()[0]
    assert r["n"] == 40
    assert r["brier"] == pytest.approx(
        r["reliability"] - r["resolution"] + r["uncertainty"], abs=2e-5
    )
    # base rate 0.5 => uncertainty 0.25
    assert r["uncertainty"] == pytest.approx(0.25, abs=1e-6)


# --- agg_log_loss


def test_log_loss_constant_half_prediction(spark, tmp_path):
    # value 50 => p = 0.5 exactly => log loss = ln 2; base rate 0.5
    # => baseline entropy = ln 2 => skill = 0
    rows = [(i, 1, "purchase", 50.0) for i in range(8)]
    rows += [(10 + i, 1, "click", 50.0) for i in range(8)]
    _write_events(spark, tmp_path, rows)
    r = registry.get("agg_log_loss").fn(spark, str(tmp_path)).collect()[0]
    assert r["log_loss"] == pytest.approx(math.log(2), abs=1e-5)
    assert r["baseline_entropy"] == pytest.approx(math.log(2), abs=1e-5)
    assert r["skill"] == pytest.approx(0.0, abs=1e-4)


def test_log_loss_skill_positive_when_separating(spark, tmp_path):
    _write_events(spark, tmp_path, _sep_rows())
    r = registry.get("agg_log_loss").fn(spark, str(tmp_path)).collect()[0]
    assert 0.0 < r["skill"] < 1.0
    assert r["log_loss"] < r["baseline_entropy"]


# --- agg_pr_thresholds


def test_pr_thresholds_shape_and_monotonicity(spark, tmp_path):
    _write_events(spark, tmp_path, _sep_rows())
    rows = (
        registry.get("agg_pr_thresholds")
        .fn(spark, str(tmp_path))
        .orderBy("tau")
        .collect()
    )
    assert len(rows) == 9
    recalls = [r["recall"] for r in rows]
    assert recalls == sorted(recalls, reverse=True)
    # score of positives is 1/(1+e^-2.5) ~ 0.924: every tau <= 0.9
    # keeps all positives; negatives (~0.076) admitted only at tau 0.1 x
    lo, hi = rows[0], rows[-1]
    assert lo["recall"] == 1.0
    assert hi["recall"] == 1.0 and hi["precision"] == 1.0


# --- agg_lift_deciles


def test_lift_deciles_partition_and_top_lift(spark, tmp_path):
    _write_events(spark, tmp_path, _sep_rows())
    rows = (
        registry.get("agg_lift_deciles")
        .fn(spark, str(tmp_path))
        .orderBy("decile")
        .collect()
    )
    assert sum(r["n"] for r in rows) == 40
    # two tied score groups of 20 => two deciles: 0 (all positives,
    # lift 2.0 over base rate 0.5) and 5 (all negatives, lift 0)
    by_decile = {r["decile"]: r for r in rows}
    assert by_decile[0]["response_rate"] == 1.0
    assert by_decile[0]["lift"] == pytest.approx(2.0, abs=1e-4)
    assert min(r["response_rate"] for r in rows) == 0.0


# --- agg_bartlett_test


def test_bartlett_identical_arms_low_t(spark, tmp_path):
    # identical spreads in both arms => T ~ 0, verdict homoscedastic
    vals = [10.0, 20.0, 30.0, 40.0, 50.0] * 4
    rows = [(i, 1, "purchase", v) for i, v in enumerate(vals)]
    rows += [(100 + i, 1, "click", v) for i, v in enumerate(vals)]
    _write_events(spark, tmp_path, rows)
    r = registry.get("agg_bartlett_test").fn(spark, str(tmp_path)).collect()[0]
    assert r["k"] == 2 and r["dof"] == 1
    assert abs(r["bartlett_t"]) < 0.01
    assert not r["heteroscedastic"]


def test_bartlett_wild_variance_gap_flags(spark, tmp_path):
    rows = [(i, 1, "purchase", 50.0 + (i % 2)) for i in range(40)]
    rows += [(100 + i, 1, "click", 50.0 + 200.0 * (i % 2)) for i in range(40)]
    _write_events(spark, tmp_path, rows)
    r = registry.get("agg_bartlett_test").fn(spark, str(tmp_path)).collect()[0]
    assert r["heteroscedastic"]


# --- quality_outlier_iqr


def test_iqr_outliers_hand_case(spark, tmp_path):
    # 20 values at 10..29 plus one wild 1000 => exactly one outlier
    rows = [(i, 1, "view", float(10 + i)) for i in range(20)]
    rows.append((99, 1, "view", 1000.0))
    _write_events(spark, tmp_path, rows)
    r = registry.get("quality_outlier_iqr").fn(spark, str(tmp_path)).collect()[0]
    assert r["n"] == 21 and r["n_outliers"] == 1
    assert r["lo_fence"] < 10 and 29 < r["hi_fence"] < 1000


# --- win_atr


def test_atr_gap_beats_plain_range(spark, tmp_path):
    # day 1: values 10..20 (close 20); day 2: tight range 100..101 —
    # true range on day 2 must span the gap from prev close (|101-20|)
    rows = [(1, 1, "view", 10.0), (2, 1, "view", 20.0)]
    rows += [(1500, 1, "view", 100.0), (1501, 1, "view", 101.0)]
    _write_events(spark, tmp_path, rows)
    out = {
        r["day"]: r
        for r in registry.get("win_atr").fn(spark, str(tmp_path)).collect()
    }
    # first bar seeds with plain high-low (Wilder); second bar's TR
    # spans the gap from the previous close
    assert out["2024-01-01"]["true_range"] == pytest.approx(10.0)
    assert out["2024-01-02"]["true_range"] == pytest.approx(81.0)
    assert out["2024-01-02"]["atr"] == pytest.approx(45.5)


# --- agg_partial_corr / agg_friedman_test (shape on fixture data)


def test_partial_corr_bounds(spark):
    r = registry.get("agg_partial_corr").fn(spark, SF001).collect()[0]
    for c in (
        "r_qty_price",
        "r_qty_discount",
        "r_price_discount",
        "partial_r_qty_price",
    ):
        assert -1.0 <= r[c] <= 1.0
    assert r["n"] > 0


def test_friedman_complete_blocks(spark):
    r = registry.get("agg_friedman_test").fn(spark, SF001).collect()[0]
    assert r["k"] >= 2 and r["n_blocks"] >= 2
    assert r["dof"] == r["k"] - 1


# --- corpus_lang_quotas


def _write_docs(spark, tmp_path, rows):
    """rows: (doc_id, text, lang, source)."""
    data = [(i, txt, lang, src, len(txt)) for i, txt, lang, src in rows]
    spark.createDataFrame(
        data,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_lang_quotas_caps_dominant_language(spark, tmp_path):
    # en holds 8/11 tokens (73%) => capped at 25%; others untouched
    rows = [(i, "a b c d", "en", "s") for i in range(2)]  # 8 en tokens
    rows += [(10, "x y", "fr", "s"), (11, "u", "de", "s")]  # 3 others
    _write_docs(spark, tmp_path, rows)
    out = {
        r["lang"]: r
        for r in registry.get("corpus_lang_quotas")
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out["en"]["capped"] and not out["fr"]["capped"]
    assert out["en"]["kept_tokens"] == int(0.25 * 11)
    assert out["fr"]["sampling_rate"] == 1.0
    assert out["en"]["sampling_rate"] < 1.0


# --- text_vocab_coverage


def test_vocab_coverage_monotone_and_bounded(spark):
    rows = (
        registry.get("text_vocab_coverage")
        .fn(spark, SF001)
        .orderBy("vocab_size")
        .collect()
    )
    assert [r["vocab_size"] for r in rows] == [100, 1000, 10000]
    covs = [r["coverage"] for r in rows]
    assert covs == sorted(covs) and covs[-1] <= 1.0
    assert rows[0]["total_occurrences"] == rows[-1]["total_occurrences"]


# --- embed_hubness


def test_hubness_moments_consistent(spark):
    r = registry.get("embed_hubness").fn(spark, SF001).collect()[0]
    assert r["k"] == 10 and r["n"] > 0
    # every query contributes exactly k occurrences => max >= k on any
    # non-degenerate space, antihubs strictly fewer than n
    assert r["max_k_occ"] >= r["k"]
    assert 0 <= r["n_antihubs"] < r["n"]
    assert r["k_occurrence_skewness"] is not None


# --- graph_modularity


def test_modularity_bounds_and_sum(spark):
    rows = registry.get("graph_modularity").fn(spark, SF001).collect()
    q = rows[0]["modularity"]
    assert all(r["modularity"] == q for r in rows)
    assert -1.0 <= q <= 1.0
    assert sum(r["q_term"] for r in rows) == pytest.approx(q, abs=1e-4)
    # degree sums count both endpoints of every edge
    assert sum(r["degree_sum"] for r in rows) % 2 == 0


# --- profile_column_entropy


def test_column_entropy_normalized_bounds(spark):
    rows = registry.get("profile_column_entropy").fn(spark, SF001).collect()
    cols = {r["column_name"] for r in rows}
    assert "orders.o_orderstatus" in cols and "documents.lang" in cols
    for r in rows:
        assert 0.0 <= r["normalized"] <= 1.0 + 1e-9
        assert r["entropy_nats"] >= 0.0


def test_column_entropy_constant_column_zero(spark, tmp_path):
    _write_docs(spark, tmp_path, [(i, "t", "en", "s") for i in range(5)])
    # only the documents.lang column exists in this fixture dir; the
    # loader reads tables lazily so the other profiled tables must be
    # present — copy them from the smoke fixture
    import shutil

    for tbl in ("orders", "customer", "events"):
        shutil.copy(
            f"{SF001}/{tbl}.parquet", str(tmp_path / f"{tbl}.parquet")
        )
    rows = registry.get("profile_column_entropy").fn(spark, str(tmp_path)).collect()
    lang = [r for r in rows if r["column_name"] == "documents.lang"][0]
    assert lang["n_distinct"] == 1
    assert lang["entropy_nats"] == 0.0 and lang["normalized"] == 0.0


# --- stream_topk_per_window


def test_stream_topk_rank_depth(spark):
    rows = (
        registry.get("stream_topk_per_window").fn(spark, SF001).collect()
    )
    assert rows
    per_win = {}
    for r in rows:
        per_win.setdefault(r["window_start"], []).append(r)
    for win, rs in per_win.items():
        assert len(rs) <= 3
        ranks = sorted(x["rk"] for x in rs)
        assert ranks == list(range(1, len(rs) + 1))
        counts = [x["n_events"] for x in sorted(rs, key=lambda x: x["rk"])]
        assert counts == sorted(counts, reverse=True)


# --- sample_temporal_split


def test_temporal_split_segments(spark):
    rows = {
        r["segment"]: r
        for r in registry.get("sample_temporal_split")
        .fn(spark, SF001)
        .collect()
    }
    assert set(rows) <= {"train", "embargo", "test"}
    assert "train" in rows and "test" in rows
    assert rows["train"]["n_events"] > rows["test"]["n_events"]
    # overlap column is constant context on every row
    ov = {r["train_test_user_overlap"] for r in rows.values()}
    assert len(ov) == 1


# --- join_geo_bbox


def test_geo_bbox_counts_nonnegative_and_regions_complete(spark):
    rows = registry.get("join_geo_bbox").fn(spark, SF001).collect()
    assert len(rows) == 25  # one box per nation, empties kept
    assert all(r["n_points"] >= 0 for r in rows)
    assert any(r["n_points"] > 0 for r in rows)


# --- win_donchian


def test_donchian_excludes_today(spark, tmp_path):
    # three days: 10, 50, 20 — day-2 channel is day-1's bar only, so
    # its 50 breaks out; day-3 sits inside the widened channel
    rows = [(1, 1, "view", 10.0), (1500, 1, "view", 50.0),
            (3000, 1, "view", 20.0)]
    _write_events(spark, tmp_path, rows)
    out = {
        r["day"]: r
        for r in registry.get("win_donchian").fn(spark, str(tmp_path)).collect()
    }
    assert "2024-01-01" not in out  # empty trailing window drops
    assert out["2024-01-02"]["channel_high"] == 10.0
    assert out["2024-01-02"]["breakout_up"]
    assert out["2024-01-03"]["channel_high"] == 50.0
    assert not out["2024-01-03"]["breakout_up"]


# --- win_pivot_points


def test_pivot_points_hand_case(spark, tmp_path):
    # 7 days with a clear peak on day 4: only day 4 is a pivot high
    vals = [10, 20, 30, 90, 30, 20, 10]
    rows = [(i * 1500 + 1, 1, "view", float(v)) for i, v in enumerate(vals)]
    _write_events(spark, tmp_path, rows)
    out = registry.get("win_pivot_points").fn(spark, str(tmp_path)).collect()
    # with K=3, only the middle day has a complete two-sided window
    assert len(out) == 1
    assert out[0]["day"] == "2024-01-04"
    assert out[0]["pivot_high"] and not out[0]["pivot_low"]


# --- privacy_pseudonymize


def test_pseudonymize_integrity(spark):
    rows = registry.get("privacy_pseudonymize").fn(spark, SF001).collect()
    assert rows
    assert all(r["tokens_collision_free"] for r in rows)
    assert all(r["referential_integrity"] for r in rows)
    assert all(len(r["token"]) == 16 for r in rows)


# --- fn_business_days


def test_business_days_closed_form(spark):
    import datetime as dt

    rows = registry.get("fn_business_days").fn(spark, SF001).collect()
    assert rows
    for r in rows[:50]:
        d0 = dt.date.fromisoformat(r["order_date"])
        d1 = dt.date.fromisoformat(r["ship_date"])
        sign = 1 if d1 >= d0 else -1
        lo, hi = min(d0, d1), max(d0, d1)
        expect = sign * sum(
            1
            for i in range(1, (hi - lo).days + 1)
            if (lo + dt.timedelta(days=i)).isoweekday() <= 5
        )
        assert r["business_days"] == expect


# --- privacy_suppression_smallcell


def test_suppression_hides_small_cells(spark):
    rows = registry.get("privacy_suppression_smallcell").fn(spark, SF001).collect()
    for r in rows:
        hidden = r["primary_suppressed"] or r["complementary_suppressed"]
        assert (r["n_orders"] is None) == hidden
        assert (r["revenue"] is None) == hidden
        if r["n_orders"] is not None:
            assert r["n_orders"] >= 5


def test_suppression_complementary_rule(spark):
    rows = registry.get("privacy_suppression_smallcell").fn(spark, SF001).collect()
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r["nation"], []).append(r)
    for nation, rs in by_nation.items():
        n_prim = sum(1 for r in rs if r["primary_suppressed"])
        n_comp = sum(1 for r in rs if r["complementary_suppressed"])
        if n_prim == 1:
            assert n_comp >= 1, f"nation {nation}: lone cell unprotected"
        if n_prim == 0:
            assert n_comp == 0


# --- agg_benjamini_hochberg


def test_bh_step_up_rule(spark):
    import math

    rows = sorted(
        registry.get("agg_benjamini_hochberg").fn(spark, SF001).collect(),
        key=lambda r: r["p_rank"],
    )
    m = len(rows)
    passing = [r["p_rank"] for r in rows if r["p_value"] <= r["p_rank"] * 0.05 / m]
    k = max(passing) if passing else 0
    for r in rows:
        assert r["discovery"] == (r["p_rank"] <= k)
        assert 0.0 <= r["p_value"] <= 1.0 + 1e-9
        assert math.isclose(
            r["bh_threshold"], round(r["p_rank"] * 0.05 / m, 6), abs_tol=1e-9
        )


# --- stream_hll_active_users_bound


def test_stream_hll_bound_holds(spark):
    rows = (
        registry.get("stream_hll_active_users_bound")
        .fn(spark, SF001)
        .collect()
    )
    assert rows
    assert all(r["within_bound"] for r in rows)
    assert all(r["exact_users"] >= 1 for r in rows)
