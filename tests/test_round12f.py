"""Round-12 NEW-operator planted-model tests (mandatory from day one,
SURVEY section-5.2): exact pins for the r12 batch — bias-corrected
Cramer's V, Cohen's h, Ansari-Bradley, Somers' D, Kaufman ER, Force
Index, Ease of Movement, Choppiness, Katz fractal dimension, resource
allocation, preferential attachment, and the forced exact hubness
audit. Same doctrine as the sweep files: independent pure-Python
textbook models on planted data."""

from __future__ import annotations

import datetime
import hashlib
import math

import pytest

from data_ingestion_poc_spark import registry
from tests.test_round12 import _run, _write_events, spark  # noqa: F401
from tests.test_round12d import BARS, DAYS, N_DAYS, OHLC, bar_dir  # noqa: F401
from tests.test_round12e import BB_EDGES, _bb_adj, _write_bipartite
from tests.test_round11 import _plant_two_samples  # noqa: F401

FLOOR4 = lambda x: math.floor(x * 1e4) / 1e4  # noqa: E731
FLOOR6 = lambda x: math.floor(x * 1e6) / 1e6  # noqa: E731


# ---------------------------------------------------------------------------
# Bias-corrected Cramer's V (Bergsma 2013) on a planted 2x2.


def test_cramers_v_corrected_exact(spark, tmp_path):
    cells = {
        ("1-URGENT", "F"): 30, ("1-URGENT", "O"): 10,
        ("5-LOW", "F"): 10, ("5-LOW", "O"): 30,
    }
    rows, k = [], 0
    for (pri, st), cnt in cells.items():
        for _ in range(cnt):
            rows.append((k, 1, st, 100.0, datetime.datetime(2024, 1, 1), pri))
            k += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    (r,) = _run("agg_cramers_v_corrected", spark, tmp_path)
    n = sum(cells.values())
    row_t, col_t = {}, {}
    for (x, y), c in cells.items():
        row_t[x] = row_t.get(x, 0) + c
        col_t[y] = col_t.get(y, 0) + c
    chi2 = 0.0
    for (x, y), c in sorted(cells.items()):  # the engines' (x,y) fold order
        exp = row_t[x] * col_t[y] / n
        chi2 += (c - exp) ** 2 / exp
    rr, cc = 2, 2
    phi2c = max(chi2 / n - (rr - 1) * (cc - 1) / (n - 1), 0.0)
    r_adj = rr - (rr - 1) ** 2 / (n - 1)
    c_adj = cc - (cc - 1) ** 2 / (n - 1)
    v = math.sqrt(chi2 / n / min(rr - 1, cc - 1))
    vc = math.sqrt(phi2c / min(r_adj - 1, c_adj - 1))
    # hand check: the classic 2x2 [[30,10],[10,30]] has chi2 = 20
    assert r["chi2"] == pytest.approx(20.0, abs=1e-4)
    assert (r["n"], r["n_rows"], r["n_cols"]) == (80, 2, 2)
    assert r["cramers_v"] == pytest.approx(FLOOR6(v), abs=1e-9)
    assert r["cramers_v_corrected"] == pytest.approx(FLOOR6(vc), abs=1e-9)
    assert r["cramers_v_corrected"] < r["cramers_v"]  # the bias correction


# ---------------------------------------------------------------------------
# Cohen's h: arcsine-difference effect size between hash-arm rates.


def test_cohens_h_exact(spark, tmp_path):
    users = list(range(1, 61))
    arms = {
        u: "t"
        if hashlib.md5(f"srm:{u}".encode()).hexdigest()[0] in "01234567"
        else "c"
        for u in users
    }
    rows, eid = [], 0
    # every 2nd treatment user converts; every 4th control user does
    conv = {"t": 0, "c": 0}
    converted = {}
    for u in users:
        a = arms[u]
        conv[a] += 1
        converted[u] = (conv[a] % 2 == 0) if a == "t" else (conv[a] % 4 == 0)
        rows.append((eid, 0, u, "view", 1.0)); eid += 1
        if converted[u]:
            rows.append((eid, 0, u, "purchase", 5.0)); eid += 1
    _write_events(spark, tmp_path, rows)
    (r,) = _run("agg_cohens_h", spark, tmp_path)
    n1 = sum(1 for u in users if arms[u] == "t")
    x1 = sum(1 for u in users if arms[u] == "t" and converted[u])
    n2 = len(users) - n1
    x2 = sum(1 for u in users if arms[u] == "c" and converted[u])
    h = 2 * math.asin(math.sqrt(x1 / n1)) - 2 * math.asin(math.sqrt(x2 / n2))
    assert (r["n_treatment"], r["n_control"]) == (n1, n2)
    assert r["p_treatment"] == pytest.approx(round(x1 / n1, 6), abs=1e-9)
    assert r["p_control"] == pytest.approx(round(x2 / n2, 6), abs=1e-9)
    assert r["cohens_h"] == pytest.approx(FLOOR4(h), abs=1e-9)
    want = (
        "large" if abs(h) >= 0.8 else "medium" if abs(h) >= 0.5
        else "small" if abs(h) >= 0.2 else "negligible"
    )
    assert r["magnitude"] == want


# ---------------------------------------------------------------------------
# Ansari-Bradley: min-of-end-distance rank scores, published moments.


def test_ansari_bradley_exact(spark, tmp_path):
    a = [1.00, 5.00, 5.50, 9.00]  # dispersed
    b = [4.00, 4.50, 6.00, 6.50, 7.00]  # compressed
    _plant_two_samples(spark, tmp_path, a, b)
    (r,) = _run("agg_ansari_bradley", spark, tmp_path)
    pool = sorted(a + b)
    nn = len(pool)

    def score(v):
        # midrank-based AB score via the doubled lattice: average of
        # min(rank, N+1-rank) over the tied run
        first = pool.index(v) + 1
        cnt = pool.count(v)
        r2 = 2 * first + cnt - 1  # doubled midrank
        return min(r2, 2 * (nn + 1) - r2) / 2

    ab = sum(score(x) for x in a)
    na, nb = len(a), len(b)
    if nn % 2 == 0:
        e_ab = na * (nn + 2) / 4
        var_ab = na * nb * (nn + 2) * (nn - 2) / (48.0 * (nn - 1))
    else:
        e_ab = na * (nn + 1) ** 2 / (4.0 * nn)
        var_ab = na * nb * (nn + 1) * (3 + nn * nn) / (48.0 * nn * nn)
    z = (ab - e_ab) / math.sqrt(var_ab)
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert r["ab_stat"] == ab
    assert r["z_stat"] == pytest.approx(FLOOR4(z), abs=1e-9)
    assert r["scales_differ"] == (abs(z) > 1.96)


# ---------------------------------------------------------------------------
# Somers' D: asymmetric ordinal association with tie conditioning.


def test_somers_d_exact(spark, tmp_path):
    pairs = [(1, 0.01), (1, 0.02), (2, 0.02), (3, 0.05), (3, 0.03), (4, 0.04)]
    spark.createDataFrame(
        [
            (i, i, 1, i, float(q), 100.0, float(d), 0.0, "N", "O",
             datetime.datetime(2024, 1, 1))
            for i, (q, d) in enumerate(pairs)
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    (r,) = _run("agg_somers_d", spark, tmp_path)
    pts = [(q, round(d * 100)) for q, d in pairs]
    conc = disc = 0
    for i, (x1, y1) in enumerate(pts):
        for x2, y2 in pts[i + 1 :]:
            if x1 == x2:
                continue
            s = (x2 - x1) * (y2 - y1)
            conc += s > 0
            disc += s < 0
    n = len(pts)
    n0 = n * (n - 1) // 2
    from collections import Counter

    n1 = sum(t * (t - 1) // 2 for t in Counter(x for x, _ in pts).values())
    n2 = sum(t * (t - 1) // 2 for t in Counter(y for _, y in pts).values())
    assert r["n"] == n
    assert r["conc"] == conc and r["disc"] == disc
    assert r["somers_d_yx"] == pytest.approx(
        FLOOR6((conc - disc) / (n0 - n1)), abs=1e-9
    )
    assert r["somers_d_xy"] == pytest.approx(
        FLOOR6((conc - disc) / (n0 - n2)), abs=1e-9
    )


# ---------------------------------------------------------------------------
# Bar-indicator batch: models over the shared test_round12d bar month.


def _by_day(rows):
    return {r["day"]: r for r in rows}


def test_kaufman_er_exact(spark, bar_dir):
    out = _by_day(_run("win_kaufman_er", spark, bar_dir))
    cls = [c for _, _, _, c in OHLC]
    for i in range(N_DAYS):
        if i < 10:
            assert DAYS[i] not in out
            continue
        net = abs(cls[i] - cls[i - 10])
        steps = [abs(cls[j] - cls[j - 1]) for j in range(max(1, i - 9), i + 1)]
        vol = sum(steps)
        r = out[DAYS[i]]
        if vol == 0:
            assert r["efficiency_ratio"] is None
            continue
        er = net / vol
        assert r["efficiency_ratio"] == pytest.approx(FLOOR4(er), abs=1e-9), i
        assert r["trending"] == (er > 0.3)


def test_force_index_exact(spark, bar_dir):
    out = _by_day(_run("win_force_index", spark, bar_dir))
    cls = [c for _, _, _, c in OHLC]
    fis = [None] + [(cls[i] - cls[i - 1]) * 2 for i in range(1, N_DAYS)]
    # vol = 2 events per planted day
    for i in range(N_DAYS):
        frame = [f for f in fis[max(0, i - 12) : i + 1] if f is not None]
        if len(frame) < 13:
            assert DAYS[i] not in out
            continue
        r = out[DAYS[i]]
        assert r["force_index"] == pytest.approx(round(fis[i] / 100.0, 2), abs=1e-9)
        assert r["force_sma"] == pytest.approx(
            FLOOR4(sum(frame) / (13 * 100.0)), abs=1e-9
        ), i
        assert r["bulls_in_control"] == (sum(frame) > 0)


def test_ease_of_movement_exact(spark, bar_dir):
    out = _by_day(_run("win_ease_of_movement", spark, bar_dir))
    eoms = [None]
    for i in range(1, N_DAYS):
        h, lo, _, _ = OHLC[i]
        ph, plo, _, _ = OHLC[i - 1]
        num = ((h + lo) - (ph + plo)) * (h - lo)
        eoms.append(FLOOR4(num / (2.0 * 2 * 100.0)))  # vol = 2
    for i in range(N_DAYS):
        frame = [e for e in eoms[max(0, i - 13) : i + 1] if e is not None]
        if len(frame) < 14:
            assert DAYS[i] not in out
            continue
        r = out[DAYS[i]]
        assert r["eom"] == pytest.approx(eoms[i], abs=1e-9), i
        assert r["eom_sma_14"] == pytest.approx(
            round(sum(frame) / 14, 4), abs=1e-9
        )


def test_choppiness_exact(spark, bar_dir):
    out = _by_day(_run("win_choppiness_index", spark, bar_dir))
    trs = []
    for i, (h, lo, _, c) in enumerate(OHLC):
        if i == 0:
            trs.append(h - lo)
        else:
            pc = OHLC[i - 1][3]
            trs.append(max(h - lo, abs(h - pc), abs(lo - pc)))
    for i in range(N_DAYS):
        if i + 1 < 14:
            assert DAYS[i] not in out
            continue
        frame = OHLC[i - 13 : i + 1]
        rng = max(h for h, *_ in frame) - min(lo for _, lo, _, _ in frame)
        tr_sum = sum(trs[i - 13 : i + 1])
        r = out[DAYS[i]]
        if rng == 0:
            assert r["choppiness"] is None
            continue
        chop = 100.0 * math.log10(tr_sum / rng) / math.log10(14.0)
        assert r["choppiness"] == pytest.approx(FLOOR4(chop), abs=1e-9), i
        assert r["choppy"] == (chop > 61.8)


def test_fractal_dimension_exact(spark, bar_dir):
    out = _by_day(_run("win_fractal_dimension", spark, bar_dir))
    cls = [c for _, _, _, c in OHLC]
    for i in range(N_DAYS):
        if i + 1 < 14:
            assert DAYS[i] not in out
            continue
        a = cls[i - 13 : i + 1]
        l_path = sum(abs(a[j] - a[j - 1]) for j in range(1, 14))
        d_ext = max(abs(x - a[0]) for x in a)
        r = out[DAYS[i]]
        assert r["path_cents"] == l_path and r["extent_cents"] == d_ext
        if d_ext == 0 or l_path == 0:
            assert r["fractal_dim"] is None
            continue
        fd = math.log10(13.0) / (math.log10(13.0) + math.log10(d_ext / l_path))
        assert r["fractal_dim"] == pytest.approx(FLOOR4(fd), abs=1e-9), i
    # structural bound: d <= L always, so log10(d/L) <= 0 and FD >= 1
    # (the [1,2] waveform range is approximate; heavily oscillating
    # paths with d << L legitimately exceed 2 under Katz's formula)
    for r in out.values():
        if r["fractal_dim"] is not None:
            assert r["fractal_dim"] >= 0.99


# ---------------------------------------------------------------------------
# Resource allocation + preferential attachment on the K4+pendant
# backbone (the graph_adamic_adar planted fixture).


def test_resource_allocation_exact(spark, tmp_path):
    _write_bipartite(spark, tmp_path, BB_EDGES)
    out = {(r["u"], r["v"]): r for r in _run("graph_resource_allocation", spark, tmp_path)}
    adj = _bb_adj()
    model = {}
    for z, nbrs in adj.items():
        term = 1_000_000 // len(nbrs)  # exact integer division, spec
        for a in nbrs:
            for b in nbrs:
                if a < b:
                    u, n_c = model.get((a, b), (0, 0))
                    model[(a, b)] = (u + term, n_c + 1)
    assert set(out) == set(model)
    for (a, b), (units, n_c) in model.items():
        r = out[(a, b)]
        assert r["n_common"] == n_c
        assert r["resource_allocation"] == pytest.approx(
            round(units / 1e6, 6), abs=1e-9
        )
        assert r["is_edge"] == ((a, b) in BB_EDGES)


def test_preferential_attachment_exact(spark, tmp_path):
    _write_bipartite(spark, tmp_path, BB_EDGES)
    out = {(r["u"], r["v"]): r for r in _run("graph_preferential_attachment", spark, tmp_path)}
    adj = _bb_adj()
    deg = {v: len(n) for v, n in adj.items()}
    wedges = set()
    for z, nbrs in adj.items():
        for a in nbrs:
            for b in nbrs:
                if a < b:
                    wedges.add((a, b))
    assert set(out) == wedges
    for a, b in wedges:
        r = out[(a, b)]
        assert (r["deg_u"], r["deg_v"]) == (deg[a], deg[b])
        assert r["preferential_attachment"] == deg[a] * deg[b]
        assert r["is_edge"] == ((a, b) in BB_EDGES)


# ---------------------------------------------------------------------------
# Forced exact hubness audit: brute-force k-occurrence on 13 planted
# vectors with well-separated cosines.


def test_embed_hubness_exact_k_occurrence(spark, tmp_path):
    import numpy as np

    n, dim = 13, 4
    vecs = []
    for i in range(n):
        # deterministic, well-separated directions
        v = [
            math.cos(0.37 * i + 0.11 * j) + 0.05 * ((i * 7 + j * 3) % 5)
            for j in range(dim)
        ]
        vecs.append(v)
    spark.createDataFrame(
        [(i, [float(np.float32(x)) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    (r,) = _run("embed_hubness_exact", spark, tmp_path)
    # model: exact cosine top-10 per vector (float32 inputs as doubles)
    vv = [[float(np.float32(x)) for x in v] for v in vecs]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    k_occ = {i: 0 for i in range(n)}
    for q in range(n):
        scored = sorted(
            ((cos(vv[q], vv[j]), -j) for j in range(n) if j != q),
            reverse=True,
        )
        for _, negj in scored[:10]:
            k_occ[-negj] += 1
    occ = list(k_occ.values())
    s1, s2, s3 = sum(occ), sum(x * x for x in occ), sum(x**3 for x in occ)
    m = s1 / n
    var = s2 / n - m * m
    skew = (s3 / n - 3 * m * (s2 / n) + 2 * m**3) / var**1.5
    assert r["n"] == n
    assert r["max_k_occ"] == max(occ)
    assert r["n_antihubs"] == sum(1 for x in occ if x == 0)
    assert r["n_hubs"] == sum(1 for x in occ if x > 20)
    assert r["k_occurrence_skewness"] == pytest.approx(round(skew, 4), abs=1e-9)


# ---------------------------------------------------------------------------
# r12 mini-batch day-one pins: G-test, Fisher-z CI, TRIX.


def test_g_test_exact(spark, tmp_path):
    cells = {
        ("1-URGENT", "F"): 30, ("1-URGENT", "O"): 10,
        ("5-LOW", "F"): 10, ("5-LOW", "O"): 30,
    }
    rows, k = [], 0
    for (pri, st), cnt in cells.items():
        for _ in range(cnt):
            rows.append((k, 1, st, 100.0, datetime.datetime(2024, 1, 1), pri))
            k += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    (r,) = registry.get("agg_g_test").fn(spark, str(tmp_path)).collect()
    n = sum(cells.values())
    row_t, col_t = {}, {}
    for (x, y), c in cells.items():
        row_t[x] = row_t.get(x, 0) + c
        col_t[y] = col_t.get(y, 0) + c
    g = 0.0
    for (x, y), c in sorted(cells.items()):  # the engines' fold order
        g += 2.0 * c * math.log(c / (row_t[x] * col_t[y] / n))
    assert (r["n"], r["dof"]) == (80, 1)
    assert r["g_stat"] == pytest.approx(round(g, 4), abs=1e-9)
    # published relation: for this symmetric 2x2, G (20.67) sits near
    # but above Pearson's chi2 (20.0), and both clear chi2(1) = 3.8415
    assert 20.0 < r["g_stat"] < 21.0
    assert r["dependent"]


def test_fisher_z_ci_exact(spark, tmp_path):
    pairs = [(1, 0.01), (2, 0.03), (3, 0.02), (4, 0.05), (5, 0.04), (6, 0.07)]
    spark.createDataFrame(
        [
            (i, i, 1, i, float(q), 100.0, float(d), 0.0, "N", "O",
             datetime.datetime(2024, 1, 1))
            for i, (q, d) in enumerate(pairs)
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    (r,) = registry.get("agg_fisher_z_corr_ci").fn(spark, str(tmp_path)).collect()
    xs = [q for q, _ in pairs]
    ys = [round(d * 100) for _, d in pairs]
    n = len(pairs)
    sx, sy = sum(xs), sum(ys)
    rho = (n * sum(a * b for a, b in zip(xs, ys)) - sx * sy) / math.sqrt(
        (n * sum(a * a for a in xs) - sx * sx)
        * (n * sum(b * b for b in ys) - sy * sy)
    )
    fz = 0.5 * math.log((1 + rho) / (1 - rho))
    half = 1.96 / math.sqrt(n - 3)

    def tanh(x):
        e2 = math.exp(2 * x)
        return (e2 - 1) / (e2 + 1)

    assert r["n"] == n
    assert r["pearson_r"] == pytest.approx(round(rho, 6), abs=1e-9)
    assert r["fisher_z"] == pytest.approx(FLOOR4(fz), abs=1e-9)
    assert r["ci_lo"] == pytest.approx(FLOOR6(tanh(fz - half)), abs=1e-9)
    assert r["ci_hi"] == pytest.approx(FLOOR6(tanh(fz + half)), abs=1e-9)
    assert r["significant"] == (not (tanh(fz - half) <= 0 <= tanh(fz + half)))


def test_trix_exact_triple_fold(spark, bar_dir):
    out = {r["day"]: r for r in registry.get("win_trix").fn(spark, str(bar_dir)).collect()}

    def ewma(vals):
        m = len(vals)
        num = sum(x * 0.5 ** (m - 1 - i) for i, x in enumerate(vals))
        return num / (2.0 - 0.5 ** (m - 1))

    cls = [float(c) for _, _, _, c in OHLC]
    e1 = [ewma(cls[max(0, i - 7) : i + 1]) for i in range(N_DAYS)]
    e2 = [ewma(e1[max(0, i - 7) : i + 1]) for i in range(N_DAYS)]
    e3 = [ewma(e2[max(0, i - 7) : i + 1]) for i in range(N_DAYS)]
    for i in range(N_DAYS):
        if i == 0:
            assert DAYS[i] not in out
            continue
        r = out[DAYS[i]]
        assert r["triple_ema"] == pytest.approx(
            math.floor(e3[i] / 100.0 * 1e4) / 1e4, abs=1e-9
        ), i
        assert r["trix_bp"] == pytest.approx(
            math.floor((e3[i] / e3[i - 1] - 1) * 1e8) / 1e4, abs=1e-9
        ), i
