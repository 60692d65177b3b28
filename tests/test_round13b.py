"""Round-13 planted-model tests, part 2: calibration slope, Brier
decomposition (Murphy identity), Gwet AC1 (including the kappa-paradox
exhibit), Krippendorff alpha, nDCG, the volume-flow bar indicators
(CMF + ADL on three-event days so the multiplier is an interior
ratio), Elder ray, KST, truncated harmonic closeness, the NSW graph
walk + recall, and the streaming MinHash bucket index (pure-Python
xxhash64/murmur3 replay on planted docs)."""

from __future__ import annotations

import datetime
import math

import pytest

from data_ingestion_poc_spark import registry
from tests.test_round12 import _run, _write_events, spark  # noqa: F401
from tests.test_round12e import _write_bipartite

FLOOR4 = lambda x: math.floor(x * 1e4) / 1e4  # noqa: E731
FLOOR6 = lambda x: math.floor(x * 1e6) / 1e6  # noqa: E731


# ---------------------------------------------------------------------------
# Shared scored-events fixture: the family's deterministic logistic
# score p = 1/(1+exp(-(value-50)/20)), label = purchase.


def _plant_scored(spark, tmp_path, rows):
    """rows: (value, is_purchase)."""
    ev = [
        (i, 0, i % 7, "purchase" if y else "click", v)
        for i, (v, y) in enumerate(rows)
    ]
    _write_events(spark, tmp_path, ev)


def _p_u(v):
    return round(1 / (1 + math.exp(-(v - 50) / 20.0)) * 1_000_000)


SCORED = (
    [(80.0, 1)] * 6 + [(80.0, 0)] * 2     # high score, mostly converts
    + [(55.0, 1)] * 3 + [(55.0, 0)] * 4   # mid score, mixed
    + [(20.0, 1)] * 1 + [(20.0, 0)] * 8   # low score, mostly not
)


def test_calibration_slope_exact(spark, tmp_path):
    _plant_scored(spark, tmp_path, SCORED)
    (r,) = _run("agg_calibration_slope", spark, tmp_path)
    ps = [_p_u(v) for v, _ in SCORED]
    ys = [y for _, y in SCORED]
    n = len(ps)
    sp, spp = sum(ps), sum(p * p for p in ps)
    sy, spy = sum(ys), sum(p * y for p, y in zip(ps, ys))
    slope = 1e6 * (n * spy - sp * sy) / (n * spp - sp * sp)
    ybar, pbar = sy / n, sp / n / 1e6
    assert r["n"] == n
    assert r["calibration_in_large"] == pytest.approx(
        FLOOR6(ybar - pbar), abs=1e-12
    )
    assert r["calibration_slope"] == pytest.approx(FLOOR6(slope), abs=1e-9)
    assert r["calibration_intercept"] == pytest.approx(
        FLOOR6(ybar - slope * pbar), abs=1e-9
    )


def test_brier_decomposition_identity(spark, tmp_path):
    _plant_scored(spark, tmp_path, SCORED)
    (r,) = _run("agg_brier_decomposition", spark, tmp_path)
    from collections import defaultdict

    bins = defaultdict(lambda: [0, 0, 0])  # n, pos, sum_p_u
    for v, y in SCORED:
        pu = _p_u(v)
        b = int(min(pu / 1e6, 0.9999999) * 10)
        bins[b][0] += 1
        bins[b][1] += y
        bins[b][2] += pu
    nn = sum(b[0] for b in bins.values())
    np_ = sum(b[1] for b in bins.values())
    ybar = np_ / nn
    rel = sum(
        n * (sp / 1e6 / n - pos / n) ** 2 for n, pos, sp in bins.values()
    ) / nn
    res = sum(n * (pos / n - ybar) ** 2 for n, pos, _ in bins.values()) / nn
    unc = ybar * (1 - ybar)
    assert r["n"] == nn
    assert r["reliability"] == pytest.approx(FLOOR6(rel), abs=1e-9)
    assert r["resolution"] == pytest.approx(FLOOR6(res), abs=1e-9)
    assert r["uncertainty"] == pytest.approx(FLOOR6(unc), abs=1e-12)
    # Murphy identity for the binned forecast
    assert r["brier_binned"] == pytest.approx(
        FLOOR6(rel - res + unc), abs=1e-9
    )
    # direct check: brier of the bin-mean forecast equals REL - RES + UNC
    direct = 0.0
    for n, pos, sp in bins.values():
        fb = sp / 1e6 / n
        direct += pos * (fb - 1) ** 2 + (n - pos) * fb**2
    assert rel - res + unc == pytest.approx(direct / nn, abs=1e-12)


def _confusion(rows, thr=500_000):
    n = tp = tn = pp = tpos = 0
    for v, y in rows:
        pred = 1 if _p_u(v) >= thr else 0
        n += 1
        pp += pred
        tpos += y
        if y == 1 and pred == 1:
            tp += 1
        if y == 0 and pred == 0:
            tn += 1
    return n, tp, tn, pp, tpos


def test_gwet_ac1_exact_and_kappa_paradox(spark, tmp_path):
    # heavily skewed marginals: both raters say "positive" almost
    # always and agree — kappa collapses, AC1 stays high
    rows = [(80.0, 1)] * 46 + [(80.0, 0)] * 2 + [(20.0, 1)] * 1 + [(20.0, 0)] * 1
    _plant_scored(spark, tmp_path, rows)
    (r,) = _run("agg_gwet_ac1", spark, tmp_path)
    n, tp, tn, pp, tpos = _confusion(rows)
    po = (tp + tn) / n
    pi = (pp + tpos) / (2 * n)
    pe = 2 * pi * (1 - pi)
    ac1 = (po - pe) / (1 - pe)
    assert r["n"] == n
    assert r["observed_agreement"] == pytest.approx(round(po, 6), abs=1e-12)
    assert r["chance_agreement_gamma"] == pytest.approx(
        round(pe, 6), abs=1e-12
    )
    assert r["gwet_ac1"] == pytest.approx(round(ac1, 6), abs=1e-9)
    # the paradox: kappa's chance term uses the product of skewed
    # marginals, so kappa << AC1 on this data
    (k,) = _run("agg_cohens_kappa", spark, tmp_path)
    assert k["kappa"] < r["gwet_ac1"] - 0.3


def test_krippendorff_alpha_exact(spark, tmp_path):
    rows = (
        [(80.0, 1)] * 20 + [(80.0, 0)] * 5
        + [(20.0, 0)] * 18 + [(20.0, 1)] * 7
    )
    _plant_scored(spark, tmp_path, rows)
    (r,) = _run("agg_krippendorff_alpha", spark, tmp_path)
    n, tp, tn, pp, tpos = _confusion(rows)
    disc = n - tp - tn
    n1 = pp + tpos
    n0 = 2 * n - n1
    alpha = 1 - disc * (2 * n - 1) / (n0 * n1)
    assert r["n"] == n
    assert r["n_disagreements"] == disc == 12
    assert r["krippendorff_alpha"] == pytest.approx(
        round(alpha, 6), abs=1e-9
    )


# ---------------------------------------------------------------------------
# nDCG: tiny two-nation / five-brand market with hand-computed ranks.


def test_ndcg_exact(spark, tmp_path):
    # one nation, five brands; train revenue ranks B1>B2>B3>B4>B5,
    # test revenue ranks B2>B1>B5>B3 (B4 absent in test)
    train = {"B1": 500.0, "B2": 400.0, "B3": 300.0, "B4": 200.0, "B5": 100.0}
    test = {"B2": 900.0, "B1": 800.0, "B5": 700.0, "B3": 600.0}
    spark.createDataFrame(
        [(0, "NATIONX", 0, "")],
        "n_nationkey long, n_name string, n_regionkey long, n_comment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "nation.parquet"))
    spark.createDataFrame(
        [(0, "c0", 0, 0.0)],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    parts = sorted(set(train) | set(test))
    spark.createDataFrame(
        [(i, b) for i, b in enumerate(parts)],
        "p_partkey long, p_brand string",
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    orders, lines = [], []
    ok = 0
    for period, rev in (("train", train), ("test", test)):
        d = (
            datetime.datetime(1995, 6, 1)
            if period == "train"
            else datetime.datetime(1997, 6, 1)
        )
        for b, amt in sorted(rev.items()):
            orders.append((ok, 0, "O", 1.0, d, "1-URGENT"))
            lines.append((ok, parts.index(b), float(amt), 0.0))
            ok += 1
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_partkey long, l_extendedprice double,"
        " l_discount double",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    (r,) = _run("agg_ndcg", spark, tmp_path)
    # model: graded relevance = 10 - test-rank (ties impossible here)
    test_order = sorted(parts, key=lambda b: (-test.get(b, 0.0), b))
    rel = {b: max(0, 10 - (test_order.index(b) + 1)) for b in parts}
    pred_order = sorted(
        [b for b in parts if train.get(b, 0) > 0],
        key=lambda b: (-train[b], b),
    )
    dcg_u = sum(
        math.floor(rel[b] * 1e6 / math.log2(pos + 2))
        for pos, b in enumerate(pred_order[:10])
    )
    ideal_order = sorted(parts, key=lambda b: (-rel[b], b))
    idcg_u = sum(
        math.floor(rel[b] * 1e6 / math.log2(pos + 2))
        for pos, b in enumerate(ideal_order[:10])
    )
    assert r["nation"] == "NATIONX"
    assert r["dcg_u"] == dcg_u
    assert r["idcg_u"] == idcg_u
    assert r["ndcg"] == pytest.approx(FLOOR6(dcg_u / idcg_u), abs=1e-12)
    assert 0 < r["ndcg"] < 1  # imperfect but nonzero ranking


# ---------------------------------------------------------------------------
# Bar indicators on three-event days: open, intraday extreme, close —
# the money-flow multiplier becomes an interior ratio.

N3 = 26


def _bar3(d):
    opn = 50.0 + ((7 * d * d + 3 * d) % 41)
    ext = 40.0 + ((11 * d * d + 5 * d) % 53)
    cls = 48.0 + ((5 * d * d + 11 * d) % 37)
    return opn, ext, cls


BARS3 = [_bar3(d) for d in range(N3)]


@pytest.fixture(scope="module")
def bar3_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bars13")
    rows = []
    for d, (opn, ext, cls) in enumerate(BARS3):
        rows.append((3 * d, d, 1, "purchase", opn))
        rows.append((3 * d + 1, d, 1, "purchase", ext))
        rows.append((3 * d + 2, d, 1, "purchase", cls))
    _write_events(spark, tmp, rows)
    return tmp


def _ohlc3():
    out = []
    for opn, ext, cls in BARS3:
        cs = [round(v * 100) for v in (opn, ext, cls)]
        out.append((max(cs), min(cs), cs[0], cs[2], 3))
    return out


def _mfv_u():
    out = []
    for hi, lo, _, cls, vol in _ohlc3():
        if hi > lo:
            mfm = math.floor((2 * cls - hi - lo) * 1e6 / (hi - lo))
        else:
            mfm = 0
        out.append(mfm * vol)
    return out


def test_chaikin_money_flow_exact(spark, bar3_dir):
    rows = _run("win_chaikin_money_flow", spark, bar3_dir)
    by_day = {r["day"]: r for r in rows}
    mfv = _mfv_u()
    vols = [v for *_, v in _ohlc3()]
    assert len(rows) == N3 - 19
    for d in range(19, N3):
        msum = sum(mfv[d - 19 : d + 1])
        vsum = sum(vols[d - 19 : d + 1])
        r = by_day[f"2024-01-{d + 1:02d}"]
        assert r["cmf"] == pytest.approx(
            FLOOR4(msum / (1e6 * vsum)), abs=1e-12
        ), d
        assert r["accumulating"] == (msum > 0)


def test_accum_dist_line_exact(spark, bar3_dir):
    rows = _run("win_accum_dist_line", spark, bar3_dir)
    by_day = {r["day"]: r for r in rows}
    mfv = _mfv_u()
    assert len(rows) == N3
    run = 0
    for d in range(N3):
        run += mfv[d]
        r = by_day[f"2024-01-{d + 1:02d}"]
        assert r["adl_units"] == run, d
        assert r["adl"] == pytest.approx(FLOOR4(run / 1e6), abs=1e-12)


def test_elder_ray_exact(spark, bar3_dir):
    rows = _run("win_elder_ray", spark, bar3_dir)
    by_day = {r["day"]: r for r in rows}
    bars = _ohlc3()
    closes = [c for _, _, _, c, _ in bars]
    assert len(rows) == N3
    for d in range(N3):
        frame = closes[max(0, d - 7) : d + 1]
        n = len(frame)
        acc = 0.0
        for i, v in enumerate(frame):  # the engines' fold order
            acc += float(v) * 0.5 ** (n - 1 - i)
        ema = acc / (2 - 0.5 ** (n - 1))
        hi, lo = bars[d][0], bars[d][1]
        r = by_day[f"2024-01-{d + 1:02d}"]
        assert r["bull_power"] == pytest.approx(
            FLOOR4((hi - ema) / 100), abs=1e-12
        ), d
        assert r["bear_power"] == pytest.approx(
            FLOOR4((lo - ema) / 100), abs=1e-12
        ), d
        assert r["bulls_contested"] == ((hi - ema > 0) and not (lo - ema > 0))


def test_kst_exact(spark, bar3_dir):
    from data_ingestion_poc_spark.operators.windows import (
        KST_LCM,
        KST_MIN_RN,
        KST_ROCS,
        KST_SMAS,
    )

    rows = _run("win_kst", spark, bar3_dir)
    by_day = {r["day"]: r for r in rows}
    closes = [c for _, _, _, c, _ in _ohlc3()]

    def roc_u(d, span):
        if d - span < 0:
            return None
        lag = closes[d - span]
        return math.floor((closes[d] - lag) * 1e6 / lag)

    def kst_u(d):
        total = 0
        for i, (rspan, s) in enumerate(zip(KST_ROCS, KST_SMAS), start=1):
            sm = sum(
                roc_u(dd, rspan) or 0 for dd in range(d - s + 1, d + 1)
            )
            total += i * (KST_LCM // s) * sm
        return total

    assert len(rows) == N3 - KST_MIN_RN + 1
    for d in range(KST_MIN_RN - 1, N3):
        k = kst_u(d)
        sig = sum(kst_u(dd) for dd in range(d - 2, d + 1))
        r = by_day[f"2024-01-{d + 1:02d}"]
        assert r["kst_bp"] == pytest.approx(
            FLOOR4(k / 1500.0), abs=1e-9
        ), d
        assert r["signal_bp"] == pytest.approx(
            FLOOR4(sig / 4500.0), abs=1e-9
        ), d
        assert r["above_signal"] == (3 * k > sig)


# ---------------------------------------------------------------------------
# Truncated harmonic closeness on the planted K4-plus-pendant backbone.

CL_EDGES = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 6)]


def test_closeness_centrality_exact(spark, tmp_path):
    _write_bipartite(spark, tmp_path, CL_EDGES)
    rows = _run("graph_closeness_centrality", spark, tmp_path)
    adj = {}
    for a, b in CL_EDGES:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    got = {r["node"]: r for r in rows}
    for u in adj:
        # BFS distances truncated at 4 hops
        dist = {u: 0}
        frontier = [u]
        for d in range(1, 5):
            nxt = []
            for x in frontier:
                for y in adj[x]:
                    if y not in dist:
                        dist[y] = d
                        nxt.append(y)
            frontier = nxt
        reach = {v: d for v, d in dist.items() if 0 < d <= 4}
        h_u = sum(math.floor(1e6 / d) for d in reach.values())
        r = got[u]
        assert r["n_reached"] == len(reach), u
        assert r["harmonic_u"] == h_u, u
        assert r["harmonic_closeness"] == pytest.approx(
            round(h_u / 1e6, 6), abs=1e-12
        )
    # node 1 (in the triangle) reaches all 6 within 4 hops; pendant 6
    # cannot reach 1 or 2 in 4 hops... check truncation bites somewhere
    assert got[6]["n_reached"] < len(adj) - 1 or all(
        got[u]["n_reached"] == len(adj) - 1 for u in adj
    )


# ---------------------------------------------------------------------------
# NSW graph walk: pure-Python replica of the deterministic search.


def _nsw_model(vecs, labels, queries, deg=8, beam=64, hops=5, k=10,
               starts=16):
    import numpy as np

    vv = {i: [float(np.float32(x)) for x in v] for i, v in vecs.items()}

    def cos(a, b):
        acc = 0.0
        for x, y in zip(vv[a], vv[b]):
            acc += x * y
        na = math.sqrt(sum(x * x for x in vv[a]))
        nb = math.sqrt(sum(x * x for x in vv[b]))
        return acc / (na * nb)

    # two-level graph (the r14 _nsw_graph contract — labels unused):
    # GLOBAL seeds = corpus' first ceil(sqrt(N)) vec_ids; assign each
    # vector to its nearest seed (sid tiebreak); edges = cell-local
    # top-deg kNN UNION uplinks (v -> its seed) UNION downlinks
    # (seed -> each cell member) UNION seed<->seed bridges (all pairs)
    all_seeds = sorted(vv)[: math.ceil(math.sqrt(len(vv)))]
    sid_of = {
        i: min(all_seeds, key=lambda s: (-cos(i, s), s)) for i in vv
    }
    g = {}
    for i in vv:
        cands = [j for j in vv if j != i and sid_of[j] == sid_of[i]]
        cands.sort(key=lambda j: (-cos(i, j), j))
        edges = set(cands[:deg])
        if sid_of[i] != i:
            edges.add(sid_of[i])
        if i in all_seeds:
            edges.update(s for s in all_seeds if s != i)
            # downlinks: a seed reaches every member of its cell
            edges.update(j for j in vv if sid_of[j] == i and j != i)
        g[i] = sorted(edges)
    out = {}
    for q in queries:
        # r14 start: top-`starts` seeds by query cosine (sid tiebreak)
        # — the exhaustive layer-1 descent
        opened = sorted(all_seeds, key=lambda s: (-cos(q, s), s))[:starts]
        visited = {s: cos(q, s) for s in opened}
        beam_set = sorted(visited, key=lambda x: (-visited[x], x))[:beam]
        for _ in range(hops):
            expand = set()
            for b in beam_set:
                expand.update(g[b])
            for x in expand:
                visited.setdefault(x, cos(q, x))
            beam_set = sorted(visited, key=lambda x: (-visited[x], x))[:beam]
        ranked = sorted(
            (x for x in visited if x != q), key=lambda x: (-visited[x], x)
        )[:k]
        out[q] = [(x, round(visited[x], 4)) for x in ranked]
    return out


def _plant_embeddings(spark, tmp_path, vecs, labels):
    spark.createDataFrame(
        [(i, [float(x) for x in v], labels[i]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))


def _nsw_fixture():
    vecs, labels = {}, {}
    for i in range(20):
        lb = i % 2
        vecs[i] = [
            math.cos(0.31 * i + 0.17 * j) + 0.4 * lb + 0.03 * ((i + j) % 7)
            for j in range(8)
        ]
        labels[i] = lb
    return vecs, labels


def test_sim_search_nsw_matches_model(spark, tmp_path):
    vecs, labels = _nsw_fixture()
    _plant_embeddings(spark, tmp_path, vecs, labels)
    rows = _run("sim_search_nsw", spark, tmp_path)
    model = _nsw_model(vecs, labels, queries=range(5))
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append(
            (r["rk"], r["neighbor_id"], r["cosine"])
        )
    for q in range(5):
        want = [
            (rk + 1, nid, c) for rk, (nid, c) in enumerate(model[q])
        ]
        assert sorted(got[q]) == want, q


def test_sim_search_nsw_recall_matches_model(spark, tmp_path):
    import numpy as np

    vecs, labels = _nsw_fixture()
    _plant_embeddings(spark, tmp_path, vecs, labels)
    rows = _run("sim_search_nsw_recall", spark, tmp_path)
    model = _nsw_model(vecs, labels, queries=range(5))
    vv = {i: [float(np.float32(x)) for x in v] for i, v in vecs.items()}

    def cos(a, b):
        acc = 0.0
        for x, y in zip(vv[a], vv[b]):
            acc += x * y
        return acc / (
            math.sqrt(sum(x * x for x in vv[a]))
            * math.sqrt(sum(x * x for x in vv[b]))
        )

    for r in rows:
        q = r["query_id"]
        exact = sorted(
            (j for j in vv if j != q), key=lambda j: (-cos(q, j), j)
        )[:10]
        ann = {nid for nid, _ in model[q]}
        hits = sum(1 for j in exact if j in ann)
        assert r["exact_k"] == len(exact)
        assert r["ann_hits"] == hits, q
        assert r["recall_pct"] == pytest.approx(
            round(hits * 100.0 / len(exact), 2), abs=1e-9
        )


# ---------------------------------------------------------------------------
# Streaming MinHash bucket index: planted docs, pure-Python replay.


def test_stream_dedup_minhash_planted(spark, tmp_path):
    from data_ingestion_poc_spark.functions.pyhash import (
        spark_hash_long_array,
        xxh64,
        xxh64_int,
    )
    from data_ingestion_poc_spark.llm.dedup import (
        MINHASH_BANDS,
        MINHASH_K,
        _ROWS_PER_BAND,
    )

    docs = {
        1: "the quick brown fox jumps over the lazy dog tonight",
        2: "the quick brown fox jumps over the lazy dog today",  # near-dup of 1
        3: "completely different text about spark streaming state",
        4: "the quick brown fox jumps over the lazy dog tonight",  # exact dup of 1
        5: "too short",  # < 3 words, drops
    }
    spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = _run("stream_dedup_minhash", spark, tmp_path)
    # replay (the dedup.py _replay_band_buckets recipe, inline)
    m64 = (1 << 64) - 1
    buckets = {}
    for doc_id, text in docs.items():
        words = text.lower().split(" ")
        if len(words) < 3:
            continue
        shingles = {
            " ".join(words[i : i + 3]) for i in range(len(words) - 2)
        }
        sigs = []
        for sh in shingles:
            base = xxh64(sh.encode(), 42) & m64
            s = []
            for i in range(MINHASH_K):
                v = xxh64_int(i, base)
                s.append(v - (1 << 64) if v >= 1 << 63 else v)
            sigs.append(s)
        sig = [min(c) for c in zip(*sigs)]
        for b in range(MINHASH_BANDS):
            key = spark_hash_long_array(
                sig[b * _ROWS_PER_BAND : (b + 1) * _ROWS_PER_BAND]
            )
            buckets.setdefault((b, key), []).append(doc_id)
    want = {
        (b, k): ids for (b, k), ids in buckets.items() if len(ids) >= 2
    }
    got = {(r["band"], r["key"]): r for r in rows}
    assert set(got) == set(want)
    for (b, k), ids in want.items():
        r = got[(b, k)]
        n = len(ids)
        assert r["n_docs"] == n
        assert r["keeper_doc"] == min(ids)
        assert r["max_doc"] == max(ids)
        assert r["candidate_pairs"] == n * (n - 1) // 2
    # the exact dup pair (1,4) must collide in EVERY band; doc 3 never
    assert all(
        {1, 4} <= set(ids) or not ({1, 4} & set(ids))
        for ids in buckets.values()
    )
    assert sum(1 for ids in want.values() if {1, 4} <= set(ids)) == 8
    assert all(3 not in ids for ids in want.values())
