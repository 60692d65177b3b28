"""Round-12 planted-model sweep, part 5: exact pins for the graph
formula operators (pagerank, Katz, HITS, BFS, assortativity, k-core,
clustering coefficient, Adamic-Adar, rich club, k_nn curve,
modularity, degree power law) and the three remaining window ops
(changepoint scan, rescaled range, rolling correlation pair). Graph
models run the same exact-integer iteration/formula in plain Python
on tiny planted graphs with hand-checkable structure."""

from __future__ import annotations

import math

import pytest

from data_ingestion_poc_spark import registry
from tests.test_round12 import _run, _write_events, spark  # noqa: F401


def _write_purchase_graph(spark, tmp_path, edges):
    """edges: (custkey, suppkey, weight) -> orders + lineitem rows."""
    orders, lines, ok = [], [], 0
    for c, s, w in edges:
        orders.append((ok, c))
        for _ in range(w):
            lines.append((ok, s))
        ok += 1
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lines, "l_orderkey long, l_suppkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))


def _write_bipartite(spark, tmp_path, su_edges):
    """su_edges: supplier-supplier edges; one part per edge (the
    test_sketch_ann K4 trick), keeping the backbone == the edge list."""
    li = []
    for i, (a, b) in enumerate(su_edges):
        li.append((100 + i, a))
        li.append((100 + i, b))
    spark.createDataFrame(
        li, "l_partkey long, l_suppkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))


#: Weighted purchase graph: c1/c2 x s1/s2/s3/s4.
PG_EDGES = [(1, 1, 2), (1, 2, 1), (2, 2, 3), (2, 3, 1), (2, 4, 1)]


def _undirected():
    e = {}
    for c, s, w in PG_EDGES:
        e[(f"c{c}", f"s{s}")] = w
        e[(f"s{s}", f"c{c}")] = w
    return e


# ---------------------------------------------------------------------------
# PageRank: 3 exact integer rounds, damping 17/20, teleport 0.15.


def test_pagerank_exact_integer_rounds(spark, tmp_path):
    _write_purchase_graph(spark, tmp_path, PG_EDGES)
    out = {r["node"]: r["rank_units"] for r in _run("graph_pagerank", spark, tmp_path)}
    e = _undirected()
    nodes = sorted({a for a, _ in e})
    wsum = {}
    for (a, _), w in e.items():
        wsum[a] = wsum.get(a, 0) + w
    n = len(nodes)
    rank = {v: 10**12 // n for v in nodes}
    for _ in range(3):
        inflow = {}
        for (a, b), w in e.items():
            inflow[b] = inflow.get(b, 0) + (rank[a] * w) // wsum[a]
        rank = {
            v: 150_000_000_000 // n + (17 * inflow.get(v, 0)) // 20
            for v in nodes
        }
    assert out == rank


# ---------------------------------------------------------------------------
# Katz: base 1e6, attenuation 1/8 on the row-normalized walk, 3 rounds.


def test_katz_exact_integer_rounds(spark, tmp_path):
    _write_purchase_graph(spark, tmp_path, PG_EDGES)
    out = {r["node"]: r["katz_units"] for r in _run("graph_katz_centrality", spark, tmp_path)}
    e = _undirected()
    nodes = sorted({a for a, _ in e})
    wsum = {}
    for (a, _), w in e.items():
        wsum[a] = wsum.get(a, 0) + w
    ku = {v: 10**6 for v in nodes}
    for _ in range(3):
        inflow = {}
        for (a, b), w in e.items():
            inflow[b] = inflow.get(b, 0) + (ku[a] * w) // (8 * wsum[a])
        ku = {v: 10**6 + inflow.get(v, 0) for v in nodes}
    assert out == ku


# ---------------------------------------------------------------------------
# HITS: 2 full rounds, L-infinity integer normalization, directed c->s.


def test_hits_exact_integer_rounds(spark, tmp_path):
    _write_purchase_graph(spark, tmp_path, PG_EDGES)
    out = {
        (r["node"], r["role"]): r["score_units"]
        for r in _run("graph_hits", spark, tmp_path)
    }
    edges = {(f"c{c}", f"s{s}"): w for c, s, w in PG_EDGES}
    hubs = {c: 10**6 for c, _ in edges}
    auths = {}
    for _ in range(2):
        raw_a = {}
        for (c, s), w in edges.items():
            raw_a[s] = raw_a.get(s, 0) + w * hubs[c]
        mx = max(raw_a.values())
        auths = {s: (r * 10**6) // mx for s, r in raw_a.items()}
        raw_h = {}
        for (c, s), w in edges.items():
            raw_h[c] = raw_h.get(c, 0) + w * auths[s]
        mx = max(raw_h.values())
        hubs = {c: (r * 10**6) // mx for c, r in raw_h.items()}
    for c, h in hubs.items():
        assert out[(c, "hub")] == h
    for s, a in auths.items():
        assert out[(s, "authority")] == a


# ---------------------------------------------------------------------------
# BFS: exact hop counts from the s1/s2/s3 seed set.


def test_bfs_exact_distances(spark, tmp_path):
    _write_purchase_graph(spark, tmp_path, PG_EDGES)
    out = {r["node"]: r["dist"] for r in _run("graph_bfs_distance", spark, tmp_path)}
    # seeds s1,s2,s3 at 0; customers touch a seed -> 1; s4 only via c2 -> 2
    assert out == {"s1": 0, "s2": 0, "s3": 0, "c1": 1, "c2": 1, "s4": 2}


# ---------------------------------------------------------------------------
# Assortativity: Newman r = Pearson of endpoint degrees over all
# directed edges.


def test_assortativity_exact_pearson(spark, tmp_path):
    _write_purchase_graph(spark, tmp_path, PG_EDGES)
    (r,) = _run("graph_assortativity", spark, tmp_path)
    e = _undirected()
    deg = {}
    for a, _ in e:
        deg[a] = deg.get(a, 0) + 1
    xs = [deg[a] for a, _ in e]
    ys = [deg[b] for _, b in e]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum(x * y for x, y in zip(xs, ys)) / n - mx * my
    den = math.sqrt(
        (sum(x * x for x in xs) / n - mx * mx)
        * (sum(y * y for y in ys) / n - my * my)
    )
    assert r["n_directed_edges"] == n
    assert r["assortativity"] == pytest.approx(
        math.floor(num / den * 1e6) / 1e6, abs=1e-9
    )


# ---------------------------------------------------------------------------
# k-core (k=4): K4,4 biclique survives the peel, the pendant drops.


def test_kcore_exact_peel(spark, tmp_path):
    edges = [(c, s, 1) for c in (1, 2, 3, 4) for s in (1, 2, 3, 4)]
    edges.append((5, 1, 1))  # pendant customer
    _write_purchase_graph(spark, tmp_path, edges)
    out = {r["node"]: r["core_degree"] for r in _run("graph_kcore", spark, tmp_path)}
    want = {f"c{i}": 4 for i in (1, 2, 3, 4)}
    want.update({f"s{i}": 4 for i in (1, 2, 3, 4)})
    assert out == want


#: Backbone fixture: K4 on suppliers 1-4 plus pendant 4-5.
BB_EDGES = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]


def _bb_adj():
    adj = {}
    for a, b in BB_EDGES:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


# ---------------------------------------------------------------------------
# Clustering coefficient: cc = 2*tri / d(d-1) on K4 + pendant.


def test_clustering_coefficient_exact(spark, tmp_path):
    _write_bipartite(spark, tmp_path, BB_EDGES)
    out = {r["node"]: r for r in _run("graph_clustering_coefficient", spark, tmp_path)}
    adj = _bb_adj()
    for v, nbrs in adj.items():
        tri = sum(
            1
            for a in nbrs
            for b in nbrs
            if a < b and b in adj[a]
        )
        d = len(nbrs)
        r = out[v]
        assert r["degree"] == d
        assert r["n_triangles"] == tri
        if d >= 2:
            assert r["local_cc"] == pytest.approx(
                math.floor(2.0 * tri / (d * (d - 1)) * 1e4) / 1e4, abs=1e-9
            )
        else:
            assert r["local_cc"] is None
    assert out[1]["local_cc"] == 1.0 and out[4]["local_cc"] == 0.5


# ---------------------------------------------------------------------------
# Adamic-Adar: sum over common neighbors of floor(1e6/ln(deg)) units.


def test_adamic_adar_exact_scores(spark, tmp_path):
    _write_bipartite(spark, tmp_path, BB_EDGES)
    out = {(r["u"], r["v"]): r for r in _run("graph_adamic_adar", spark, tmp_path)}
    adj = _bb_adj()
    model = {}
    for z, nbrs in adj.items():
        if len(nbrs) < 2:
            continue
        term = math.floor(1e6 / math.log(len(adj[z])))
        for a in nbrs:
            for b in nbrs:
                if a < b:
                    u, n_c = model.get((a, b), (0, 0))
                    model[(a, b)] = (u + term, n_c + 1)
    assert set(out) == set(model)
    for (a, b), (units, n_c) in model.items():
        r = out[(a, b)]
        assert r["n_common"] == n_c
        assert r["adamic_adar"] == pytest.approx(round(units / 1e6, 6), abs=1e-9)
        assert r["is_edge"] == ((a, b) in BB_EDGES)


# ---------------------------------------------------------------------------
# Rich club: phi(k) = 2 E_k / (N_k (N_k - 1)) for each distinct degree.


def test_rich_club_exact_curve(spark, tmp_path):
    _write_bipartite(spark, tmp_path, BB_EDGES)
    out = {r["k"]: r for r in _run("graph_rich_club", spark, tmp_path)}
    adj = _bb_adj()
    deg = {v: len(n) for v, n in adj.items()}
    for k in sorted(set(deg.values())):
        rich = {v for v, d in deg.items() if d > k}
        if len(rich) < 2:
            assert k not in out
            continue
        e_k = sum(1 for a, b in BB_EDGES if a in rich and b in rich)
        r = out[k]
        assert r["n_nodes"] == len(rich)
        assert r["n_edges"] == e_k
        assert r["rich_club_phi"] == pytest.approx(
            round(2.0 * e_k / (len(rich) * (len(rich) - 1)), 6), abs=1e-9
        )


# ---------------------------------------------------------------------------
# k_nn(k): class-average neighbor degree = sum(S_v) / (k * n_k).


def test_avg_neighbor_degree_exact(spark, tmp_path):
    _write_bipartite(spark, tmp_path, BB_EDGES)
    out = {r["k"]: r for r in _run("graph_avg_neighbor_degree", spark, tmp_path)}
    adj = _bb_adj()
    deg = {v: len(n) for v, n in adj.items()}
    by_k = {}
    for v, nbrs in adj.items():
        s_v = sum(deg[u] for u in nbrs)
        n_k, s_k = by_k.get(deg[v], (0, 0))
        by_k[deg[v]] = (n_k + 1, s_k + s_v)
    assert set(out) == set(by_k)
    for k, (n_k, s_k) in by_k.items():
        r = out[k]
        assert r["n_nodes"] == n_k and r["sum_nbr_deg"] == s_k
        assert r["knn"] == pytest.approx(
            math.floor(s_k / (k * n_k) * 1e6) / 1e6, abs=1e-9
        )


# ---------------------------------------------------------------------------
# Modularity: Q = sum_c [e_c/m - (d_c/2m)^2] against a planted nation
# partition that separates the K4 from the pendant.


def test_modularity_exact_q(spark, tmp_path):
    _write_bipartite(spark, tmp_path, BB_EDGES)
    nation = {1: 10, 2: 10, 3: 10, 4: 20, 5: 20}
    spark.createDataFrame(
        [(s, n) for s, n in nation.items()],
        "s_suppkey long, s_nationkey long",
    ).write.mode("overwrite").parquet(str(tmp_path / "supplier.parquet"))
    out = {r["community"]: r for r in _run("graph_modularity", spark, tmp_path)}
    m = len(BB_EDGES)
    e_in, d_c = {}, {}
    for a, b in BB_EDGES:
        ca, cb = nation[a], nation[b]
        d_c[ca] = d_c.get(ca, 0) + 1
        d_c[cb] = d_c.get(cb, 0) + 1
        if ca == cb:
            e_in[ca] = e_in.get(ca, 0) + 1
    q = sum(
        e_in.get(c, 0) / m - (d / (2.0 * m)) ** 2 for c, d in d_c.items()
    )
    for c, d in d_c.items():
        r = out[c]
        assert r["within_edges"] == e_in.get(c, 0)
        assert r["degree_sum"] == d
        assert r["q_term"] == pytest.approx(
            round(e_in.get(c, 0) / m - (d / (2.0 * m)) ** 2, 6), abs=1e-9
        )
        assert r["modularity"] == pytest.approx(round(q, 6), abs=1e-9)


# ---------------------------------------------------------------------------
# Degree power law: log-log OLS slope/r2 over the degree histogram.


def test_degree_powerlaw_exact_fit(spark, tmp_path):
    _write_bipartite(spark, tmp_path, BB_EDGES)
    rows = _run("graph_degree_powerlaw", spark, tmp_path)
    # supplier degree = #distinct parts it appears in (one part/edge)
    part_deg = {}
    for a, b in BB_EDGES:
        part_deg[a] = part_deg.get(a, 0) + 1
        part_deg[b] = part_deg.get(b, 0) + 1
    hist = {}
    for d in part_deg.values():
        hist[d] = hist.get(d, 0) + 1
    xs = [math.log(d) for d in hist]
    ys = [math.log(n) for n in hist.values()]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r2 = (n * sxy - sx * sy) ** 2 / (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    by_deg = {r["degree"]: r for r in rows}
    assert {d: r["n_nodes"] for d, r in by_deg.items()} == hist
    for r in rows:
        assert r["powerlaw_slope"] == pytest.approx(round(slope, 4), abs=1e-9)
        assert r["fit_r2"] == pytest.approx(round(r2, 4), abs=1e-9)


# ---------------------------------------------------------------------------
# Changepoint scan: exact scan statistic, split position, and flag.


def test_changepoint_exact_scan(spark, tmp_path):
    vals = [10.0] * 16 + [20.0] * 16  # clean level shift at s=16
    _write_events(
        spark, tmp_path, [(i, 0, 1, "click", v) for i, v in enumerate(vals)]
    )
    (r,) = _run("win_changepoint_scan", spark, tmp_path)
    a = [round(v * 100) for v in vals]
    n = len(a)
    best_key = None
    for s in range(4, n - 4 + 1):
        p = float(sum(a[:s]))
        tot = float(sum(a))
        gap = abs(p / s - (tot - p) / (n - s)) * math.sqrt(s * (n - s) / n)
        key = math.floor(gap * 1e6) * 64 + (63 - s)
        best_key = key if best_key is None else max(best_key, key)
    split = 63 - best_key % 64
    stat_u = math.floor(best_key / 64)
    tot, tot2 = float(sum(a)), float(sum(x * x for x in a))
    sigma = math.sqrt(max((tot2 - tot * (tot / n)) / (n - 1), 1e-9))
    assert r["n"] == n
    assert r["split_pos"] == split == 16
    assert r["scan_stat"] == pytest.approx(stat_u / 1e8, abs=1e-9)
    assert r["changepoint_detected"] == (stat_u / 1e6 / 100.0 > 3.0 * sigma / 100.0)
    assert r["changepoint_detected"]


# ---------------------------------------------------------------------------
# Rescaled range: R/S on the full 32-window vs its trailing half.


def _rs(a):
    n = len(a)
    mean = sum(a) / n
    devs = [sum(a[: i + 1]) - (i + 1) * mean for i in range(n)]
    s = math.sqrt(max((sum(x * x for x in a) - sum(a) * mean) / n, 0.0))
    return (max(devs) - min(devs)) / s if s > 0 else None


def test_rescaled_range_exact(spark, tmp_path):
    vals = [50.0 + ((7 * i * i + 3 * i) % 23) for i in range(32)]
    _write_events(
        spark, tmp_path, [(i, 0, 1, "click", v) for i, v in enumerate(vals)]
    )
    (r,) = _run("win_rescaled_range", spark, tmp_path)
    a = [float(round(v * 100)) for v in vals]
    rs_full, rs_half = _rs(a), _rs(a[16:])
    assert r["rs_full"] == pytest.approx(
        math.floor(rs_full * 1e4) / 1e4, abs=1e-9
    )
    assert r["rs_half"] == pytest.approx(
        math.floor(rs_half * 1e4) / 1e4, abs=1e-9
    )
    assert r["hurst"] == pytest.approx(
        math.floor(math.log2(rs_full / rs_half) * 1e4) / 1e4, abs=1e-9
    )


# ---------------------------------------------------------------------------
# Rolling correlation pair: exact 14-day Pearson between the purchase
# and click daily revenue series.


def test_rolling_corr_pair_exact(spark, tmp_path):
    days = 18
    rows, eid = [], 0
    a_series, b_series = [], []
    for d in range(days):
        av = 100.0 + ((3 * d * d + 5 * d) % 31)
        bv = 50.0 + ((7 * d + 11) % 17)
        a_series.append(round(av * 100))
        b_series.append(round(bv * 100))
        rows.append((eid, d, 1, "purchase", av)); eid += 1
        rows.append((eid, d, 2, "click", bv)); eid += 1
    _write_events(spark, tmp_path, rows)
    out = {r["day"]: r for r in _run("win_rolling_corr_pair", spark, tmp_path)}
    for i in range(days):
        day = f"2024-01-{i + 1:02d}"
        if i + 1 < 14:
            assert day not in out
            continue
        xa = a_series[i - 13 : i + 1]
        xb = b_series[i - 13 : i + 1]
        n = 14
        sa, sb = sum(xa), sum(xb)
        sab = sum(x * y for x, y in zip(xa, xb))
        saa, sbb = sum(x * x for x in xa), sum(y * y for y in xb)
        num = n * sab - sa * sb
        den = math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb)
        r = out[day]
        assert r["rev_a"] == pytest.approx(round(xa[-1] / 100.0, 2), abs=1e-9)
        assert r["rolling_corr"] == pytest.approx(round(num / den, 6), abs=1e-9), day
