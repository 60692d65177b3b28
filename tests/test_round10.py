"""Round-10 semantics tests: the ADVICE-r9 exact-arithmetic fixes
(page-hinkley overflow regime, neyman integral division, aroon negative
values, blobstore corrupt-sidecar degrade) and the new r10 seams.
Oracle parity is covered by check_oracle / the driver; these pin the
regimes the sf0.01 fixtures cannot reach."""

from __future__ import annotations

import datetime
import json
import math

import pytest

from data_ingestion_poc_spark import registry

SF001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from data_ingestion_poc_spark.session import get_spark

    return get_spark(shuffle_partitions=4)


def _write_orders(spark, tmp_path, day_prices):
    """day_prices: list of (date, [o_totalprice,...]) — one orders row
    per price. Only the columns agg_page_hinkley reads."""
    rows = []
    oid = 0
    for day, prices in day_prices:
        for p in prices:
            rows.append((oid, 1, "O", float(p), day, "1-URGENT", "c", 0, ""))
            oid += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string,"
        " o_clerk string, o_shippriority int, o_comment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))


def _ph_model(day_cents):
    """Exact-integer Page-Hinkley model (Python bigints; the double
    steps mirror the engines' decimal->double final projection)."""
    out = []
    cum = 0
    u = 0
    umin = None
    for t, cents in enumerate(day_cents, start=1):
        cum += cents
        n = (cents * t - cum) * 1_000_000
        u += n // t  # Python // is floor division: exact floor(n/t)
        umin = u if umin is None else min(umin, u)
        dev = math.floor(float(u) / 1e6) / 100.0
        ph = math.floor(float(u - umin) / 1e6) / 100.0
        out.append((dev, ph))
    return out


def test_page_hinkley_exact_beyond_2pow63(spark, tmp_path):
    """ADVICE r9 (medium): F.floor(double) returns BIGINT, so the old
    floor-then-cast wrapped at 2^63 and the double product was already
    inexact past 2^53. Drive daily micro-cent deviations to ~1e21
    (the claimed 100 TB regime) and pin the engine row-for-row against
    an exact-bigint model."""
    base = datetime.date(2024, 1, 1)
    # one order per day at ~1e13 dollars -> daily cents ~1e15; a level
    # shift mid-series makes |deviation| ~1e15 cents = 1e21 micro-cents
    prices = [1e13, 1.1e13, 0.9e13, 1e13, 5e13, 5.2e13, 4.8e13, 5e13]
    day_prices = [
        (base + datetime.timedelta(days=i), [p]) for i, p in enumerate(prices)
    ]
    _write_orders(spark, tmp_path, day_prices)
    got = registry.get("agg_page_hinkley").fn(spark, str(tmp_path)).collect()
    day_cents = [round(p * 100) for p in prices]
    want = _ph_model(day_cents)
    assert len(got) == len(want)
    for row, (dev, ph) in zip(got, want):
        assert row["deviation_cum"] == dev, (row, dev)
        assert row["page_hinkley"] == ph, (row, ph)
    # the regime claim: at least one |U_t| beyond 2^63 micro-cents
    u = 0
    cum = 0
    seen = 0
    for t, cents in enumerate(day_cents, start=1):
        cum += cents
        u += ((cents * t - cum) * 1_000_000) // t
        seen = max(seen, abs(u))
    assert seen > 2**63


def test_blob_store_corrupt_sidecar_degrades(tmp_path):
    """ADVICE r9: a truncated/corrupt metadata sidecar must degrade to
    empty metadata (safe fresh re-upload), not raise JSONDecodeError and
    fail the whole upload task; a non-dict JSON payload likewise."""
    from data_ingestion_poc_spark.ingest.blobstore import LocalBlobStore

    s = LocalBlobStore(str(tmp_path))
    s.upload("f/t/x.bin", b"abc", {"file_size": "3"})
    sidecar = tmp_path / "_meta" / "f" / "t" / "x.bin.json"
    sidecar.write_text('{"file_size": "3"')  # truncated
    assert s.get_properties("f/t/x.bin") == {"size": 3, "metadata": {}}
    sidecar.write_text('["not", "a", "dict"]')
    assert s.get_properties("f/t/x.bin") == {"size": 3, "metadata": {}}


def test_upload_records_props_match_uses_record_length(spark, tmp_path):
    """props_match verifies the stored size against the RECORD's length
    field (the reference's integrity contract) — a truncated fetch whose
    content is shorter than the manifest length must flag, not pass
    trivially against its own len(content)."""
    from data_ingestion_poc_spark.ingest.blobstore import (
        LocalBlobStore,
        upload_records,
    )

    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [
            ("srv", "csv", "ok.csv", 3, 100, bytearray(b"abc")),
            ("srv", "csv", "short.csv", 9, 100, bytearray(b"abc")),
        ],
        "server_folder string, file_type string, file_name string,"
        " length long, modified_time long, content binary",
    )
    rows = {
        r["file_name"]: r
        for r in upload_records(df, lambda: LocalBlobStore(root)).collect()
    }
    assert rows["ok.csv"]["props_match"] is True
    assert rows["short.csv"]["props_match"] is False


def test_parse_server_scheme_default_ports():
    """Reference child_otherftp.py:124: port falls back by scheme —
    21 for ftp, 22 for sftp."""
    from data_ingestion_poc_spark.ingest.netfetch import parse_server

    assert parse_server("ftp://host.example")["port"] == 21
    assert parse_server("sftp://host.example")["port"] == 22
    assert parse_server("sftp://host.example:2222")["port"] == 2222
    assert parse_server("sftp://u:p@host.example")["user"] == "u"


def test_sftp_fetcher_guard():
    from data_ingestion_poc_spark.ingest import netfetch

    if netfetch.paramiko is not None:
        pytest.skip("paramiko present: guard moot")
    with pytest.raises(NotImplementedError, match="paramiko"):
        netfetch.SftpFetcher()
    # and the lazy pipeline re-export resolves the class
    from data_ingestion_poc_spark.ingest import pipeline

    assert pipeline.SftpFetcher is netfetch.SftpFetcher


class _FakeSftpAttrs:
    def __init__(self, size, mtime):
        self.st_size = size
        self.st_mtime = mtime


class _FakeSftpFile:
    def __init__(self, data):
        self._data = data

    def read(self):
        return self._data

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _FakeSftpClient:
    def __init__(self, tree):
        self._tree = tree

    def stat(self, path):
        if path not in self._tree:
            raise FileNotFoundError(path)
        data, mtime = self._tree[path]
        return _FakeSftpAttrs(len(data) if data is not None else None, mtime)

    def open(self, path, mode):
        return _FakeSftpFile(self._tree[path][0])


class _FakeSSHClient:
    """Paramiko-shaped stub: records connect kwargs + close calls so the
    contract test can assert lazy-per-call connections."""

    instances = []

    def __init__(self):
        self.connect_kwargs = None
        self.closed = False
        _FakeSSHClient.instances.append(self)

    def set_missing_host_key_policy(self, policy):
        self.policy = policy

    def load_host_keys(self, path):
        self.host_keys = path

    def connect(self, host, port, username, password, timeout):
        self.connect_kwargs = dict(
            host=host, port=port, username=username, password=password
        )

    def open_sftp(self):
        return _FakeSftpClient(
            {
                "/data/a.bin": (b"hello sftp", 1700000000),
                "/data/no_size.bin": (None, 1700000000),
            }
        )

    def close(self):
        self.closed = True


def test_sftp_fetcher_contract(monkeypatch):
    """Drive SftpFetcher through a paramiko-shaped stub: the seam
    contract (stat -> (size, epoch mtime), read -> bytes, raise on a
    server non-answer, one lazily-opened connection per call, always
    closed) holds without the wheel installed."""
    import types

    from data_ingestion_poc_spark.ingest import netfetch

    fake = types.SimpleNamespace(
        SSHClient=_FakeSSHClient, AutoAddPolicy=lambda: "auto-add"
    )
    monkeypatch.setattr(netfetch, "paramiko", fake)
    _FakeSSHClient.instances = []
    f = netfetch.SftpFetcher()
    size, mtime = f.stat("sftp://alice:pw@host.example", "/data/a.bin")
    assert (size, mtime) == (10, 1700000000)
    assert f.read("sftp://alice:pw@host.example", "/data/a.bin") == b"hello sftp"
    with pytest.raises(FileNotFoundError):
        f.stat("sftp://host.example", "/data/ghost.bin")
    with pytest.raises(OSError, match="file size"):
        f.stat("sftp://host.example", "/data/no_size.bin")
    # one connection per call, every one closed, scheme-default port 22
    assert len(_FakeSSHClient.instances) == 4
    assert all(c.closed for c in _FakeSSHClient.instances)
    assert _FakeSSHClient.instances[0].connect_kwargs == dict(
        host="host.example", port=22, username="alice", password="pw"
    )


def _write_typed_events(spark, tmp_path, rows):
    """rows: (event_id, event_type, value)."""
    data = [
        (eid, datetime.datetime(2024, 1, 1, 0, eid % 60, eid % 59), 1, et,
         float(v), None)
        for eid, et, v in rows
    ]
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def _cvm_model(a_vals, b_vals):
    """Brute two-sample Cramer-von Mises T over the pooled sample."""
    na, nb = len(a_vals), len(b_vals)
    pooled = sorted(a_vals + b_vals)
    sa, sb = sorted(a_vals), sorted(b_vals)

    def ecdf(sorted_vals, x):
        import bisect

        return bisect.bisect_right(sorted_vals, x) / len(sorted_vals)

    ssq = sum((ecdf(sa, z) - ecdf(sb, z)) ** 2 for z in pooled)
    return na * nb / (na + nb) ** 2 * ssq


def test_cvm_matches_brute_model(spark, tmp_path):
    """Engine T (floored at 1e-6) must match the brute pooled-sample
    model on asymmetric samples with ties across and within groups."""
    a = [1.0, 2.0, 2.0, 3.5, 7.25, 7.25, 9.0, 12.0]
    b = [2.0, 4.0, 4.0, 4.0, 8.5, 12.0, 15.0]
    rows = [(i, "purchase", v) for i, v in enumerate(a)]
    rows += [(100 + i, "click", v) for i, v in enumerate(b)]
    _write_typed_events(spark, tmp_path, rows)
    r = registry.get("agg_cvm_test").fn(spark, str(tmp_path)).collect()[0]
    want = _cvm_model(a, b)
    assert (r["n_a"], r["n_b"]) == (len(a), len(b))
    assert r["t_stat"] == math.floor(want * 1_000_000) / 1_000_000


def test_cvm_identical_samples_zero(spark, tmp_path):
    vals = [1.0, 3.0, 5.0, 7.0, 11.0] * 4
    rows = [(i, "purchase", v) for i, v in enumerate(vals)]
    rows += [(200 + i, "click", v) for i, v in enumerate(vals)]
    _write_typed_events(spark, tmp_path, rows)
    r = registry.get("agg_cvm_test").fn(spark, str(tmp_path)).collect()[0]
    assert r["t_stat"] == 0.0 and r["significant"] is False


def test_cvm_separated_samples_significant(spark, tmp_path):
    rows = [(i, "purchase", float(i % 7)) for i in range(60)]
    rows += [(500 + i, "click", 100.0 + i % 7) for i in range(60)]
    _write_typed_events(spark, tmp_path, rows)
    r = registry.get("agg_cvm_test").fn(spark, str(tmp_path)).collect()[0]
    assert r["significant"] is True


def _ljung_box_model(series, lags):
    """Brute Ljung-Box on the engine's milli-lattice quantization."""
    n = len(series)
    s1 = sum(series)
    yp = [((v * n - s1) - ((v * n - s1) % 1000)) // 1000 for v in series]
    den = sum(v * v for v in yp)
    out = []
    qsum = 0.0
    for k in range(1, lags + 1):
        num = sum(yp[t] * yp[t - k] for t in range(k, n))
        r = float(num) / float(den)
        qsum += r * r / (n - k)
        out.append((r, n * (n + 2.0) * qsum))
    return out


def test_ljung_box_matches_brute_model(spark, tmp_path):
    """Engine autocorr/Q at every lag vs the exact-lattice Python model
    on a deterministic mixed series (trend + cycle + residue)."""
    base = datetime.date(2024, 1, 1)
    prices = [
        100.0 + 3.0 * (i % 7) + ((i * 37) % 11) + 0.01 * i for i in range(40)
    ]
    day_prices = [
        (base + datetime.timedelta(days=i), [p]) for i, p in enumerate(prices)
    ]
    _write_orders(spark, tmp_path, day_prices)
    got = (
        registry.get("agg_autocorr_ljung_box")
        .fn(spark, str(tmp_path))
        .collect()
    )
    from data_ingestion_poc_spark.operators.stats import LJUNG_BOX_LAGS

    cents = [round(p * 100) for p in prices]
    want = _ljung_box_model(cents, LJUNG_BOX_LAGS)
    assert len(got) == LJUNG_BOX_LAGS
    for row, (r, q) in zip(got, want):
        assert row["autocorr"] == round(r, 6), (row, r)
        assert row["q_stat"] == round(q, 4), (row, q)


def test_ljung_box_periodic_series_significant(spark, tmp_path):
    """A hard weekly cycle must reject white noise at lag 7."""
    base = datetime.date(2024, 1, 1)
    prices = [100.0 if i % 7 else 5000.0 for i in range(70)]
    day_prices = [
        (base + datetime.timedelta(days=i), [p]) for i, p in enumerate(prices)
    ]
    _write_orders(spark, tmp_path, day_prices)
    got = (
        registry.get("agg_autocorr_ljung_box")
        .fn(spark, str(tmp_path))
        .collect()
    )
    assert got[-1]["lag"] == 7 and got[-1]["significant"] is True
    # the lag-7 autocorrelation itself must be strongly positive
    assert got[-1]["autocorr"] > 0.5


def test_page_hinkley_negative_deviation_floor(spark, tmp_path):
    """Negative increments must floor toward -inf (pmod construction),
    not truncate toward zero: a falling series keeps U_t exact."""
    base = datetime.date(2024, 1, 1)
    prices = [100.0, 70.0, 40.0, 10.0, 5.0]
    day_prices = [
        (base + datetime.timedelta(days=i), [p]) for i, p in enumerate(prices)
    ]
    _write_orders(spark, tmp_path, day_prices)
    got = registry.get("agg_page_hinkley").fn(spark, str(tmp_path)).collect()
    want = _ph_model([round(p * 100) for p in prices])
    for row, (dev, ph) in zip(got, want):
        assert row["deviation_cum"] == dev
        assert row["page_hinkley"] == ph
