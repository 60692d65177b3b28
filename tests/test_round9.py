"""Semantics tests for the round-9 additions. Oracle parity is covered
by check_oracle / the driver; these pin dispatch behavior, hand-computable
values, and edge cases."""

from __future__ import annotations

import os

import pytest

from data_ingestion_poc_spark import registry

SF001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from data_ingestion_poc_spark.session import get_spark

    return get_spark(shuffle_partitions=4)


# --- embed_hubness auto-dispatch (VERDICT r8 item 2)


def test_hubness_dispatches_to_ivf_above_cap(spark, monkeypatch):
    """Below the cap the exact brute path runs; above it the IVF fold.
    Force the boundary with a tiny cap: the IVF path's plan joins on the
    cell id (qc = nc) while brute has no such column."""
    from data_ingestion_poc_spark.llm import similarity as sim

    brute = registry.get("embed_hubness").fn(spark, SF001)
    monkeypatch.setattr(sim, "HUBNESS_BRUTE_MAX", 10)
    ivf = registry.get("embed_hubness").fn(spark, SF001)
    # same report schema either way: the consumer never sees the switch
    assert brute.columns == ivf.columns
    b, v = brute.collect()[0], ivf.collect()[0]
    assert b["n"] == v["n"] == 500
    # within-cell candidate lists can only SHRINK k-occurrence spread:
    # a vector can appear in at most (its cell size - 1) lists
    assert v["max_k_occ"] <= b["n"]
    # both paths fold the identical closed-form moment report
    for r in (b, v):
        assert r["n_antihubs"] >= 0 and r["n_hubs"] >= 0
        assert r["max_k_occ"] >= 0


def test_hubness_ivf_matches_dispatched_path(spark, monkeypatch):
    """embed_hubness_ivf (the forced, separately-oracled scale path) must
    equal what embed_hubness produces when dispatched above the cap,
    modulo the extra nlist column."""
    from data_ingestion_poc_spark.llm import similarity as sim

    forced = registry.get("embed_hubness_ivf").fn(spark, SF001).collect()[0]
    monkeypatch.setattr(sim, "HUBNESS_BRUTE_MAX", 10)
    dispatched = registry.get("embed_hubness").fn(spark, SF001).collect()[0]
    for c in dispatched.asDict():
        assert forced[c] == dispatched[c], c
    assert forced["nlist"] == 23  # ceil(sqrt(500))


# --- per-process warehouse isolation (r8 flake: concurrent JVMs sharing
# spark-warehouse/ wiped each other's bucketed table directories)


def test_warehouse_dir_is_process_unique(spark):
    wh = spark.conf.get("spark.sql.warehouse.dir")
    assert os.environ.get("DIP_WAREHOUSE_DIR") or str(os.getpid()) in wh


def test_bucketed_fixture_rebuilds_in_fresh_warehouse(spark):
    """The bucketed fixture must be self-healing: dropping the table (as
    a fresh process with an empty warehouse would see) and re-preparing
    yields a readable bucketed table again."""
    from data_ingestion_poc_spark.operators.scale import prepare_bucketed

    spark.sql("DROP TABLE IF EXISTS bkt_orders_sf0_001")
    prepare_bucketed(spark, SF001)
    assert spark.table("bkt_orders_sf0_001").count() > 0


# --- blob-store seam (VERDICT r8 item 5: A18/A19 store-level contract)


def test_local_blob_store_properties_roundtrip(tmp_path):
    from data_ingestion_poc_spark.ingest.blobstore import LocalBlobStore

    s = LocalBlobStore(str(tmp_path))
    assert s.get_properties("a/b/c.bin") is None
    meta = {"creation_time": "5", "modified_time": "5", "file_size": "3"}
    s.upload("a/b/c.bin", b"xyz", meta)
    p = s.get_properties("a/b/c.bin")
    assert p == {"size": 3, "metadata": meta}
    s.upload("a/b/c.bin", b"longer", {"file_size": "6"})  # overwrite=True
    assert s.get_properties("a/b/c.bin")["size"] == 6


def test_azure_blob_store_is_import_guarded():
    from data_ingestion_poc_spark.ingest.blobstore import AzureBlobStore

    with pytest.raises(ImportError, match="azure-storage-blob"):
        AzureBlobStore("conn-str", "container")


def test_dup_suffix_handles_extensionless_names():
    from data_ingestion_poc_spark.ingest.blobstore import dup_suffixed

    assert dup_suffixed("report.csv", 99) == "report_99.csv"
    assert dup_suffixed("README", 99) == "README_99"
    assert dup_suffixed("a.tar.gz", 7) == "a.tar_7.gz"
