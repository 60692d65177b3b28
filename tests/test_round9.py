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
