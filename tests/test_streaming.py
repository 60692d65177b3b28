"""Streaming semantics tests: watermark late-drop behavior (promised by
stream_watermark_late's docstring) and stream/batch parity spot checks.
Cross-engine value parity for the SQL-expressible stream ops lives in
tools/check_oracle.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_poc_spark import registry
from data_ingestion_poc_spark.catalog import load


def test_watermark_drops_late_rows(spark, sf_dir):
    """The staged two-micro-batch replay must drop the late (pre-cutoff)
    rows: every emitted window starts at/after the cutoff hour, and the
    total event count is strictly less than the full table's."""
    res = registry.get("stream_watermark_late").fn(spark, sf_dir)
    rows = res.collect()
    assert rows, "watermark query emitted nothing"
    assert all(r["window_start"] >= "2024-01-06 00:00:00" for r in rows), rows[:5]
    total = sum(r["n_events"] for r in rows)
    n_all = load(spark, sf_dir).events.count()
    n_recent = load(spark, sf_dir).events.where(F.col("ts") >= "2024-01-06").count()
    assert total <= n_recent < n_all


def test_stream_tumbling_matches_batch(spark, sf_dir):
    """Stream aggregation (AvailableNow over the same file) must equal the
    batch groupBy — the parity the oracle checks cross-engine, pinned here
    Spark-vs-Spark."""
    streamed = {
        r["window_start"]: (r["n_events"], r["sum_value"])
        for r in registry.get("stream_tumbling_agg").fn(spark, sf_dir).collect()
    }
    ev = load(spark, sf_dir).events
    batch = {
        r["window_start"]: (r["n"], r["s"])
        for r in ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            )
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .collect()
    }
    assert streamed == batch


def test_stream_stream_join_bounded_and_correct(spark, sf_dir):
    """Every joined click must fall in the (p_ts - 10min, p_ts] interval of
    its purchase and share the user — verified row by row against batch."""
    res = registry.get("stream_stream_join").fn(spark, sf_dir)
    got = {(r["purchase_id"], r["click_id"]) for r in res.collect()}
    ev = load(spark, sf_dir).events
    p = ev.where("event_type='purchase'").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    c = ev.where("event_type='click'").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    want = {
        (r["purchase_id"], r["click_id"])
        for r in p.join(
            c,
            (F.col("pu") == F.col("cu"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("cts") <= F.col("pts")),
        ).collect()
    }
    assert got == want
    assert want, "fixture produced no purchase-click pairs"


def test_rocksdb_state_store_toggle():
    """enable_rocksdb_state_store must set the provider + changelog
    checkpointing on the builder (checked via the builder's options, not a
    live session — the shared test session already exists and a second
    getOrCreate would just return it)."""
    from data_ingestion_poc_spark.session import builder, enable_rocksdb_state_store

    b = enable_rocksdb_state_store(builder(app_name="rocksdb-toggle-test"))
    opts = b._options
    assert (
        opts["spark.sql.streaming.stateStore.providerClass"]
        == "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    assert (
        opts["spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"]
        == "true"
    )


def test_transform_with_state_guard_or_parity(spark, sf_dir):
    """stream_transform_with_state is env-gated (its state server needs
    google.protobuf, absent here). Without protobuf the guard must raise
    a clear NotImplementedError BEFORE starting a stream; with protobuf
    present the result must match the batch aggregate."""
    import pytest

    from data_ingestion_poc_spark.streaming.batch_parity import (
        stream_transform_with_state,
    )

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="protobuf"):
            stream_transform_with_state(spark, sf_dir)
        return
    got = stream_transform_with_state(spark, sf_dir)
    from data_ingestion_poc_spark.catalog import load
    from pyspark.sql import functions as F

    ev = load(spark, sf_dir).events
    exp = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.round(F.max("value"), 2).alias("max_value"),
    )
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0
