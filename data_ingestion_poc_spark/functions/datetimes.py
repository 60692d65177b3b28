"""Datetime functions (SURVEY.md section 2 B8 fn_datetime).

Origin: the reference juggles three time encodings — epoch seconds from
curl (child.py:58), zip DOS tuples via time.mktime (child.py:105), and
'%Y%m%d%H%M%S' strings from FTP MLSD (scrap/child_otherftp.py:148-149).
Session TZ is pinned UTC (session.py) so epoch math matches DuckDB on the
naive parquet timestamps. Sub-second-bearing outputs are formatted to
strings (ns-vs-us width differs between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "fn_datetime",
    oracle="""
    SELECT event_id,
           CAST(year(ts) AS INT)                              AS y,
           CAST(month(ts) AS INT)                             AS mo,
           CAST(day(ts) AS INT)                               AS d,
           CAST(hour(ts) AS INT)                              AS h,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT)    AS epoch_s,
           strftime(to_timestamp(CAST(epoch(date_trunc('second', ts)) AS BIGINT)),
                    '%Y-%m-%d %H:%M:%S')                      AS roundtrip,
           strftime(ts, '%Y%m%d%H%M%S')                       AS mlsd_str,
           strftime(strptime(strftime(ts, '%Y%m%d%H%M%S'), '%Y%m%d%H%M%S'),
                    '%Y-%m-%d %H:%M:%S')                      AS mlsd_parsed,
           datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since
    FROM events
    WHERE event_id < 2000
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar parts, truncation, epoch round-trip, the reference's MLSD
    '%Y%m%d%H%M%S' format (parse + format), and date difference."""
    t = load(spark, sf_dir)
    ev = t.events.where(F.col("event_id") < 2000)
    epoch_s = F.unix_timestamp(F.date_trunc("second", F.col("ts")))
    mlsd = F.date_format("ts", "yyyyMMddHHmmss")
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
            "hour_bucket"
        ),
        epoch_s.alias("epoch_s"),
        F.date_format(F.to_timestamp(F.from_unixtime(epoch_s)), "yyyy-MM-dd HH:mm:ss").alias(
            "roundtrip"
        ),
        mlsd.alias("mlsd_str"),
        F.date_format(F.to_timestamp(mlsd, "yyyyMMddHHmmss"), "yyyy-MM-dd HH:mm:ss").alias(
            "mlsd_parsed"
        ),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("days_since"),
    )


@register(
    "fn_datetime_calendar",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)    AS y,
           CAST(quarter(o_orderdate) AS INTEGER) AS q,
           CAST(month(o_orderdate) AS INTEGER)   AS m,
           CAST(day(o_orderdate) AS INTEGER)     AS d,
           CAST(week(o_orderdate) AS INTEGER)    AS iso_week,
           CAST(isodow(o_orderdate) - 1 AS INTEGER) AS wday_mon0,
           strftime(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d') AS plus3m,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')  AS eom,
           strftime(CAST(o_orderdate AS DATE) + 90, '%Y-%m-%d')       AS plus90d
    FROM orders
    WHERE o_orderkey < 3000
    """,
)
def fn_datetime_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar extracts + date arithmetic: year/quarter/month/day, ISO
    week, Monday-0 weekday (Spark weekday == DuckDB isodow-1 — the
    engines' raw dayofweek anchors differ, a classic parity trap),
    month-clamped add_months, last_day, and day offsets."""
    t = load(spark, sf_dir)
    o = t.orders.where(F.col("o_orderkey") < 3000)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.quarter("o_orderdate").alias("q"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.weekday("o_orderdate").alias("wday_mon0"),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus3m"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("eom"),
        F.date_format(F.date_add(d, 90), "yyyy-MM-dd").alias("plus90d"),
    )
