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


_BUSDAYS_ORACLE = """
    WITH lags AS (
      SELECT l_orderkey,
             CAST(o_orderdate AS DATE) AS d0,
             CAST(l_shipdate AS DATE) AS d1
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_linenumber = 1
    )
    SELECT l_orderkey, CAST(d0 AS VARCHAR) AS order_date,
           CAST(d1 AS VARCHAR) AS ship_date,
           CAST(datediff('day', d0, d1) AS BIGINT) AS calendar_days,
           CAST(CASE WHEN d1 >= d0 THEN 1 ELSE -1 END
                * len(list_filter(
                      range(1, abs(datediff('day', d0, d1)) + 1),
                      i -> isodow(LEAST(d0, d1)
                                  + to_days(CAST(i AS INTEGER))) <= 5))
                AS BIGINT) AS business_days
    FROM lags
    ORDER BY l_orderkey, ship_date LIMIT 200
"""


@register("fn_business_days", oracle=_BUSDAYS_ORACLE)
def fn_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day lag between order and first-line ship date — the
    SLA arithmetic every ops dashboard needs and no engine ships as a
    builtin: count weekdays in (order_date, ship_date] by the
    closed-form full-weeks + ISO-weekday remainder identity
    (fn_datetime_calendar covers the calendar fields; this composes
    them into the derived measure). Weekends-only calendars differ per
    business — holiday tables join in the same shape.

    Scale/determinism: pure per-row Column arithmetic on day numbers
    and ISO weekdays (no UDF, no explode — the oracle's generate-series
    form is the spec, the closed form is the 100 TB implementation);
    bounded 200-row deterministic slice."""
    t = load(spark, sf_dir)
    lags = (
        t.lineitem.where(F.col("l_linenumber") == 1)
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "l_orderkey",
            F.to_date("o_orderdate").alias("d0"),
            F.to_date("l_shipdate").alias("d1"),
        )
    )
    cal = F.datediff("d1", "d0")
    # signed interval: count weekdays in (lo, hi], negate when the ship
    # date precedes the order date (synthetic rows carry both orders —
    # a quarantine rule's business, not this function's)
    lo = F.least("d0", "d1")
    span = F.abs(cal)
    sign = F.when(cal >= 0, F.lit(1)).otherwise(F.lit(-1))
    # closed form: full weeks contribute 5 each; the remainder r days
    # after lo contribute weekdays among isodow(lo)+1..+r on the circle
    dow0 = F.weekday(lo) + 1  # ISO 1..7
    r = span % 7
    rem = F.aggregate(
        F.sequence(F.lit(1), r),
        F.lit(0),
        lambda acc, i: acc
        + (((dow0 + i - 1) % 7 + 1) <= 5).cast("int"),
    )
    bus = sign * (
        (span / 7).cast("bigint") * 5 + F.when(r > 0, rem).otherwise(0)
    )
    return (
        lags.select(
            "l_orderkey",
            F.col("d0").cast("string").alias("order_date"),
            F.col("d1").cast("string").alias("ship_date"),
            cal.cast("bigint").alias("calendar_days"),
            bus.cast("bigint").alias("business_days"),
        )
        # the fixture repeats l_linenumber=1 within an order, so the
        # slice needs a TOTAL order: the r10 sf0.001 sweep caught the
        # key-only sort cutting the 200-row boundary tie differently
        # per engine (ties beyond (key, ship_date) are fully identical
        # output rows, so the multiset is deterministic from here)
        .orderBy("l_orderkey", "ship_date")
        .limit(200)
    )
