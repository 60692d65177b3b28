"""Math functions (SURVEY.md section 2 B8 fn_math). Origin: the reference's
numeric work is byte-size arithmetic and equality (A9 child.py:83-88).
Transcendentals rounded to 6 dp for cross-engine float parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS net,
           ABS(l_discount - l_tax)                      AS abs_diff,
           CAST(l_quantity AS BIGINT) % 7               AS qty_mod,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_kfloor,
           CAST(CEIL(l_quantity / 10) AS BIGINT)        AS qty_decile,
           ROUND(sqrt(l_extendedprice), 6)              AS price_sqrt,
           ROUND(ln(l_extendedprice), 6)                AS price_ln,
           ROUND(pow(1 + l_tax, 2), 6)                  AS tax_sq,
           CAST(sign(l_discount - 0.05) AS DOUBLE)      AS disc_sign,
           greatest(l_quantity, 25.0)                   AS qty_hi,
           least(l_quantity, 25.0)                      AS qty_lo
    FROM lineitem
    WHERE l_orderkey < 500
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic, abs, modulo, floor/ceil, sqrt/ln/pow, sign,
    greatest/least."""
    t = load(spark, sf_dir)
    li = t.lineitem.where(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # round to 4 dp: the product of two 2-dp values lies exactly on the
        # 1e-4 lattice, so rounding at 2 dp hits true half-ties where Spark
        # (HALF_UP) and DuckDB (HALF_EVEN) disagree; at 4 dp it is exact.
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net"),
        F.abs(F.col("l_discount") - F.col("l_tax")).alias("abs_diff"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_kfloor"),
        F.ceil(F.col("l_quantity") / 10).alias("qty_decile"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("qty_hi"),
        F.least(F.col("l_quantity"), F.lit(25.0)).alias("qty_lo"),
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           xor(o_orderkey, o_custkey)          AS key_xor,
           o_orderkey & 255                    AS key_and,
           o_orderkey | 4096                   AS key_or,
           (o_orderkey & 1023) << 4            AS key_shl,
           o_orderkey >> 3                     AS key_shr,
           CAST(bit_count(o_orderkey) AS INTEGER) AS key_bits
    FROM orders
    WHERE o_orderkey < 2000
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise surface: xor/and/or, shifts, popcount — the primitive layer
    under the hash-family operators (simhash bands use exactly these).
    Shift amount bounded via the & 1023 mask so no sign-bit overflow
    behavior difference between engines can appear."""
    t = load(spark, sf_dir)
    o = t.orders.where(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").bitwiseXOR(F.col("o_custkey")).alias("key_xor"),
        F.col("o_orderkey").bitwiseAND(F.lit(255)).alias("key_and"),
        F.col("o_orderkey").bitwiseOR(F.lit(4096)).alias("key_or"),
        F.shiftleft(F.col("o_orderkey").bitwiseAND(F.lit(1023)), 4).alias("key_shl"),
        F.shiftright("o_orderkey", 3).alias("key_shr"),
        F.bit_count("o_orderkey").alias("key_bits"),
    )


@register(
    "fn_try_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice / NULLIF(l_discount, 0.0), 4) AS price_per_disc,
           CAST(l_quantity AS BIGINT) % NULLIF(CAST(l_tax * 100 AS BIGINT), 0)
             AS qty_mod_tax,
           try_cast(l_returnflag AS INTEGER) AS flag_as_int
    FROM lineitem
    WHERE l_orderkey < 2000
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic under ANSI mode (Spark 4 default): plain `/`
    or `%` by zero THROWS, killing the whole job for one bad row — at
    100 TB one poison row must not cost a 1000-executor stage retry.
    try_divide/try_mod/try_cast return NULL instead (the quarantine
    philosophy of A21 applied to expressions). l_discount and l_tax are
    0.0 on real rows, so the NULL path is exercised, and DuckDB's
    NULLIF-guarded division is the portable equivalent."""
    t = load(spark, sf_dir)
    li = t.lineitem.where(F.col("l_orderkey") < 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.try_divide("l_extendedprice", "l_discount"), 4).alias(
            "price_per_disc"
        ),
        F.try_mod(
            F.col("l_quantity").cast("bigint"),
            (F.col("l_tax") * 100).cast("bigint"),
        ).alias("qty_mod_tax"),
        F.try_to_number("l_returnflag", F.lit("9")).cast("int").alias("flag_as_int"),
    )
