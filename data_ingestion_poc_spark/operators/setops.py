"""Set operations (SURVEY.md section 2 B7). Extensions — the reference has
no set algebra. Spark semantics mirror ANSI: UNION ALL = bag concat (no
shuffle at all), UNION/INTERSECT/EXCEPT = set semantics (hash shuffle on
all columns), exceptAll/intersectAll = bag semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "set_union_all",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union via unionByName — a pure concatenation of partitions,
    zero shuffle."""
    t = load(spark, sf_dir)
    c = t.customer.select("c_custkey", "c_mktsegment")
    a = c.where(F.col("c_mktsegment") == "BUILDING")
    b = c.where(F.col("c_mktsegment") == "MACHINERY")
    return a.unionByName(b)


@register(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union: concat + distinct (one hash shuffle on the key)."""
    t = load(spark, sf_dir)
    a = t.customer.select(F.col("c_nationkey").alias("nationkey"))
    b = t.supplier.select(F.col("s_nationkey").alias("nationkey"))
    return a.unionByName(b).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 4000
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (distinct semantics in both Spark and ANSI)."""
    t = load(spark, sf_dir)
    a = t.customer.where(F.col("c_acctbal") > 4000).select(
        F.col("c_nationkey").alias("nationkey")
    )
    b = t.supplier.select(F.col("s_nationkey").alias("nationkey"))
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
    SELECT c_mktsegment, c_nationkey FROM customer WHERE c_acctbal > 1000
    EXCEPT ALL
    SELECT c_mktsegment, c_nationkey FROM customer WHERE c_acctbal > 3000
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference (EXCEPT ALL): multiplicity-aware, matching ANSI."""
    t = load(spark, sf_dir)
    base = t.customer.select("c_mktsegment", "c_nationkey", "c_acctbal")
    a = base.where(F.col("c_acctbal") > 1000).drop("c_acctbal")
    b = base.where(F.col("c_acctbal") > 3000).drop("c_acctbal")
    return a.exceptAll(b)


@register(
    "set_intersect_all",
    oracle="""
    SELECT c_mktsegment, c_nationkey FROM customer WHERE c_acctbal > 1000
    INTERSECT ALL
    SELECT c_mktsegment, c_nationkey FROM customer WHERE c_acctbal < 6000
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection (INTERSECT ALL): keeps min(multiplicity) copies,
    matching ANSI — the multiplicity-aware sibling of set_intersect."""
    t = load(spark, sf_dir)
    base = t.customer.select("c_mktsegment", "c_nationkey", "c_acctbal")
    a = base.where(F.col("c_acctbal") > 1000).drop("c_acctbal")
    b = base.where(F.col("c_acctbal") < 6000).drop("c_acctbal")
    return a.intersectAll(b)


@register(
    "set_except_distinct",
    oracle="""
    SELECT c_mktsegment, c_nationkey FROM customer WHERE c_acctbal > 1000
    EXCEPT
    SELECT c_mktsegment, c_nationkey FROM customer WHERE c_acctbal > 9000
    """,
)
def set_except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (EXCEPT, distinct semantics) — completes the
    all/distinct matrix with set_except's EXCEPT ALL. The right side is
    deliberately sparse (>9000) so the difference is non-trivial at every
    scale factor."""
    t = load(spark, sf_dir)
    base = t.customer.select("c_mktsegment", "c_nationkey", "c_acctbal")
    a = base.where(F.col("c_acctbal") > 1000).drop("c_acctbal")
    b = base.where(F.col("c_acctbal") > 9000).drop("c_acctbal")
    return a.subtract(b)
