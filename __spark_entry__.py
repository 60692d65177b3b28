"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship pricing-summary query on sf0.001 (smoke).
queries()      — every implemented operator from SURVEY.md section 2,
                 name -> fn(spark, sf_dir) -> DataFrame.
oracle_sql()   — matching DuckDB SQL per query (omitted => rows-only).

All real logic lives in data_ingestion_poc_spark/; this module only
exposes the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_ingestion_poc_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.get("agg_hash_group").fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in registry.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle
        for name, q in registry.all_queries().items()
        if q.oracle is not None
    }
