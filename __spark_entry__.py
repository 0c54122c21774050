"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over dabstract_spark.queries — the query catalog where every
implemented SURVEY.md §2 operator is registered with its DuckDB oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shape pricing summary) on sf0.001."""
    from dabstract_spark.queries import q01_pricing_summary

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dabstract_spark.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from dabstract_spark.queries import oracle_sql as _o

    return _o()
