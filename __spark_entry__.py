"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query smoke check on sf0.001.
- ``queries()``: every implemented operator from SURVEY.md §2 (and the
  LLM-pipeline extensions) as (spark, sf_dir) -> DataFrame callables.
- ``oracle_sql()``: matching DuckDB SQL per query for the correctness gate.

Implementations live in pumle_spark/workload/*; this module only adapts them
to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pumle_spark import workload


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1 pricing summary on /root/testdata/sf0.001."""
    return workload.queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return workload.queries()


def oracle_sql() -> dict[str, str]:
    return workload.oracle_sql()
