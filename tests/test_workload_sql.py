"""Spark SQL surface: the same tables and semantics through spark.sql()
(SURVEY §3.3 — full SQL comes free once views are registered)."""

from __future__ import annotations

import pyspark.sql.functions as F

from pumle_spark.tables import register_views

SF = "/root/testdata/sf0.001"


def test_sql_views_run_relational_queries(spark):
    register_views(spark, SF)
    df = spark.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sq
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag
        """
    )
    rows = {r.l_returnflag: (r.n, r.sq) for r in df.collect()}
    assert set(rows) == {"A", "N", "R"}

    # joins + windows through SQL too
    top = spark.sql(
        """
        SELECT * FROM (
          SELECT o_custkey, o_orderkey,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) rn
          FROM orders) WHERE rn = 1
        """
    )
    assert top.count() == spark.sql("SELECT COUNT(DISTINCT o_custkey) FROM orders").collect()[0][0]


def test_sql_matches_dataframe_result(spark):
    register_views(spark, SF)
    from pumle_spark import workload

    df_api = workload.queries()["q1_pricing_summary"](spark, SF)
    sql_api = spark.sql(workload.REGISTRY["q1_pricing_summary"].sql.replace("STRFTIME", "DATE_FORMAT"))
    # DuckDB-dialect oracle happens to be ANSI enough for Spark SQL here
    a = sorted(map(tuple, df_api.collect()))
    b = sorted(map(tuple, sql_api.collect()))
    assert a == b
