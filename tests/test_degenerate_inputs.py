"""Degenerate-VALUES hardening sweep: every registered query must survive —
identically on both engines — inputs whose values carry no variance at all.

The empty and singleton sweeps (test_empty_inputs.py) cover cardinality
boundaries; this one covers the statistics boundaries that plenty of rows
can still hit: zero-variance measures (correlation/OLS/assortativity
denominators), all-identical timestamps (zero-span TWAP, zero gaps), a
single-token corpus (log-log fits, Herdan's C), identical embeddings (zero
cosine spread). Spark 4's ANSI default turns an unguarded division on any
of these into a job-killing DIVIDE_BY_ZERO rather than a quiet inf — this
sweep is how the six guards in the wave-3 operators were found, and it
pins the whole registry against regressions of that class.
"""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# per-table constant overrides (SQL expression strings — resolved inside the
# fixture, where a session exists): kill every source of variance the schema
# allows
_CONST = {
    "documents": {
        "text": "'hello'",
        "lang": "'en'",
        "source": "'s'",
        "n_chars": "CAST(5 AS BIGINT)",
    },
    "events": {
        "ts": "CAST('2024-01-01 00:00:00' AS TIMESTAMP)",
        "event_type": "'view'",
        "value": "7.0D",
        "props": "'{}'",
    },
    "orders": {
        "o_totalprice": "100.0D",
        "o_orderdate": "CAST('1996-01-01' AS TIMESTAMP)",
        "o_orderstatus": "'F'",
        "o_orderpriority": "'1-URGENT'",
    },
    "lineitem": {
        "l_quantity": "10.0D",
        "l_extendedprice": "100.0D",
        "l_discount": "0.0D",
        "l_tax": "0.0D",
        "l_returnflag": "'N'",
        "l_linestatus": "'O'",
        "l_shipdate": "CAST('1996-02-01' AS TIMESTAMP)",
    },
    "part": {
        "p_retailprice": "100.0D",
        "p_size": "10",
        "p_brand": "'Brand#1'",
        "p_type": "'t'",
        "p_name": "'widget'",
    },
    "embeddings": {
        "embedding": "transform(sequence(1, 64), i -> CAST(0.125 AS FLOAT))",
        "label": "1",
    },
}

_N_ROWS = 8  # enough rows that groups/windows/joins genuinely execute


@pytest.fixture(scope="module")
def flat_sf(spark, tmp_path_factory):
    from pumle_spark.tables import table

    d = tmp_path_factory.mktemp("sf_flat")
    for t in TABLES:
        df = table(spark, "/root/testdata/sf0.001", t).limit(_N_ROWS)
        for col, expr in _CONST.get(t, {}).items():
            df = df.withColumn(col, F.expr(expr).cast(df.schema[col].dataType))
        df.write.parquet(f"{d}/{t}.parquet")
    return str(d)


def test_every_query_survives_zero_variance_inputs(spark, flat_sf):
    import duckdb

    from pumle_spark import workload

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{flat_sf}/{t}.parquet/*.parquet'")

    qs, sqls = workload.queries(), workload.oracle_sql()
    failures = []
    for name, fn in qs.items():
        try:
            srows = fn(spark, flat_sf).count()
        except Exception as ex:  # noqa: BLE001 — collecting the full report
            failures.append(f"{name}: spark raised {type(ex).__name__}: {str(ex)[:140]}")
            continue
        sql = sqls.get(name)
        if sql is None:
            continue
        try:
            orows = len(con.execute(sql).fetchall())
        except Exception as ex:  # noqa: BLE001
            failures.append(f"{name}: oracle raised {type(ex).__name__}: {str(ex)[:140]}")
            continue
        if srows != orows:
            failures.append(f"{name}: spark {srows} rows vs oracle {orows}")
    assert not failures, "\n".join(failures)
