"""Empty-relation hardening sweep: EVERY registered query must run without
error on schema-correct zero-row tables, and its row count must match the
DuckDB oracle on the same empty inputs.

Zero-row inputs exercise the boundary paths the data gates never touch:
scalar aggregates emitting all-NULL rows, sequence()/slice() on empty
arrays, grand-total grouping sets, watermarks derived from NULL maxima,
division guards. The three divergences this sweep originally found (ANSI
grand-total rows from ROLLUP/GROUPING SETS on empty input; a scalar-agg
NULL row in the HLL set-ops pipeline) are aligned in the queries/oracles
with inline comments.
"""

from __future__ import annotations

import pytest

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    from pumle_spark.tables import table

    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        table(spark, "/root/testdata/sf0.001", t).limit(0).write.parquet(f"{d}/{t}.parquet")
    return str(d)


def test_every_query_matches_oracle_on_empty_tables(spark, empty_sf):
    import duckdb

    from pumle_spark import workload

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{empty_sf}/{t}.parquet/*.parquet'")

    qs, sqls = workload.queries(), workload.oracle_sql()
    failures = []
    for name, fn in qs.items():
        try:
            srows = fn(spark, empty_sf).count()
        except Exception as ex:  # noqa: BLE001 — collecting the full report
            failures.append(f"{name}: spark raised {type(ex).__name__}: {str(ex)[:120]}")
            continue
        sql = sqls.get(name)
        if sql is None:
            continue
        try:
            orows = len(con.execute(sql).fetchall())
        except Exception as ex:  # noqa: BLE001
            failures.append(f"{name}: oracle raised {type(ex).__name__}: {str(ex)[:120]}")
            continue
        if srows != orows:
            failures.append(f"{name}: spark {srows} rows vs oracle {orows}")
    assert not failures, "\n".join(failures)


@pytest.fixture(scope="module")
def singleton_sf(spark, tmp_path_factory):
    from pumle_spark.tables import table

    d = tmp_path_factory.mktemp("sf_one")
    for t in TABLES:
        table(spark, "/root/testdata/sf0.001", t).limit(1).write.parquet(f"{d}/{t}.parquet")
    return str(d)


def test_every_query_matches_oracle_on_singleton_tables(spark, singleton_sf):
    """One row per table: the degenerate-statistics boundary (zero
    variances, single-node graphs, one-element windows). Found and now
    guards the sqrt-of-negative-variance crash in the correlation
    profile's oracle."""
    import duckdb

    from pumle_spark import workload

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{singleton_sf}/{t}.parquet/*.parquet'")

    qs, sqls = workload.queries(), workload.oracle_sql()
    failures = []
    for name, fn in qs.items():
        try:
            srows = fn(spark, singleton_sf).count()
        except Exception as ex:  # noqa: BLE001
            failures.append(f"{name}: spark raised {type(ex).__name__}: {str(ex)[:120]}")
            continue
        sql = sqls.get(name)
        if sql is None:
            continue
        try:
            orows = len(con.execute(sql).fetchall())
        except Exception as ex:  # noqa: BLE001
            failures.append(f"{name}: oracle raised {type(ex).__name__}: {str(ex)[:120]}")
            continue
        if srows != orows:
            failures.append(f"{name}: spark {srows} rows vs oracle {orows}")
    assert not failures, "\n".join(failures)
