"""Static type lint over every registered DuckDB oracle.

Single-version local green is not driver green (round 3 shipped two red
rows from HUGEINT widening that fetchall() couldn't see), and this sandbox
has exactly one DuckDB build to test against — so instead of a
multi-version matrix, every oracle's RESULT SCHEMA is pinned to types
whose Python/pandas/Arrow renderings are stable across DuckDB versions and
match what a Spark plan can produce. Runs without Spark: DuckDB plans the
query; nothing executes.
"""

from __future__ import annotations

import re

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Types a Spark DataFrame column can mirror exactly; anything else (HUGEINT
# from un-cast SUM, TIME, INTERVAL, UUID, nested maps...) has engine- or
# fetch-path-dependent rendering and must be cast in the oracle SQL.
_SAFE = re.compile(
    r"^(BOOLEAN|TINYINT|SMALLINT|INTEGER|BIGINT|FLOAT|DOUBLE"
    r"|DECIMAL\(\d+,\d+\)|VARCHAR|BLOB|DATE|TIMESTAMP(_NS)?"
    r"|(BOOLEAN|TINYINT|SMALLINT|INTEGER|BIGINT|FLOAT|DOUBLE|VARCHAR)\[\])$"
)


@pytest.fixture(scope="module")
def oracles():
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def test_every_oracle_emits_only_version_stable_types(oracles, con):
    bad: dict[str, list[str]] = {}
    for name, sql in oracles.items():
        rel = con.sql(sql)
        offenders = [
            f"{col}:{typ}"
            for col, typ in zip(rel.columns, (str(t).upper() for t in rel.types))
            if not _SAFE.match(typ)
        ]
        if offenders:
            bad[name] = offenders
    assert not bad, f"oracles with version-fragile result types: {bad}"
