"""S7/S8: reference SQLite catalog migration scan.

The reference keeps its simulation catalog in SQLite (db.py:15-23) and
fetches fluid params by hash with ast.literal_eval over a stringified dict
(db.py:180-209, stored via str(dict) at db.py:214). The engine's native
catalog is Parquet (catalog.py); this module reads a reference-owned SQLite
file ONCE for migration — stdlib sqlite3 on the driver (catalog tables are
dim-sized), params parsed into real typed columns, killing the
literal_eval-on-read pattern for good.
"""

from __future__ import annotations

import ast
import sqlite3

from pyspark.sql import DataFrame, SparkSession

from pumle_spark.catalog import CATALOG_SCHEMA


def read_sqlite_catalog(spark: SparkSession, path: str) -> DataFrame:
    """SELECT sim_hash, sim_id, fluid_params, status, created_at — the
    show_database query (reference main.py:129, fixed: its db.connect()
    call targets a method that doesn't exist, main.py:131 vs db.py:87)."""
    con = sqlite3.connect(path)
    try:
        rows = con.execute(
            "SELECT sim_hash, sim_id, fluid_params, status, created_at FROM simulations"
        ).fetchall()
    finally:
        con.close()
    import datetime

    def parse_ts(v):
        if v is None or isinstance(v, datetime.datetime):
            return v
        return datetime.datetime.fromisoformat(str(v))

    data = [(h, i, p, s, parse_ts(c)) for h, i, p, s, c in rows]
    return spark.createDataFrame(data, CATALOG_SCHEMA)


def fluid_params_columns(catalog: DataFrame) -> DataFrame:
    """S8 point-lookup fixed: parse the stringified dict into real DOUBLE
    columns once (driver-side literal_eval — catalog is dim-sized), after
    which every lookup is a broadcast join on typed columns (J3), not a
    string parse per access."""
    rows = catalog.select("sim_hash", "fluid_params").collect()
    keys: list[str] = []
    parsed: dict[str, dict] = {}
    for r in rows:
        d = ast.literal_eval(r.fluid_params) if r.fluid_params else {}
        parsed[r.sim_hash] = d
        for k in d:
            if k not in keys:
                keys.append(k)
    spark = catalog.sparkSession
    out_rows = [
        tuple([h] + [float(parsed[h].get(k)) if parsed[h].get(k) is not None else None for k in keys])
        for h in parsed
    ]
    schema = "sim_hash string, " + ", ".join(f"`{k}` double" for k in keys)
    return spark.createDataFrame(out_rows, schema)
