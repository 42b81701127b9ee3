"""Build a bench-only sf1-equivalent dataset by replicating sf0.1 tenfold.

The driver ships sf{0.001,0.01,0.1}; the 100 TB question needs at least one
order-of-magnitude step beyond the nightly bench scale to catch
broadcast-threshold flips and skew surprises early (round-2 verdict item 5).
This replicates every FACT table 10x with disjoint key ranges (dims `region`
and `nation` keep their TPC-H-fixed size), giving sf1-shaped join
cardinalities. Replica documents get a ` rep{r}` suffix so the text corpus
grows as near-dups (realistic) instead of exact dups; embeddings replicate
as-is — 10x bucket sizes mean 100x candidate pairs per bucket, which is
exactly the Σc² growth a real 10x corpus shows.

Replication runs through Spark (not DuckDB) so parquet logical types —
notably TIMESTAMP vs TIMESTAMP_NTZ — round-trip exactly as the driver wrote
them.

PERF-ONLY data (plans + timing). Correctness stays gated on the driver's
sf0.01 + DuckDB. Output: /root/repo/.bench/sf1 (gitignored).

Usage: python tools/make_sf1.py [reps]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench", "sf1")

# table -> {column: base_table_for_offset}; offset = rep * (max(base key) + 1)
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "_events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

PK = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
    "_events_user": "user_id",
}


def main(reps: int = 10) -> None:
    from pumle_spark.session import get_spark

    spark = get_spark(app_name="make_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)

    strides: dict[str, int] = {}
    for base, pk in PK.items():
        src_tbl = "events" if base == "_events_user" else base
        strides[base] = (
            spark.read.parquet(f"{SRC}/{src_tbl}.parquet").agg(F.max(pk) + 1).collect()[0][0]
        )

    for dim in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{dim}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{dim}.parquet"
        )
        print(f"{dim}: copied")

    for tbl, keymap in KEYED.items():
        src = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        out = None
        for rep in range(reps):
            cols = []
            for c in src.columns:
                if c in keymap:
                    cols.append((F.col(c) + rep * strides[keymap[c]]).alias(c))
                elif tbl == "documents" and c == "text" and rep > 0:
                    cols.append(F.concat(F.col("text"), F.lit(f" rep{rep}")).alias("text"))
                elif tbl == "documents" and c == "n_chars" and rep > 0:
                    cols.append((F.col("n_chars") + len(f" rep{rep}")).alias("n_chars"))
                else:
                    cols.append(F.col(c))
            part = src.select(*cols)
            out = part if out is None else out.unionByName(part)
        out.write.mode("overwrite").parquet(f"{DST}/{tbl}.parquet")
        n = spark.read.parquet(f"{DST}/{tbl}.parquet").count()
        print(f"{tbl}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
