"""Local replica of the driver's correctness gate.

Runs every query in __spark_entry__.queries() on Spark AND its oracle_sql()
on DuckDB over the same parquet tables, then compares:
  - row count
  - schema (column names; dtypes printed for eyeballing)
  - order-insensitive canonicalized value hash

Usage:  python tools/oracle_check.py [--sf /root/testdata/sf0.01] [--only name[,name]]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.12g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple[str, ...]]]:
    order = sorted(range(len(cols)), key=lambda idx: cols[idx])
    sorted_cols = [cols[idx] for idx in order]
    out = sorted(tuple(canon_cell(r[idx]) for idx in order) for r in rows)
    return sorted_cols, out


def value_hash(rows: list[tuple[str, ...]]) -> str:
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument(
        "--vanilla",
        action="store_true",
        help="use a bare SparkSession like the round driver does (catches "
        "reliance on pumle_spark.session-only configuration)",
    )
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    if args.vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("oracle_check_vanilla")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
    else:
        from pumle_spark.session import get_spark

        spark = get_spark(app_name="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows ({time.time() - t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            n_fail += 1
            continue

        sc, sr = canon_rows(scols, srows)
        dc, dr = canon_rows(dcols, drows)
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sc != dc:
            problems.append(f"columns spark={sc} duckdb={dc}")
        if not problems and value_hash(sr) != value_hash(dr):
            problems.append("value-hash mismatch")
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:5]
            for a, b in diffs:
                problems.append(f"  spark={a}\n  duck ={b}")
        if problems:
            print(f"FAIL {name} ({time.time() - t0:.1f}s): " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print("   " + p)
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows ({time.time() - t0:.1f}s)")
            n_pass += 1

    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
