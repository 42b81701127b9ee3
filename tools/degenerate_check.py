"""Degenerate-input sweep: run EVERY registered query against zero-row
tables and require it to complete without an exception.

At 100 TB, empty inputs are not hypothetical: a partition-pruned scan, a
filter that matches nothing, a tenant with no data yet — all hand an
operator an empty relation. A query that divides by a zero corpus total,
indexes element 1 of an empty array, or seeds an iteration from a missing
row crashes the whole job there. This sweep is the mechanical receipt
that none of the registry does.

Budget-guard refusals are NOT special-cased: the guards read counts, and
zero rows is legitimately under every budget, so a refusal on empty input
indicates a broken guard and lands in ``errors`` (exit 1) exactly like any
other exception.

Usage:
    python tools/degenerate_check.py [empty_dir] [out_json]
Defaults: /root/repo/.bench/sf0 (built from the sf0.001 schemas), stdout
summary only.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    empty_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench/sf0"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    if not os.path.isdir(empty_dir):
        # zero-row replicas carrying the exact driver schemas
        import pyarrow.parquet as pq

        os.makedirs(empty_dir, exist_ok=True)
        src = "/root/testdata/sf0.001"
        for t in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
            sch = pq.read_schema(os.path.join(src, f"{t}.parquet"))
            pq.write_table(sch.empty_table(), os.path.join(empty_dir, f"{t}.parquet"))

    from pumle_spark import workload
    from pumle_spark.session import get_spark

    spark = get_spark(app_name="degenerate_check")
    spark.sparkContext.setLogLevel("ERROR")

    rows: dict[str, int] = {}
    errors: dict[str, str] = {}
    for name, fn in workload.queries().items():
        try:
            rows[name] = fn(spark, empty_dir).count()
        except Exception as e:  # noqa: BLE001 — the sweep must finish
            errors[name] = repr(e)[:300]
        print(f"{name}: {rows.get(name, errors.get(name))}", flush=True)

    print(f"== {len(rows)} ok, {len(errors)} errors on empty input ==")
    for name, err in errors.items():
        print(f"ERROR {name}: {err}")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump({"ok": rows, "errors": errors}, fh, indent=1)
    spark.stop()
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
