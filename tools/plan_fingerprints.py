"""Per-query physical-plan fingerprints (r11 VERDICT item 7).

Emits plans/<tag>/plan_fingerprints.json mapping every HEADLINE query (or an
explicit name list) to a sha256 of its CANONICALIZED pre-execution plan text:
expression ids, plan ids, AQE markers, file paths and size statistics are
stripped, so the hash is stable across sessions and data directories and
changes only when the plan SHAPE changes. Round-over-round, a judge can
auto-classify a timing delta as plan-change vs noise by diffing two
fingerprint files.

Usage:
  python tools/plan_fingerprints.py --tag r12            # all HEADLINE
  python tools/plan_fingerprints.py --tag r12 q1_pricing_summary ...
"""

from __future__ import annotations

import argparse
import hashlib
import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_STRIP = [
    (re.compile(r"#\d+L?"), "#_"),                      # expression ids
    (re.compile(r"plan_id=\d+"), "plan_id=_"),
    (re.compile(r"\[id=#?\d+\]"), "[id=_]"),
    (re.compile(r"Statistics\([^)]*\)"), "Statistics(_)"),
    (re.compile(r"Location: .*"), "Location: _"),
    (re.compile(r"file:[^\s,\]]+"), "file:_"),
    (re.compile(r"isFinalPlan=(true|false)"), "isFinalPlan=_"),
    (re.compile(r"cachedrdd-\d+"), "cachedrdd-_"),
    (re.compile(r"RDD\[\d+\]"), "RDD[_]"),              # session-scoped rdd ids
    (re.compile(r"_common_expr_\d+"), "_common_expr__"),  # CSE counter

    (re.compile(r"ExistingRDD\[[^\]]*\]"), "ExistingRDD[_]"),  # checkpoint col ids
    (re.compile(r"Result \[\d+\]"), "Result [_]"),
    (re.compile(r"\(\d+\)"), "(_)"),                    # operator ordinals
]


def canonicalize(plan: str) -> str:
    for pat, rep in _STRIP:
        plan = pat.sub(rep, plan)
    return plan


def fingerprint(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return hashlib.sha256(canonicalize(buf.getvalue()).encode()).hexdigest()[:16]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="r12")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from pumle_spark import workload
    from pumle_spark.session import get_spark

    spark = get_spark(app_name="plan_fingerprints")
    spark.sparkContext.setLogLevel("ERROR")
    qs = workload.queries()
    if args.names:
        names = args.names
    else:
        import bench

        names = [n for n in bench.HEADLINE if n in qs]

    out = {}
    for name in names:
        try:
            out[name] = fingerprint(qs[name](spark, args.sf))
        except Exception as exc:  # a fingerprint file must never half-vanish
            out[name] = f"ERROR:{type(exc).__name__}"
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
        "plan_fingerprints.json",
    )
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {len(out)} fingerprints -> {dest}")
    spark.stop()


if __name__ == "__main__":
    main()
