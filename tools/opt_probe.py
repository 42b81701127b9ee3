"""Per-query optimization probe (guide §1): isolate one or more registered
queries, time them against the noop sink (min-of-N after warmup), dump
.explain("formatted") to plans/<tag>/<name>_<suffix>.txt, and summarize the
physical plan shape (Exchange count, join strategies, Python eval nodes,
window execs) plus per-stage runtime/shuffle metrics from the UI REST API.

Usage:
  python tools/opt_probe.py --tag r11 --suffix before q1_pricing_summary dedup_minhash_lsh
  python tools/opt_probe.py --reps 5 --no-plan sketch_cms_frequency
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
import time
import urllib.request
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_summary(plan: str) -> dict:
    def c(pat: str) -> int:
        return len(re.findall(pat, plan))

    return {
        "exchange": c(r"\bExchange hashpartitioning|\bExchange rangepartitioning|\bExchange RoundRobinPartitioning|\bExchange SinglePartition"),
        "broadcast_exchange": c(r"\bBroadcastExchange"),
        "bhj": c(r"\bBroadcastHashJoin"),
        "smj": c(r"\bSortMergeJoin"),
        "shj": c(r"\bShuffledHashJoin"),
        "bnlj": c(r"\bBroadcastNestedLoopJoin"),
        "cartesian": c(r"\bCartesianProduct"),
        "window": c(r"\bWindow\b|\bWindowExec"),
        "sort": c(r"\bSort \["),
        "hashagg": c(r"\bHashAggregate"),
        "objhashagg": c(r"\bObjectHashAggregate"),
        "sortagg": c(r"\bSortAggregate"),
        "python": c(r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas"),
        "generate": c(r"\bGenerate\b"),
        "scans": c(r"Scan parquet"),
        "codegen_spans": c(r"WholeStageCodegen"),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="r11")
    ap.add_argument("--suffix", default=None, help="write plans/<tag>/<name>_<suffix>.txt")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--stages", action="store_true", help="dump per-stage REST metrics")
    args = ap.parse_args()

    from pumle_spark import workload
    from pumle_spark.session import get_spark

    spark = get_spark(app_name="opt_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = workload.queries()

    # warm the scans once so codegen/JIT noise doesn't pollute rep 1
    from pumle_spark.tables import TABLE_NAMES, table

    for t in TABLE_NAMES:
        table(spark, args.sf, t).write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in args.names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"probe:{name}:warmup")
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        best = None
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"probe:{name}:rep{i}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        buf = io.StringIO()
        with redirect_stdout(buf):
            fn(spark, args.sf).explain("formatted")
        plan = buf.getvalue()
        if args.suffix:
            d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             "plans", args.tag)
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        out[name] = {"sec": round(best, 3), **plan_summary(plan)}
        print(json.dumps({"name": name, **out[name]}), flush=True)

    if args.stages:
        ui = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=COMPLETE") as r:
            stages = json.loads(r.read())
        rows = [
            (s["stageId"], s["executorRunTime"], s["shuffleReadBytes"],
             s["shuffleWriteBytes"], s.get("description") or s["name"])
            for s in stages
        ]
        rows.sort(key=lambda x: -x[1])
        for sid, rt, srb, swb, desc in rows[:40]:
            print(f"stage {sid:4d} run={rt/1000.0:7.2f}s shR={srb/1e6:8.2f}MB "
                  f"shW={swb/1e6:8.2f}MB  {desc[:90]}")

    print(json.dumps({"summary": {k: v["sec"] for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
