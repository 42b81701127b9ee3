"""Full-registry timing probe at an arbitrary scale dir (PERF-only).

Unlike bench.py (driver-facing, fixed headline, 1900-byte line budget),
this records EVERY registered query's wall time as a plain JSON file, and
treats a budget-guard refusal (RuntimeError from the all-pairs baselines)
as a first-class outcome — at sf1-equivalent scale "fails fast with the
documented message" IS the correct behavior being measured.

Usage:
    python tools/bench_probe.py /root/repo/.bench/sf1 /tmp/probe_sf1.json [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from pumle_spark import workload
    from pumle_spark.session import get_spark
    from pumle_spark.tables import TABLE_NAMES, table

    spark = get_spark(app_name="bench_probe")
    spark.sparkContext.setLogLevel("ERROR")

    qs = workload.queries()
    for t in TABLE_NAMES:
        table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    refused: dict[str, str] = {}
    errors: dict[str, str] = {}
    for name, fn in qs.items():
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except RuntimeError as e:
                if "refused" in str(e):
                    refused[name] = str(e).split(".")[0]
                else:
                    errors[name] = repr(e)[:200]
                break
            except Exception as e:  # noqa: BLE001 — probe must finish the sweep
                errors[name] = repr(e)[:200]
                break
            dt = round(time.perf_counter() - t0, 2)
            best = dt if best is None or dt < best else best
        if best is not None:
            timings[name] = best
        print(f"{name}: {timings.get(name, refused.get(name, errors.get(name)))}",
              flush=True)

    doc = {
        "sf_dir": sf_dir,
        "reps": reps,
        "total_sec": round(sum(timings.values()), 2),
        "n_timed": len(timings),
        "refused": refused,
        "errors": errors,
        "queries": dict(sorted(timings.items(), key=lambda kv: -kv[1])),
    }
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(f"== {len(timings)} timed, {len(refused)} refused, "
          f"{len(errors)} errors -> {out_path}")
    spark.stop()
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
