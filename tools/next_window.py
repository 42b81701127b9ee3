"""Compute the next round's driver window from the checked-in record.

The driver hash-verifies only ``queries()[:50]`` per round, so each round
freezes an explicit window of never-driver-verified names
(`workload/__init__.py`). The set algebra is mechanical; this tool prints
it so the freeze is a paste, not a recomputation:

1. green union = names green in any CORRECTNESS_r0*.json
2. backlog     = registry − green union
3. window      = current `_DRIVER_QUEUE_R0{N+1}` names (new surface first —
                 they have never been seen) + oldest backlog names by
                 registration order, up to 50
4. leftovers   = what round N+2 must drain

Usage: python tools/next_window.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def green_union() -> set[str]:
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r0*.json"))):
        with open(path) as fh:
            rec = json.load(fh)
        for name, res in rec.items():
            if (
                isinstance(res, dict)
                and res.get("rows_match")
                and res.get("schema_match")
                and res.get("hash_match", True)
                and not res.get("err")
            ):
                green.add(name)
    return green


def main() -> int:
    from pumle_spark import workload

    names = list(workload.queries())  # registration order behind the window
    green = green_union()
    queue = [
        q
        for name in dir(workload)
        if name.startswith("_DRIVER_QUEUE_")
        for q in getattr(workload, name)
    ]
    backlog = [n for n in names if n not in green]
    stale_queue = [q for q in queue if q in green]
    window = list(dict.fromkeys([*(q for q in queue if q not in green),
                                 *(n for n in backlog if n not in queue)]))[:50]
    leftovers = [n for n in backlog if n not in window]

    print(f"registry={len(names)} green_union={len(green)} backlog={len(backlog)}")
    if stale_queue:
        print(f"queue names already green (drop from queue): {stale_queue}")
    print(f"\n_DRIVER_WINDOW (next round, {len(window)} names):")
    for i in range(0, len(window), 3):
        row = ", ".join(f'"{n}"' for n in window[i : i + 3])
        print(f"    {row},")
    print(f"\nleftover backlog for the round after ({len(leftovers)}):")
    for n in leftovers:
        print(f"    {n}")
    if len(window) < 50:
        print(f"\nNOTE: window has only {len(window)} slots filled — the "
              "backlog is smaller than one driver round; padding with "
              "already-green names wastes nothing but re-verifies.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
