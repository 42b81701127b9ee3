"""Compute the next round's driver window from the checked-in record.

The driver hash-verifies only ``queries()[:50]`` per round, so each round
freezes an explicit window (`workload/__init__.py`). The set algebra is
mechanical; this tool prints it so the freeze is a paste, not a
recomputation.

Two regimes, switched automatically by the size of the never-verified
backlog:

DRAIN (backlog > 0, rounds 1–7): extend coverage — never-verified names
only, queue (new surface) first, then oldest backlog names by
registration order, up to 50.

ROTATE (backlog == 0, round 8 onward): every name has been driver-green
at least once, but only once, ever — a regression introduced after a
name's round would never re-enter the driver record. The window becomes
the 50 OLDEST-VERIFIED names: never-verified queue names first (new
surface), then names ordered by (last round seen green ascending,
registration order). Each name re-verifies roughly every
ceil(registry/50) rounds, so driver verification stays live.

Usage: python tools/next_window.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _is_green(res: object) -> bool:
    return (
        isinstance(res, dict)
        and bool(res.get("rows_match"))
        and bool(res.get("schema_match"))
        and bool(res.get("hash_match", True))
        and not res.get("err")
    )


def last_green_round() -> dict[str, int]:
    """name -> highest round number whose CORRECTNESS record has it green."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            rec = json.load(fh)
        for name, res in rec.items():
            if _is_green(res):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def build_window(
    names: list[str], latest: dict[str, int], queue: list[str], size: int = 50
) -> tuple[str, list[str], list[str]]:
    """Pure regime logic, unit-tested in tests/test_registry.py:
    (regime, window, leftovers) from the registry order, the per-name
    last-green-round map, and the live queue declaration order.

    Never-verified names (live queue first, then backlog in registration
    order) always lead; if they don't fill the window, the remaining
    slots rotate the OLDEST-verified names (ascending last-green round,
    registration order as the tiebreak) — a short round-8 queue must not
    leave 40+ slots unused just because the regime label says DRAIN."""
    reg_pos = {n: i for i, n in enumerate(names)}
    green = set(latest)
    backlog = [n for n in names if n not in green]
    live_queue = [q for q in queue if q not in green]

    never = list(
        dict.fromkeys([*live_queue, *(n for n in backlog if n not in queue)])
    )
    if len(never) >= size:
        window = never[:size]
        return "DRAIN", window, [n for n in backlog if n not in window]
    # fill the rest by rotating oldest-verified names: ascending last-green
    # round, ties broken by current registration order — deterministic.
    rest = sorted(
        (n for n in names if n in green),
        key=lambda n: (latest[n], reg_pos[n]),
    )
    window = [*never, *rest][:size]
    regime = "DRAIN+ROTATE-FILL" if never else "ROTATE (oldest-verified)"
    return regime, window, []


def main() -> int:
    from pumle_spark import workload

    names = list(workload.queries())  # frozen window first, then registration order
    latest = last_green_round()
    green = set(latest)
    queue = [
        q
        for attr in dir(workload)
        if attr.startswith("_DRIVER_QUEUE_")
        for q in getattr(workload, attr)
    ]
    backlog = [n for n in names if n not in green]
    stale_queue = [q for q in queue if q in green]

    print(f"registry={len(names)} green_union={len(green)} backlog={len(backlog)}")
    if stale_queue:
        print(f"queue names already green (drop from queue): {stale_queue}")

    regime, window, leftovers = build_window(names, latest, queue)

    print(f"regime={regime}")
    print(f"\n_DRIVER_WINDOW (next round, {len(window)} names):")
    for i in range(0, len(window), 3):
        row = ", ".join(f'"{n}"' for n in window[i : i + 3])
        print(f"    {row},")
    if backlog:
        print(f"\nleftover backlog for the round after ({len(leftovers)}):")
        for n in leftovers:
            print(f"    {n}")
    else:
        ages = sorted(latest.get(n, 0) for n in window if n in latest)
        if ages:
            print(
                f"\nrotation: window re-verifies names last seen green in "
                f"rounds {ages[0]}–{ages[-1]}; full registry recycles every "
                f"~{-(-len(names) // 50)} rounds"
            )
    if len(window) < 50:
        print(f"\nNOTE: window has only {len(window)} slots filled.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
