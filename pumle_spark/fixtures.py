"""Deterministic bronze-fixture generator (shapes mirror the reference's
simulator output: co2lab3DPUMLE.m:517-559 JSON consumed by
sim_results_parser.py). Lives in the package — not just tests — because the
flagship pipeline query and the CLI demo need reproducible bronze inputs in
environments that ship no simulation data.
"""

from __future__ import annotations

import json
import random
from pathlib import Path

import numpy as np

CASE = "GCS01"
DIMS = (4, 3, 2)  # i, j, k → 24 cells

DEFAULT_FIXTURE_ROOT = Path("/tmp/pumle_spark_fixture_v1")


def make_bronze(root: Path, n_sims: int = 2, n_t: int = 3, seed: int = 7):
    """Write g_{case}.json, grdecl_{case}_{h}.json, states_{case}_{h}.json.

    Returns dict: sim_hash → {"actnum": np.array, "states": [...]}.
    Sim #0 gets an oversized state array (len = n_active + 2) to exercise
    the bounds filter (sim_results_parser.py:291-300, arrays.py:106-110).
    """
    rng = random.Random(seed)
    root.mkdir(parents=True, exist_ok=True)
    ncells = DIMS[0] * DIMS[1] * DIMS[2]
    (root / f"g_{CASE}.json").write_text(json.dumps(list(DIMS)))

    sims = {}
    for s in range(n_sims):
        h = f"{rng.randrange(16**8):08x}"
        act = np.array([1 if rng.random() < 0.6 else 0 for _ in range(ncells)])
        if act.sum() == 0:
            act[0] = 1
        n_active = int(act.sum())
        (root / f"grdecl_{CASE}_{h}.json").write_text(json.dumps(act.tolist()))

        extra = 2 if s == 0 else 0
        states = []
        for t in range(n_t):
            n = n_active + extra
            pressure = [round(1.0e7 + 1e4 * t + 37.0 * i_, 3) for i_ in range(n)]
            sw = [round(min(1.0, 0.9 - 0.05 * t + 0.001 * i_), 6) for i_ in range(n)]
            states.append(
                {
                    "pressure": pressure,
                    "s": [[w, round(1 - w, 6)] for w in sw],
                    "flux": [0.0] * n,  # produced but never consumed
                }
            )
        (root / f"states_{CASE}_{h}.json").write_text(json.dumps(states))
        sims[h] = {"actnum": act, "states": states}
    return sims


def ensure_demo_bronze(
    root: Path = DEFAULT_FIXTURE_ROOT, n_sims: int = 4, n_t: int = 5, seed: int = 1234
) -> Path:
    """Idempotently materialize the seeded demo bronze set used by the
    flagship pipeline query; returns the fixture root."""
    if not (root / f"g_{CASE}.json").exists():
        make_bronze(root, n_sims=n_sims, n_t=n_t, seed=seed)
    return root
