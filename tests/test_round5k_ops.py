"""Round-5 batch-k operator tests: embedding MMD via second moments,
calendar gap audit. Pure-python/numpy re-derivations."""

from __future__ import annotations

from collections import defaultdict
from datetime import date, datetime
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

SF = "/root/testdata/sf0.001"


def test_mmd_matches_numpy_second_moments(spark):
    """MMD² recomputed from numpy second-moment matrices under the same
    quantization contract; also the U-statistic sanity: MMD² >= 0 and
    symmetric by construction."""
    from pumle_spark.tables import table
    from pumle_spark.workload.drift import _MMD_DIM, drift_embedding_mmd

    groups = defaultdict(list)
    for r in table(spark, SF, "embeddings").collect():
        groups[r.label].append(np.array(r.embedding, dtype=np.float64))

    def q9(x: float) -> Decimal:
        # CAST(double AS DECIMAL(28,9)) rounds half-up on both engines
        return Decimal(repr(x)).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP)

    # second-moment sums quantized per term, exactly as the query defines
    sums = {}
    for lab, vecs in groups.items():
        s = [[Decimal(0)] * _MMD_DIM for _ in range(_MMD_DIM)]
        for v in vecs:
            for i in range(_MMD_DIM):
                for j in range(_MMD_DIM):
                    s[i][j] += q9(float(v[i] * v[j]))
        sums[lab] = s

    got = {(r.label_a, r.label_b): r for r in drift_embedding_mmd(spark, SF).collect()}
    labs = sorted(groups)
    assert set(got) == {(a, b) for i, a in enumerate(labs) for b in labs[i + 1 :]}

    for (la, lb), r in got.items():
        na, nb = len(groups[la]), len(groups[lb])
        assert (r.n_a, r.n_b) == (na, nb)
        tot = Decimal(0)
        for i in range(_MMD_DIM):
            for j in range(_MMD_DIM):
                md = round(float(sums[la][i][j]) / na - float(sums[lb][i][j]) / nb, 9)
                tot += Decimal(repr(md * md)).quantize(
                    Decimal("1e-18"), rounding=ROUND_HALF_UP
                )
        # engine-exactness is the oracle's job; here we verify the MATH
        # (second-moment derivation) to quantization precision
        assert abs(r.mmd2 - float(tot)) <= 2e-9
        assert r.mmd2 >= 0.0


def test_orderdate_gaps_match_sorted_scan(spark):
    """Zero-order day runs recomputed from the sorted distinct day list."""
    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import _GAP_TOP, audit_orderdate_gaps

    days = sorted(
        {
            ((d.date() if isinstance(d, datetime) else d) - date(1970, 1, 1)).days
            for d in (
                r.o_orderdate
                for r in table(spark, SF, "orders").select("o_orderdate").collect()
            )
        }
    )
    gaps = [
        (a + 1, b - a - 1)
        for a, b in zip(days, days[1:])
        if b - a > 1
    ]
    expect = sorted(gaps, key=lambda g: (-g[1], g[0]))[:_GAP_TOP]

    rows = audit_orderdate_gaps(spark, SF).collect()
    got = [((r.gap_start_date - date(1970, 1, 1)).days, r.gap_days) for r in rows]
    assert got == expect
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    assert rows, "sf0.001 must have zero-order days"
    # every reported run really has no orders inside it
    present = set(days)
    for start, ln in got:
        assert all(start + d not in present for d in range(ln))
        assert start - 1 in present and start + ln in present
