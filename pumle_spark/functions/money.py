"""Exact money accumulation in BIGINT integer units (the Q7 cents idiom,
generalized to any power-of-ten scale).

Why not SUM(double): a double sum is partial-sum-order dependent, so
Spark's 32-partition aggregate and DuckDB's sequential one drift a ulp
apart and a cents-rounding boundary can flip (the round-10 sf1 probe
caught exactly that on q7_nation_pair_volume). Why not SUM(DECIMAL(18,6)):
exact, but the accumulator is a boxed BigDecimal outside the compact-long
fast path — the r10 decimal sweep cost q1_pricing_summary 0.36 -> 1.51 s
at sf0.1. This module keeps the exactness and the codegen-friendly long.

Contract: pick the smallest power-of-ten ``scale`` at which the per-row
expression is VALUE-EXACT —

- raw 2-dp money column (l_extendedprice, l_discount, l_tax, events.value,
  acctbals, p_retailprice): scale=100 (cents);
- product of two 2-dp values (price*(1-disc), price*disc) and the 4-dp
  o_totalprice: scale=10_000;
- product of three 2-dp values (price*(1-disc)*(1+tax)): scale=1_000_000.

``floor(x*scale + 0.5)`` recovers the exact integer numerator of the
per-row rational value from its double approximation whenever
|x|*scale < ~2^52 (the accumulated IEEE error of the product chain is
<< 0.5 ulp of the integer grid), so the BIGINT sum is the EXACT total:
order-independent, map-side combinable, and bit-identical to the previous
ROUND(SUM(DECIMAL(18,6)), 2) outputs at these scales.

Cross-engine parity is by construction even outside the exactness range:
both engines evaluate the same IEEE ops (mul, add, floor, bigint->double
conversion) on the same parquet doubles, so the Spark plan and the DuckDB
oracle agree bit-for-bit regardless of magnitude or sign — parity never
depends on the value being "nice", only accuracy does.

Range: a BIGINT unit sum holds |total| <= 9.2e18/scale money units
(9.2e16 at cents, 9.2e12 at scale 1e6) — beyond any grouped aggregate at
100 TB. A whole-corpus ungrouped sum at extreme SF that approached the
bound would move to a two-long (hi/lo) accumulator or DECIMAL(38,0); no
registered query is within 3 orders of magnitude of it at sf1.

The final cents re-quantization stays in DOUBLE (floor(u/k + 0.5), not
integer div) deliberately: it is sign-safe (integer div truncates toward
zero on Spark but floors on DuckDB for negatives) and stays exact until
the unit sum exceeds 2^53.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

CENTS = 100
DP4 = 10_000
DP6 = 1_000_000


def units(x: Column, scale: int) -> Column:
    """Per-row exact integer units: floor(x*scale + 0.5) as BIGINT."""
    return F.floor(x * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")


def sum_units(x: Column, scale: int) -> Column:
    """Exact BIGINT total of per-row units (order-independent)."""
    return F.sum(units(x, scale))


def money2(total_units: Column, scale: int) -> Column:
    """Unit total -> money DOUBLE at 2 decimals, half-up at the cent.

    At scale=100 the total IS cents, so no re-rounding happens (and none
    may: re-rounding an exact value risks the .5-boundary divergence).
    """
    if scale == CENTS:
        return total_units / F.lit(100.0)
    return F.floor(total_units / F.lit(scale / 100.0) + F.lit(0.5)) / F.lit(100.0)


def sum_money2(x: Column, scale: int) -> Column:
    """SUM(x) reported at 2 decimals: the full idiom in one call."""
    return money2(sum_units(x, scale), scale)


def total_double(x: Column, scale: int) -> Column:
    """Exact SUM(x) as an unrounded DOUBLE (for means/ratios quantized
    downstream, e.g. relational._avg4)."""
    return sum_units(x, scale) / F.lit(float(scale))


# -- DuckDB oracle mirrors (string builders; keep the expression tree
#    IDENTICAL to the Column builders above so IEEE evaluation matches).
#    Float constants that DIVIDE an integer are written CAST(x AS DOUBLE):
#    Spark SQL parses a bare `100.0` as DECIMAL and plans BIGINT/DECIMAL as
#    a decimal division (the r10 sweep broke tests/test_workload_sql.py's
#    run-the-oracle-through-Spark gate exactly this way); DuckDB divides in
#    DOUBLE either way, so the CAST is a no-op there. --


def _dbl(x: float) -> str:
    return f"CAST({x!r} AS DOUBLE)"


def sql_units(expr: str, scale: int) -> str:
    # (double * decimal-literal + decimal-literal) stays DOUBLE in both
    # dialects — only divisions need the explicit CAST.
    return f"CAST(FLOOR(({expr}) * {float(scale)!r} + 0.5) AS BIGINT)"


def sql_sum_units(expr: str, scale: int) -> str:
    # DuckDB SUM(BIGINT) returns HUGEINT -> pin back to BIGINT like Spark.
    return f"CAST(SUM({sql_units(expr, scale)}) AS BIGINT)"


def sql_money2(expr: str, scale: int) -> str:
    su = sql_sum_units(expr, scale)
    if scale == CENTS:
        return f"{su} / {_dbl(100.0)}"
    return f"FLOOR({su} / {_dbl(scale / 100.0)} + 0.5) / {_dbl(100.0)}"


def sql_total_double(expr: str, scale: int) -> str:
    return f"{sql_sum_units(expr, scale)} / {_dbl(float(scale))}"
