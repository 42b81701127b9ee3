"""Plan inspection & assertion helpers (SURVEY §4).

The engine's scale guarantees are plan shapes, not hopes — these helpers
read the same .explain artifacts a human would and are used both by
tests/test_plans.py and interactively when tuning.
"""

from pumle_spark.plans.inspect import (
    assert_broadcast_join,
    assert_no_exchange,
    assert_pushed_filters,
    codegen_summary,
    physical_plan,
    pushed_filters,
    read_schema,
)

__all__ = [
    "physical_plan",
    "pushed_filters",
    "read_schema",
    "codegen_summary",
    "assert_pushed_filters",
    "assert_broadcast_join",
    "assert_no_exchange",
]
