"""Round-4 wave-3 operator tests (batch 5): seasonal-naive backtest,
order/line reconciliation, ratio-to-parent shares, CMS join-size."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_seasonal_backtest_scores_only_lag_covered_days(spark):
    """Every scored day must have a day-7 sibling; month day-counts can
    therefore never exceed the calendar, and MAE·n_days == total_abs_err
    (one division, exact ingredients)."""
    from pumle_spark.workload.analytics import orders_seasonal_naive_backtest

    rows = orders_seasonal_naive_backtest(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_days <= 31
        # mae is rounded to 6 decimals → product drifts by ≤ 5e-7 · n_days
        assert abs(r.mae * r.n_days - r.total_abs_err) <= 1e-6 * r.n_days
        assert r.mape_pct >= 0


def test_reconciliation_accounts_every_order(spark):
    """Status classes partition the orders table; generated TPC-H-ish data
    must reconcile (the driver builds totals from its own lines) or at
    least be audited without loss."""
    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import audit_order_line_reconciliation

    rows = audit_order_line_reconciliation(spark, SF).collect()
    n_orders = table(spark, SF, "orders").count()
    assert sum(r.n_orders for r in rows) == n_orders
    by = {r.status: r for r in rows}
    if "reconciled" in by:
        # tolerance respected: a reconciled class cannot carry a drift
        # larger than max lines/order * 1 cent
        assert by["reconciled"].max_drift_cents <= 10


def test_reconciliation_flags_injected_drift(spark, tmp_path):
    """An order whose header is off by a dollar must land in 'mismatch';
    a line-less order in 'no_lines'."""
    import pandas as pd

    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_custkey": [1, 1, 1],
            "o_orderstatus": ["F", "F", "F"],
            "o_totalprice": [110.0, 50.0, 10.0],  # order 2 header drifts by $1
            "o_orderdate": pd.to_datetime(["1995-01-01"] * 3),
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    lines = pd.DataFrame(
        {
            "l_orderkey": [1, 2],
            "l_partkey": [1, 1],
            "l_suppkey": [1, 1],
            "l_linenumber": [1, 1],
            "l_quantity": [1.0, 1.0],
            "l_extendedprice": [110.0, 49.0],
            "l_discount": [0.0, 0.0],
            "l_tax": [0.0, 0.0],
            "l_returnflag": ["N", "N"],
            "l_linestatus": ["O", "O"],
            "l_shipdate": pd.to_datetime(["1995-02-01"] * 2),
        }
    )
    d = tmp_path / "fix"
    d.mkdir()
    orders.to_parquet(d / "orders.parquet", coerce_timestamps="us")
    lines.to_parquet(d / "lineitem.parquet", coerce_timestamps="us")

    from pumle_spark.workload.analytics import audit_order_line_reconciliation

    by = {r.status: r for r in audit_order_line_reconciliation(spark, str(d)).collect()}
    assert by["reconciled"].n_orders == 1
    assert by["mismatch"].n_orders == 1
    assert by["mismatch"].max_drift_cents == 100
    assert by["no_lines"].n_orders == 1


def test_share_of_parent_sums_to_hundred(spark):
    """Within each region the nation shares must sum to 100%, and the
    global shares to 100% overall; rank 1 holds the region's max cents."""
    from pumle_spark.workload.analytics import share_of_parent_revenue

    rows = share_of_parent_revenue(spark, SF).collect()
    assert rows
    regions = {}
    for r in rows:
        regions.setdefault(r.region, []).append(r)
    for rs in regions.values():
        assert abs(sum(x.pct_of_region for x in rs) - 100.0) < 1e-3
        top = [x for x in rs if x.rank_in_region == 1][0]
        assert top.cents == max(x.cents for x in rs)
    assert abs(sum(r.pct_of_total for r in rows) - 100.0) < 1e-3


def test_cms_join_size_never_underestimates(spark):
    """Every per-row estimate — hence the min — upper-bounds the true
    inner product (CMS buckets only merge mass)."""
    from pumle_spark.workload.sketches import sketch_cms_join_size

    rows = sketch_cms_join_size(spark, SF).collect()
    assert len(rows) == 4
    true_size = rows[0].true_size
    assert true_size > 0
    for r in rows:
        assert r.row_estimate >= true_size
        assert r.cms_estimate == min(x.row_estimate for x in rows)
        assert r.overest_pct >= 0
