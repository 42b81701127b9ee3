"""Round-4 wave-3 operator tests (batch 7): tolerance as-of join, Gini
concentration, lexical diversity."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# events_asof_tolerance
# --------------------------------------------------------------------------


def test_asof_tolerance_classes_on_planted_timeline(spark, tmp_path):
    """view 30 min before purchase → fresh; view 2 h before → stale;
    no view at all → stale."""
    import pandas as pd

    rows = [
        (1, "2024-01-01 09:30:00", 1, "view", 0.0),
        (2, "2024-01-01 10:00:00", 1, "purchase", 5.0),  # fresh (30 min)
        (3, "2024-01-01 08:00:00", 2, "view", 0.0),
        (4, "2024-01-01 10:00:00", 2, "purchase", 5.0),  # stale (2 h)
        (5, "2024-01-01 10:00:00", 3, "purchase", 5.0),  # no view at all
    ]
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]),
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [r[4] for r in rows],
            "props": ["{}"] * len(rows),
        }
    )
    d = tmp_path / "fix"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")

    from pumle_spark.workload.events import events_asof_tolerance

    by = {r.match_class: r for r in events_asof_tolerance(spark, str(d)).collect()}
    assert by["fresh"].n_purchases == 1
    assert by["fresh"].total_gap_us == 30 * 60 * 1_000_000
    assert by["stale_or_none"].n_purchases == 2
    assert by["stale_or_none"].total_gap_us == 0


def test_asof_tolerance_fresh_gaps_bounded(spark):
    from pumle_spark.workload.events import _ASOF_TOL_US, events_asof_tolerance

    by = {r.match_class: r for r in events_asof_tolerance(spark, SF).collect()}
    if "fresh" in by and by["fresh"].max_gap_us is not None:
        assert 0 <= by["fresh"].max_gap_us <= _ASOF_TOL_US


# --------------------------------------------------------------------------
# orders_gini_concentration
# --------------------------------------------------------------------------


def test_gini_matches_python_replica_and_bounds(spark):
    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import orders_gini_concentration

    got = {r.nation: r for r in orders_gini_concentration(spark, SF).collect()}
    assert got

    o = table(spark, SF, "orders")
    c = table(spark, SF, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, SF, "nation").select("n_nationkey", "n_name")
    cust = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"))
        .collect()
    )
    per = {}
    for r in cust:
        per.setdefault(r.n_name, []).append((r.cents, r.o_custkey))
    for nation, xs in per.items():
        xs.sort()  # (cents, custkey) — matches the query's total order
        nn = len(xs)
        tot = sum(x for x, _ in xs)
        wsum = sum((i + 1) * x for i, (x, _) in enumerate(xs))
        want = round(2.0 * wsum / (nn * tot) - (nn + 1.0) / nn, 6)
        g = got[nation]
        assert g.n_customers == nn and g.total_cents == tot
        assert abs(g.gini - want) < 1e-9
        assert 0.0 <= g.gini < 1.0


# --------------------------------------------------------------------------
# text_lexical_diversity
# --------------------------------------------------------------------------


def test_lexical_diversity_invariants(spark):
    from pumle_spark.workload.text import text_lexical_diversity

    rows = text_lexical_diversity(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_types <= r.n_tokens
        assert 0 <= r.n_hapax <= r.n_types
        assert 0.0 < r.type_token_ratio <= 1.0
        assert 0.0 <= r.hapax_share <= 1.0
        assert 0.0 < r.herdan_c <= 1.0 + 1e-9


def test_lexical_diversity_exact_on_fixture(spark, tmp_path):
    """'a a b c' → 4 tokens, 3 types, 2 hapax."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [0],
            "text": ["a a b c"],
            "lang": ["en"],
            "source": ["s"],
            "n_chars": [7],
        }
    )
    d = tmp_path / "fix"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")

    from pumle_spark.workload.text import text_lexical_diversity

    r = text_lexical_diversity(spark, str(d)).collect()[0]
    assert (r.n_tokens, r.n_types, r.n_hapax) == (4, 3, 2)
    assert r.type_token_ratio == 0.75
    assert r.hapax_share == round(2 / 3, 6)
