"""Round-4 wave-3 operator tests (batch 9): k-means assignment margin,
Markov stationary distribution."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_assignment_margin_nonnegative_and_covers_corpus(spark):
    """Margins are best-minus-second-best — never negative; member counts
    must sum to the corpus size, and cluster ids match the profile
    query's clustering."""
    from pumle_spark.tables import table
    from pumle_spark.workload.clustering import (
        cluster_assignment_margin,
        cluster_kmeans_profile,
    )

    rows = cluster_assignment_margin(spark, SF).collect()
    assert rows
    n_vec = table(spark, SF, "embeddings").count()
    assert sum(r.n_members for r in rows) == n_vec
    for r in rows:
        assert r.min_margin >= 0.0
        assert r.mean_margin >= r.min_margin - 1e-9

    prof = {(r.cluster_id, r.n_members) for r in cluster_kmeans_profile(spark, SF).collect()}
    assert {(r.cluster_id, r.n_members) for r in rows} == prof


def test_markov_mass_subconservative_and_ranked(spark):
    """Integer DIV truncation only ever loses mass: each iterate's total
    is <= the initial mass, and within K·iters units of it. Ranks are a
    permutation of 1..K."""
    from pumle_spark.workload.events import _MKV_ITERS, _MKV_MASS, events_markov_stationary

    rows = events_markov_stationary(spark, SF).collect()
    k = len(rows)
    assert k >= 2
    total = sum(r.mass_micro for r in rows)
    assert total <= _MKV_MASS
    # per step each from-state loses < row_count_of_that_state units; with
    # the uniform-init remainder that stays microscopically small
    assert total >= _MKV_MASS - (k + 1) * _MKV_ITERS * 10**7
    assert sorted(r.rnk for r in rows) == list(range(1, k + 1))
    masses = [r.mass_micro for r in sorted(rows, key=lambda r: r.rnk)]
    assert masses == sorted(masses, reverse=True)


def test_markov_uniform_chain_stays_uniform(spark, tmp_path):
    """A symmetric 2-state chain (a<->b alternating) has the uniform
    distribution as its fixed point — the iterates must not drift."""
    import pandas as pd

    seq = ["a", "b"] * 20
    pdf = pd.DataFrame(
        {
            "event_id": range(len(seq)),
            "ts": pd.to_datetime(
                [f"2024-01-01 00:{i // 60:02d}:{i % 60:02d}" for i in range(len(seq))]
            ),
            "user_id": [1] * len(seq),
            "event_type": seq,
            "value": [0.0] * len(seq),
            "props": ["{}"] * len(seq),
        }
    )
    d = tmp_path / "fix"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")

    from pumle_spark.workload.events import _MKV_MASS, events_markov_stationary

    rows = {r.state: r.mass_micro for r in events_markov_stationary(spark, str(d)).collect()}
    assert set(rows) == {"a", "b"}
    # a->b 20x, b->a 19x: row-stochastic either way; uniform stays uniform
    # up to DIV truncation (< row_n units per state per step: ≤ ~60 total)
    assert abs(rows["a"] - rows["b"]) <= 100
    assert 0 <= _MKV_MASS - (rows["a"] + rows["b"]) <= 200


def test_yoy_growth_aligns_calendar_months(spark):
    """Each month with a month-12 sibling must carry that sibling's
    revenue as prev_cents; first-year months carry NULL."""
    from pumle_spark.workload.analytics import orders_yoy_growth

    rows = {r.month: r for r in orders_yoy_growth(spark, SF).collect()}
    assert rows
    for month, r in rows.items():
        y, m = int(month[:4]), int(month[5:7])
        prev_key = f"{y - 1:04d}-{m:02d}"
        if prev_key in rows:
            assert r.prev_cents == rows[prev_key].rev_cents
            want = round(100.0 * (r.rev_cents - r.prev_cents) / r.prev_cents, 6)
            assert r.yoy_pct == want
        else:
            assert r.prev_cents is None and r.yoy_pct is None


def test_ship_lag_percentiles_match_python_replica(spark):
    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import lineitem_ship_lag_percentiles

    got = {r.priority: r for r in lineitem_ship_lag_percentiles(spark, SF).collect()}
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, SF, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    rows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_orderpriority").alias("p"),
            F.datediff(
                F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("lag"),
        )
        .collect()
    )
    per = {}
    for r in rows:
        per.setdefault(r.p, []).append(r.lag)
    for p, xs in per.items():
        xs.sort()
        n = len(xs)
        def pct(q):
            # smallest value whose cumulative count reaches q% (disc, lower)
            import math
            return xs[math.ceil(q * n / 100) - 1]
        g = got[p]
        assert g.n_lines == n
        assert (g.p25, g.p50, g.p90) == (pct(25), pct(50), pct(90))
        assert g.p25 <= g.p50 <= g.p90


def test_bot_regularity_flags_planted_metronome(spark, tmp_path):
    """A user ticking exactly every 60 s is bot_like; a user with wildly
    varying gaps is organic; a 3-event user is below the floor and
    excluded entirely."""
    import pandas as pd

    rows = []
    eid = 0
    # bot: 10 events, exact 60 s cadence
    for i in range(10):
        rows.append((eid, f"2024-01-01 00:{i:02d}:00", 1, "view", 0.0))
        eid += 1
    # organic: gaps 1s, 1h, 30s, 3h, 5s, ...
    offsets = [0, 1, 3601, 3631, 14431, 14436, 20000]
    for o in offsets:
        rows.append((eid, pd.Timestamp("2024-01-02") + pd.Timedelta(seconds=o), 2, "view", 0.0))
        eid += 1
    # too few events
    for i in range(3):
        rows.append((eid, f"2024-01-03 00:0{i}:00", 3, "view", 0.0))
        eid += 1
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

    from pumle_spark.workload.events import events_bot_regularity

    by = {r.verdict: r for r in events_bot_regularity(spark, str(d)).collect()}
    assert by["bot_like"].n_users == 1 and by["bot_like"].min_user_id == 1
    assert by["organic"].n_users == 1 and by["organic"].min_user_id == 2
    assert sum(r.n_users for r in by.values()) == 2  # user 3 excluded


def test_retention_week_zero_is_total(spark):
    """weeks_out=0 always retains the full cohort (retention exactly 1.0),
    and retention never exceeds 1."""
    from pumle_spark.workload.events import events_retention_weekly

    rows = events_retention_weekly(spark, SF).collect()
    assert rows
    seen_zero = set()
    for r in rows:
        assert 0.0 < r.retention <= 1.0
        assert r.n_active <= r.n_cohort
        if r.weeks_out == 0:
            assert r.n_active == r.n_cohort and r.retention == 1.0
            seen_zero.add(r.cohort_week)
    assert seen_zero  # every cohort has its week-0 row
    cohorts = {r.cohort_week for r in rows}
    assert cohorts == seen_zero


def test_hhi_bounds_and_monopoly_fixture(spark, tmp_path):
    """HHI lies in (10000/n, 10000]; a single-supplier brand scores
    exactly 10000."""
    import pandas as pd

    part = pd.DataFrame(
        {
            "p_partkey": [1, 2],
            "p_name": ["a", "b"],
            "p_brand": ["MONO", "DUO"],
            "p_type": ["t", "t"],
            "p_size": [1, 1],
            "p_retailprice": [10.0, 10.0],
        }
    )
    lines = pd.DataFrame(
        {
            "l_orderkey": [1, 2, 3],
            "l_partkey": [1, 2, 2],
            "l_suppkey": [7, 8, 9],
            "l_linenumber": [1, 1, 2],
            "l_quantity": [1.0, 1.0, 1.0],
            "l_extendedprice": [100.0, 50.0, 50.0],
            "l_discount": [0.0, 0.0, 0.0],
            "l_tax": [0.0, 0.0, 0.0],
            "l_returnflag": ["N"] * 3,
            "l_linestatus": ["O"] * 3,
            "l_shipdate": pd.to_datetime(["1995-01-01"] * 3),
        }
    )
    d = tmp_path / "fix"
    d.mkdir()
    part.to_parquet(d / "part.parquet")
    lines.to_parquet(d / "lineitem.parquet", coerce_timestamps="us")

    from pumle_spark.workload.analytics import supplier_hhi_by_brand

    by = {r.brand: r for r in supplier_hhi_by_brand(spark, str(d)).collect()}
    assert by["MONO"].hhi == 10000.0
    assert by["DUO"].hhi == 5000.0  # two equal suppliers

    rows = supplier_hhi_by_brand(spark, SF).collect()
    for r in rows:
        assert 10000.0 / r.n_suppliers - 1e-6 <= r.hhi <= 10000.0 + 1e-6


def test_langid_confusion_rows_partition_and_match_pred(spark):
    """Row shares per gold language sum to 1; matrix totals equal the
    corpus; diagonal counts agree with joining text_lang_id to the gold
    labels directly."""
    from pumle_spark.tables import table
    from pumle_spark.workload.text import text_lang_id, text_langid_confusion

    rows = text_langid_confusion(spark, SF).collect()
    assert rows
    n_docs = table(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    per_gold = {}
    for r in rows:
        per_gold.setdefault(r.gold_lang, 0.0)
        per_gold[r.gold_lang] += r.row_share
    for share in per_gold.values():
        assert abs(share - 1.0) < 1e-3

    pred = text_lang_id(spark, SF)
    gold = table(spark, SF, "documents").select("doc_id", "lang")
    diag = {
        (r.lang, r.n)
        for r in pred.join(gold, "doc_id")
        .filter(F.col("pred_lang") == F.col("lang"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got_diag = {
        (r.gold_lang, r.n_docs) for r in rows if r.gold_lang == r.pred_lang
    }
    assert got_diag == diag


def test_assortativity_matches_python_replica(spark):
    from pumle_spark.tables import table
    from pumle_spark.workload.graph import graph_degree_assortativity

    r = graph_degree_assortativity(spark, SF).collect()[0]
    assert -1.0 <= r.assortativity <= 1.0

    o = table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = {
        (2 * p.o_custkey, 2 * p.l_suppkey + 1)
        for p in o.join(li, o.o_orderkey == li.l_orderkey).collect()
    }
    edges = list(pairs) + [(b, a) for a, b in pairs]
    deg = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1
    xs = [deg[a] for a, _ in edges]
    ys = [deg[b] for _, b in edges]
    n = len(edges)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    import math

    want = round(
        (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6
    )
    assert r.n_directed_edges == n
    assert abs(r.assortativity - want) < 1e-9


def test_aspect_buckets_partition_and_nearest(spark):
    from pumle_spark.workload.multimodal import (
        _ASPECT_BUCKETS,
        _media_table,
        multimodal_aspect_buckets,
    )

    rows = multimodal_aspect_buckets(spark, SF).collect()
    media = _media_table(spark, SF).select("media_id", "width", "height").collect()
    assert sum(r.n_items for r in rows) == len(media)
    for r in rows:
        assert r.bucket in _ASPECT_BUCKETS
        assert 0.0 <= r.mean_pad_waste <= r.max_pad_waste < 1.0

    # replicate the nearest-bucket choice and per-bucket counts exactly
    want = {}
    for m in media:
        best = min(_ASPECT_BUCKETS, key=lambda b: (abs(100 * m.width - b * m.height), b))
        want[best] = want.get(best, 0) + 1
    got = {r.bucket: r.n_items for r in rows}
    assert got == want


def test_dataset_card_reconciles_with_component_queries(spark):
    """The card's numbers must agree with the component operators it
    summarizes: token totals with text_token_counts, split tokens with the
    card's own total, dup rate with dedup_exact."""
    from pumle_spark.tables import table
    from pumle_spark.workload.dedup import dedup_exact
    from pumle_spark.workload.text import corpus_dataset_card, text_token_counts

    r = corpus_dataset_card(spark, SF).collect()[0]
    n_docs = table(spark, SF, "documents").count()
    assert r.n_docs == n_docs
    assert r.train_tokens + r.val_tokens + r.test_tokens == r.n_tokens

    tok_total = text_token_counts(spark, SF).agg(
        F.sum("n_ws_tokens").alias("t")
    ).collect()[0].t
    assert r.n_tokens == tok_total

    n_distinct = dedup_exact(spark, SF).count()
    assert r.exact_dup_rate == round(1.0 - n_distinct / n_docs, 6)
    assert 0.0 <= r.en_share <= 1.0


def test_degenerate_division_guards(spark, tmp_path):
    """ANSI mode makes divide-by-zero a crash, not an inf: every wave-3
    ratio must NULL out on its degenerate input instead. Pinned here for
    the three cheaply-constructible cases (single-token corpus → zipf
    slope + Herdan's C; zero-span user → TWAP)."""
    import pandas as pd

    d = tmp_path / "docs"
    d.mkdir()
    pd.DataFrame(
        {"doc_id": [0], "text": ["hello"], "lang": ["en"], "source": ["s"], "n_chars": [5]}
    ).to_parquet(d / "documents.parquet")

    from pumle_spark.workload.text import text_lexical_diversity, text_zipf_slope

    z = text_zipf_slope(spark, str(d)).collect()[0]
    assert z.n_points == 1 and z.zipf_slope is None
    lx = text_lexical_diversity(spark, str(d)).collect()[0]
    assert lx.herdan_c is None and lx.type_token_ratio == 1.0

    d2 = tmp_path / "ev"
    d2.mkdir()
    pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": pd.to_datetime(["2024-01-01 00:00:00"] * 2),
            "user_id": [5, 5],
            "event_type": ["a", "a"],
            "value": [1.0, 2.0],
            "props": ["{}"] * 2,
        }
    ).to_parquet(d2 / "events.parquet")

    from pumle_spark.workload.events import events_time_weighted_value

    t = events_time_weighted_value(spark, str(d2)).collect()[0]
    assert t.span_us == 0 and t.twap_value is None


def test_backlog_matches_interval_stabbing_bruteforce(spark):
    """The difference-array level must equal the brute-force interval
    count |{orders open on day t}| at every delta day."""
    from pumle_spark.tables import table
    from pumle_spark.workload.analytics import orders_backlog_timeseries

    o = {r.o_orderkey: r.o_orderdate.date() for r in table(spark, SF, "orders").collect()}
    closes = {}
    for r in table(spark, SF, "lineitem").collect():
        d = r.l_shipdate.date()
        k = r.l_orderkey
        closes[k] = max(closes.get(k, d), d)

    # brute force the level at each delta day, then roll up per month
    from datetime import timedelta

    # the operator clamps close to no earlier than open
    closes = {k: max(c, o[k]) for k, c in closes.items() if k in o}
    delta_days = set(o.values()) | {c + timedelta(days=1) for c in closes.values()}
    per_month = {}
    prev_lvl = 0  # carried-in level: holds from month start to its first delta day
    for t in sorted(delta_days):
        lvl = sum(
            1
            for k, od in o.items()
            if od <= t and (k not in closes or t <= closes[k])
        )
        m = t.strftime("%Y-%m")
        if m not in per_month:
            per_month[m] = (prev_lvl, prev_lvl)
        peak, _ = per_month[m]
        per_month[m] = (max(peak, lvl), lvl)  # last write = eom level
        prev_lvl = lvl

    got = {
        r.month: (r.peak_backlog, r.eom_backlog)
        for r in orders_backlog_timeseries(spark, SF).collect()
    }
    assert got == per_month


def test_position_attribution_conserves_value_and_shapes(spark, tmp_path):
    """Every purchase's credits must sum to EXACTLY its micro-value
    (residual folds into the last touch), and a planted 4-touch journey
    must split 40/20-ish/40 with the first and last touches equal-topped."""
    import pandas as pd

    rows = [
        (1, "2024-01-01 09:10:00", 1, "click", 0.0),
        (2, "2024-01-01 09:20:00", 1, "click", 0.0),
        (3, "2024-01-01 09:30:00", 1, "click", 0.0),
        (4, "2024-01-01 09:40:00", 1, "click", 0.0),
        (5, "2024-01-01 10:00:00", 1, "purchase", 10.0),
        (6, "2024-01-02 09:00:00", 2, "click", 0.0),
        (7, "2024-01-02 09:30:00", 2, "purchase", 3.0),
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

    from pumle_spark.workload.events import attribution_position_based

    got = {r.click_event_id: r.credited_value for r in attribution_position_based(spark, str(d)).collect()}
    # 4-touch journey on $10: first 4.0, last 4.0, middles 1.0 each
    assert got[1] == 4.0
    assert got[4] == 4.0
    assert got[2] == 1.0 and got[3] == 1.0
    # single-touch journey takes everything
    assert got[6] == 3.0
    assert abs(sum(got.values()) - 13.0) < 1e-9


def test_position_attribution_total_matches_linear_total(spark):
    """Both attribution models redistribute the SAME conversion mass —
    the grand totals across clicks must agree to micro-unit precision
    (position-based conserves exactly; linear under-credits ≤ n-1 micro
    per purchase, so totals agree within that documented slack)."""
    from pumle_spark.workload.events import (
        attribution_linear_credit,
        attribution_position_based,
    )

    pos = sum(
        r.credited_value
        for r in attribution_position_based(spark, SF).collect()
    )
    lin = sum(
        r.credited_value for r in attribution_linear_credit(spark, SF).collect()
    )
    assert abs(pos - lin) < 0.01  # linear's trunc slack only
