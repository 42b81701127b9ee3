"""Workload registry: every query/operator the engine claims in SURVEY.md §2.

Each entry pairs a Spark implementation ``fn(spark, sf_dir) -> DataFrame``
with (optionally) an ANSI-SQL oracle string that DuckDB runs on the same
parquet tables. The driver hash-compares the two at sf0.01 — so every column
is aliased identically on both sides, aggregate doubles are rounded the same
on both sides, and top-k queries carry a total deterministic order.

Modules register themselves on import; ``__spark_entry__.py`` just re-exports.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle; None → driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def _format_doc(fn: QueryFn) -> None:
    """Resolve {_CONSTANT}-style placeholders in a query docstring against
    its module's globals. Docstrings must be literal strings to be picked
    up as __doc__, so f-strings can't be used directly; without this,
    help() renders literal braces instead of the tuning constants the text
    refers to. All-or-nothing: a docstring whose braces aren't valid format
    fields (e.g. a set literal in prose) is left untouched."""
    if not fn.__doc__ or "{" not in fn.__doc__:
        return
    import re
    import sys

    mod_vars = vars(sys.modules[fn.__module__])

    def sub(m: re.Match) -> str:
        expr, _, spec = m.group(1).partition(":")
        try:
            val = eval(expr, {"__builtins__": {}}, mod_vars)  # noqa: S307 — our own docstrings
            return format(val, spec) if spec else str(val)
        except Exception:
            return m.group(0)  # prose braces (set literals etc.) stay as-is

    fn.__doc__ = re.sub(r"\{([^{}]+)\}", sub, fn.__doc__)


def register(name: str, sql: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _format_doc(fn)
        REGISTRY[name] = Query(name=name, fn=fn, sql=sql, tags=tags, doc=fn.__doc__ or "")
        return fn

    return deco


# The driver's CORRECTNESS_r{N}.json records at most 50 queries, taken in
# registration order. To rotate coverage across rounds, queries already
# hash-verified by the driver in a previous round (green union over
# CORRECTNESS_r01–r04 = 151 names; provenance: the checked-in
# CORRECTNESS_r0*.json files) are pushed behind the window.
#
# _DRIVER_WINDOW_R05 is round 5's 50-row window, EXPLICIT and ordered:
# the 44 queries that were local-green (tools/oracle_check.py 195/195 at
# sf0.01) but never appeared in any driver record, followed by this
# round's additions. Everything else keeps registration order behind it.
_DRIVER_WINDOW_R05 = (
    # -- never driver-verified through r04 (44) --------------------------
    "orders_backlog_timeseries", "attribution_position_based",
    "q16_part_supplier_counts", "q18_large_volume_orders",
    "profile_orders_columns", "join_right_outer_customer_orders",
    "set_union_distinct", "q22_global_sales_opportunity",
    "orders_retention_cohort", "window_range_frame_trailing_spend",
    "agg_grouping_sets_revenue", "events_transition_bigrams",
    "agg_price_histogram", "basket_brand_lift", "unpivot_lineitem_measures",
    "incremental_rollup_merge", "join_lateral_topk_orders",
    "mix_weighted_sources", "heavy_hitters_lineitem_parts",
    "mix_temperature_rebalance", "knn_bruteforce_cosine", "ann_ivf_assign",
    "dedup_embedding_lsh", "ann_lsh_codes", "ann_pq_codes",
    "ann_pq_adc_topk", "ann_ivfpq_topk", "sketch_hll_distinct",
    "sketch_cms_frequency", "sketch_bloom_membership", "sketch_hll_setops",
    "corpus_clean_pipeline", "deterministic_split", "orders_yoy_growth",
    "lineitem_ship_lag_percentiles", "supplier_hhi_by_brand",
    "cluster_assignment_margin", "events_markov_stationary",
    "events_bot_regularity", "events_retention_weekly",
    "graph_degree_assortativity", "multimodal_aspect_buckets",
    "text_langid_confusion", "corpus_dataset_card",
    # -- round-5 additions (new surface, first driver look) --------------
    "export_tensor_checksum", "export_zarr_roundtrip",
    "layout_zorder_golden", "stream_running_totals_final",
    "sketch_quantile_histogram", "events_sliding_distinct_hll",
)
_WINDOW_POS = {n: i for i, n in enumerate(_DRIVER_WINDOW_R05)}

# Registered AFTER the round-5 window was frozen (the driver records only
# queries()[:50]): these are local-green (tools/oracle_check.py) but not yet
# driver-verified — they head ROUND 6's window. Full never-driver-verified
# backlog after r05 = these 35 + 52 earlier local-only additions that
# pre-date the window freeze (registry minus CORRECTNESS_r01–r04 union
# minus _DRIVER_WINDOW_R05 — recompute with that set algebra when building
# _DRIVER_WINDOW_R06; it takes r06+r07 to drain at 50/round). Keep this
# list in sync when adding queries this round.
_DRIVER_QUEUE_R06 = (
    "mine_hard_negatives", "regress_theilsen_trend", "profile_fd_candidates",
    "forecast_holt_linear", "events_fano_burstiness", "text_keyword_textrank",
    "multimodal_phash_neardup", "graph_ppr_seeded",
    "stream_watermark_policy_audit", "drift_embedding_mmd",
    "audit_orderdate_gaps", "privacy_t_closeness", "sample_coreset_kcenter",
    "orders_rfm_migration", "stream_trending_topk_final",
    "orders_littles_law_audit", "orders_spc_control_chart",
    "embedding_knn_label_audit", "sample_neyman_allocation",
    "drift_importance_weights", "events_markov_accuracy",
    "mix_waterfill_budget", "abtest_sprt_sequential",
    "curation_contrastive_batches", "privacy_dp_budget_plan",
    "events_interrupted_timeseries", "join_relational_division",
    "events_growth_accounting", "graph_walk_corpus",
    "sketch_ams_f2", "events_entropy_rate", "text_cluster_js_mauve",
    "sample_horvitz_thompson", "forecast_hierarchy_reconcile",
    "text_watermark_zscores", "orders_max_drawdown",
    "curation_retention_bias_audit",
)


def _rotation_key(name: str) -> tuple[int, int]:
    return (0, _WINDOW_POS[name]) if name in _WINDOW_POS else (1, 0)


def _ordered() -> list[Query]:
    _load_modules()
    names = list(REGISTRY)
    return [REGISTRY[n] for n in sorted(names, key=lambda n: (*_rotation_key(n), names.index(n)))]


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.sql for q in _ordered() if q.sql is not None}


_LOADED = False


def _load_modules() -> None:
    global _LOADED
    if _LOADED:
        return
    # import for side effect: each module fills REGISTRY
    from pumle_spark.workload import (  # noqa: F401
        analytics,
        clustering,
        curation,
        dedup,
        drift,
        events,
        experiments,
        graph,
        layout,
        linkage,
        multimodal,
        physics,
        pipeline,
        relational,
        relational2,
        relational3,
        sampling,
        similarity,
        sketches,
        terrain,
        text,
    )

    _LOADED = True
