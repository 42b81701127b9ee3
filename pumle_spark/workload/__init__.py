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


def register(name: str, sql: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, sql=sql, tags=tags, doc=fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_modules()
    return {q.name: q.fn for q in REGISTRY.values()}


def oracle_sql() -> dict[str, str]:
    _load_modules()
    return {q.name: q.sql for q in REGISTRY.values() if q.sql is not None}


_LOADED = False


def _load_modules() -> None:
    global _LOADED
    if _LOADED:
        return
    # import for side effect: each module fills REGISTRY
    from pumle_spark.workload import (  # noqa: F401
        dedup,
        events,
        multimodal,
        physics,
        pipeline,
        relational,
        relational2,
        sampling,
        similarity,
        terrain,
        text,
    )

    _LOADED = True
