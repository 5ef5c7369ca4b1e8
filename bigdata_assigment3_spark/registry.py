"""Query registry: one named entry per operator from SURVEY.md §2.

Each query is a function ``(spark, sf_dir) -> DataFrame`` registered
together with (when SQL-expressible) its DuckDB oracle SQL, so
``__spark_entry__.queries()`` / ``oracle_sql()`` are generated from a
single source of truth.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered views; None => rows-only check
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as query ``name`` with optional DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def _load_all() -> None:
    """Import every operator module so decorators run."""
    from .operators import (  # noqa: F401
        bucketing,
        coverage,
        dedup,
        hmrf,
        hough,
        imagekernels,
        imagekernels2,
        motion,
        motion_adaptive,
        multimodal,
        relational,
        similarity,
        text,
        webservice,
    )
    from .streaming import queries as streaming_queries  # noqa: F401


def query_fns() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sqls() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
