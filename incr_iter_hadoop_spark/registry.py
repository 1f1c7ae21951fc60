"""Query registry: name → (Spark builder, DuckDB oracle SQL).

Every operator from SURVEY.md §2 that the engine claims is registered here
with a Spark DataFrame builder ``fn(spark, sf_dir) -> DataFrame`` and, when
SQL-expressible, an ANSI-SQL oracle string the driver runs on DuckDB against
the same parquet tables. Column aliases MUST match between the two sides;
float aggregates are rounded to 6 decimals on BOTH sides so engine-order
summation noise can't flip the value hash.
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
    oracle: str | None  # None → driver records a weaker rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query builder to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from .operators import (  # noqa: F401
        aggregates,
        dedup,
        generators,
        incremental,
        iterative,
        joins,
        multimodal,
        relational,
        setops,
        similarity,
        textops,
        tpch_extra,
        udfs,
        windows,
    )


def all_queries() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
