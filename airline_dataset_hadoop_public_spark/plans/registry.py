"""Query registry backing the driver contract (__spark_entry__.py).

Each named query is a callable (spark, sf_dir) -> DataFrame paired with
an optional ANSI-SQL oracle string DuckDB runs on the same parquet
tables. Discipline (SURVEY.md §5.2 / FIXTURES.md): identical column
aliases on both sides, ROUND(x, 4) on floating aggregates, an explicit
deterministic tie-break on every order used with limit/row_number, and
temporal outputs rendered as strings with matching formats.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    fn: QueryFn
    oracle: str | None  # None → driver records weaker rows-only check


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(fn, oracle)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: d.fn for name, d in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: d.oracle for name, d in REGISTRY.items() if d.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from . import fixtures_parity  # noqa: F401
    from . import fixtures_analytics  # noqa: F401
    from . import fixtures_tpch_extra  # noqa: F401
    from . import fixtures_tpch_wave2  # noqa: F401
    from . import fixtures_tpch_wave3  # noqa: F401
    from . import fixtures_product_analytics  # noqa: F401
    from . import fixtures_training_prep  # noqa: F401
    from . import fixtures_timeseries  # noqa: F401
    try:
        from . import fixtures_extensions  # noqa: F401
    except ImportError:
        pass
    try:
        from . import fixtures_streaming  # noqa: F401
    except ImportError:
        pass
    _LOADED = True
