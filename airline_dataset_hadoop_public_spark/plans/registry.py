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
    module: str = ""  # short fixture-module name, for family-level ordering


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(fn, oracle, fn.__module__.rsplit(".", 1)[-1])
        return fn

    return deco


# The driver verifies a prefix window of the registry (r01 checked the
# first 50 of 115 in registration order), so exposure order is a
# coverage decision, not cosmetics. Round-robin: families with no
# CORRECTNESS row yet go first; families fully green in the previous
# round go last. Names in _PINNED_FIRST jump the queue (e.g. a query
# whose oracle was red last round and must re-verify).
_PINNED_FIRST: list[str] = [
    "tpch_q12_priority_late_shipping",  # r01 hash mismatch (oracle cast fix)
    "tpch_q19_disjunctive_brand_revenue",  # r01: outside checked window
    "tpch_q22_dormant_rich_customers",  # r01: outside checked window
]

_MODULE_ORDER: list[str] = [
    "fixtures_ingest",  # S1-S4 CSV path: first driver exposure
    "fixtures_extensions",  # dedup / similarity / text / multimodal
    "fixtures_streaming",
    "fixtures_product_analytics",
    "fixtures_training_prep",
    "fixtures_ingest_extra",  # r2 additions: json + malformed-drop
    "fixtures_timeseries",
    "fixtures_tpch_wave2",
    "fixtures_tpch_wave3",
    "fixtures_tpch_extra",  # green r01 (minus pinned q12)
    "fixtures_parity",  # green r01
    "fixtures_analytics",  # green r01
]


def _ordered() -> list[tuple[str, QueryDef]]:
    def key(item: tuple[str, QueryDef]) -> tuple[int, int]:
        name, d = item
        if name in _PINNED_FIRST:
            return (0, _PINNED_FIRST.index(name))
        try:
            fam = _MODULE_ORDER.index(d.module)
        except ValueError:
            fam = len(_MODULE_ORDER)
        return (1 + fam, 0)

    items = list(REGISTRY.items())
    # stable sort keeps registration order within each family
    return sorted(items, key=key)


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: d.fn for name, d in _ordered()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: d.oracle for name, d in _ordered() if d.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from . import fixtures_ingest  # noqa: F401
    from . import fixtures_ingest_extra  # noqa: F401
    from . import fixtures_parity  # noqa: F401
    from . import fixtures_analytics  # noqa: F401
    from . import fixtures_tpch_extra  # noqa: F401
    from . import fixtures_tpch_wave2  # noqa: F401
    from . import fixtures_tpch_wave3  # noqa: F401
    from . import fixtures_product_analytics  # noqa: F401
    from . import fixtures_training_prep  # noqa: F401
    from . import fixtures_timeseries  # noqa: F401
    from . import fixtures_scale_patterns  # noqa: F401
    from . import fixtures_resolution  # noqa: F401
    from . import fixtures_graph  # noqa: F401
    from . import fixtures_procedural  # noqa: F401
    from . import fixtures_corpus_model  # noqa: F401
    from . import fixtures_behavior  # noqa: F401
    from . import fixtures_storage  # noqa: F401
    from . import fixtures_streaming2  # noqa: F401
    try:
        from . import fixtures_extensions  # noqa: F401
    except ImportError:
        pass
    try:
        from . import fixtures_streaming  # noqa: F401
    except ImportError:
        pass
    _LOADED = True
