"""Per-group argmin (SURVEY.md §2.3 A7) — the ReduceJoinReducer's
"keep the leg with least ArrDelay" semantics
(/root/reference/README.md:438,548-549).

Implemented as min-of-struct rather than a ranking window: `min` over a
struct whose leading fields are the order columns is a lexicographic
minimum, which Spark computes with map-side partial aggregation —
cheaper at scale than a window (which must co-locate and sort every
group's full row set). The order columns double as the deterministic
tie-break (SURVEY.md §2.11: ties broken by ascending order-column
tuple, so golden tests are stable).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def argmin_by(
    df: DataFrame,
    group: Sequence[str],
    order: Sequence[str],
    payload: Sequence[str],
) -> DataFrame:
    """One row per `group`: the row minimizing the `order` tuple.

    Output columns: group + order + payload. `order` must be a total
    order within each group (append a unique id as the last element).
    """
    carried = list(order) + [c for c in payload if c not in order]
    # NULL order keys rank LAST (ANSI ORDER BY ... ASC NULLS LAST —
    # what DuckDB/Postgres do): each order column is preceded by its
    # null flag in the struct, so (false, v) < (true, NULL) for every
    # real v. A bare min-of-struct would rank NULL first (Spark
    # compares a NULL struct field as smallest), silently electing
    # rows with an unknown order key as the group minimum.
    lead: list = []
    for c in order:
        lead.append(F.col(c).isNull().alias(f"__null_{c}"))
        lead.append(F.col(c).alias(c))
    packed = F.min(
        F.struct(*lead, *[F.col(c) for c in carried if c not in order])
    ).alias("__m")
    agg = df.groupBy(*group).agg(packed)
    return agg.select(*group, *[F.col(f"__m.{c}").alias(c) for c in carried])
