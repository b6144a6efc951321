"""Bucketed range join (point-in-interval) — absent from the reference
(SURVEY.md §2.5 "not present: range/as-of/interval joins"), exposed as
an engine extension because validity-window enrichment is a staple of
event pipelines.

A naive `ts BETWEEN start AND end` join compiles to a nested-loop
(every point × every interval). The scalable layout discretizes time
into fixed buckets: a point hits exactly one bucket, an interval is
exploded over the buckets it covers, and the join becomes an EQUI join
on (equi_keys…, bucket) followed by a residual range filter. Cost =
|points| + Σ interval_len/bucket — linear, shuffle-partitioned, and
AQE-skew-splittable, at the price of interval_len/bucket replica rows
per interval (size `bucket_seconds` to the typical interval length).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    equi_keys: Sequence[str] = (),
    bucket_seconds: int = 86_400,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    `start <= ts <= end` (and equal `equi_keys`, if given).

    Output: points columns + intervals columns (minus duplicated equi
    keys). Both inputs must not share other column names.
    """
    b = F.lit(bucket_seconds)
    p = points.withColumn(
        "__b", F.floor(F.unix_timestamp(F.col(ts_col)) / b).cast("long")
    )
    i = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b).cast("long"),
                F.floor(F.unix_timestamp(F.col(end_col)) / b).cast("long"),
            )
        ),
    )
    joined = p.join(i, [*equi_keys, "__b"], how).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    )
    return joined.drop("__b")
