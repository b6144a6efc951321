"""Procedural escape-hatch wave (fixtures_procedural.py): cogrouped
Pandas as-of alignment and the partitioned Python UDTF. Value parity
is oracle-covered; these tests pin group-boundary behavior the oracle
data may not exercise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    import __spark_entry__ as e

    return e.queries()


def test_cogroup_user_with_no_clicks_gets_null_gap(spark, qs):
    """A purchase with zero preceding clicks must surface with
    gap_us NULL and n_clicks_before 0 — the cogroup's empty-left
    case."""
    rows = qs["events_cogroup_click_purchase_asof"](spark, SF).collect()
    assert rows
    no_click = [r for r in rows if r.n_clicks_before == 0]
    assert all(r.gap_us is None for r in no_click)
    with_click = [r for r in rows if r.n_clicks_before > 0]
    assert all(r.gap_us is not None and r.gap_us >= 0 for r in with_click)


def test_cogroup_counts_match_purchase_rows(spark, qs):
    from airline_dataset_hadoop_public_spark.sources.catalog import load_table

    out = qs["events_cogroup_click_purchase_asof"](spark, SF)
    n_purch = (
        load_table(spark, SF, "events")
        .filter("event_type = 'purchase'")
        .count()
    )
    assert out.count() == n_purch  # every purchase, exactly once


def test_series_micros_handles_all_units():
    from airline_dataset_hadoop_public_spark.plans.fixtures_procedural import (
        _series_micros,
    )

    base = pd.Timestamp("2024-01-01 00:00:01.5")
    epoch_s = 1_704_067_201
    for unit in ["s", "ms", "us", "ns"]:
        s = pd.Series([base]).astype(f"datetime64[{unit}]")
        got = _series_micros(s)[0]
        # second resolution truncates the .5s; finer units keep it
        want = epoch_s * 1_000_000 + (0 if unit == "s" else 500_000)
        assert got == want, unit


def test_udtf_streaks_reset_per_user(spark):
    """streak_idx restarts at 1 for each PARTITION BY group and
    consecutive same-type runs collapse to one row."""
    from unittest.mock import patch

    from airline_dataset_hadoop_public_spark.plans import fixtures_procedural as P

    ev = spark.createDataFrame(
        [
            (1, "a", pd.Timestamp("2024-01-01 00:00:00"), 1),
            (1, "a", pd.Timestamp("2024-01-01 00:00:01"), 2),
            (1, "b", pd.Timestamp("2024-01-01 00:00:02"), 3),
            (2, "b", pd.Timestamp("2024-01-01 00:00:00"), 4),
        ],
        ["user_id", "event_type", "ts", "event_id"],
    )
    with patch.object(P, "load_table", lambda s, d, t: ev):
        got = sorted(
            map(tuple, P.events_type_streaks_udtf(spark, SF).collect())
        )
    assert got == [
        (1, 1, "a", 2),
        (1, 2, "b", 1),
        (2, 1, "b", 1),
    ]


def test_udtf_total_events_conserved(spark, qs):
    from airline_dataset_hadoop_public_spark.sources.catalog import load_table

    from pyspark.sql import functions as F

    streaks = qs["events_type_streaks_udtf"](spark, SF)
    got = streaks.agg(F.sum("streak_len")).collect()[0][0]
    assert got == load_table(spark, SF, "events").count()
