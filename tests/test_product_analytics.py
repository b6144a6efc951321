"""Product-analytics wave: plan contracts + semantic invariants
(value parity vs DuckDB oracles runs in scripts/check_correctness.py
at sf0.01; these guard physical plans and invariants at sf0.001)."""

from __future__ import annotations

from collections import defaultdict

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def qs():
    import __spark_entry__ as e

    return e.queries()


def test_cohort_offset_zero_is_cohort_max(spark, qs):
    rows = qs["events_cohort_retention"](spark, SF).collect()
    assert rows
    by_cohort = defaultdict(dict)
    for r in rows:
        by_cohort[r.cohort_week][r.week_offset] = r.active_users
    for offsets in by_cohort.values():
        # every member is active in their own first week by definition
        assert 0 in offsets
        assert offsets[0] == max(offsets.values())


def test_funnel_stages_monotone_non_increasing(spark, qs):
    rows = qs["events_funnel_conversion"](spark, SF).collect()
    assert [r.stage for r in rows] == ["1_view", "2_click_24h", "3_purchase_24h"]
    users = [r.users for r in rows]
    assert users == sorted(users, reverse=True)
    assert users[0] > 0


def test_transition_probs_row_normalized(spark, qs):
    rows = qs["events_transition_matrix"](spark, SF).collect()
    assert rows
    sums = defaultdict(float)
    for r in rows:
        assert r.transitions > 0
        sums[r.from_type] += r.prob
    for total in sums.values():
        assert abs(total - 1.0) < 0.01  # 4dp rounding per cell


def test_stratified_sample_is_shuffle_free_and_stratified(spark, qs):
    df = qs["events_stratified_sample"](spark, SF)
    plan = _plan(df)
    assert "Exchange" not in plan  # pure scan-stage filter
    rows = df.collect()
    assert rows
    by_type = defaultdict(int)
    for r in rows:
        by_type[r.event_type] += 1
    # 20% purchase rate vs 5% click rate: oversampled rare stratum
    assert by_type["purchase"] > by_type["click"]


def test_rolling_actives_broadcasts_day_frame(spark, qs):
    df = qs["events_rolling_7d_active_users"](spark, SF)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan  # range join vs tiny day frame
    rows = df.collect()
    assert rows
    days = [r.day for r in rows]
    assert days == sorted(days)
    assert all(r.active_7d > 0 for r in rows)


def test_gopher_flags_shuffle_free_and_discriminating(spark, qs):
    df = qs["text_gopher_quality_flags"](spark, SF)
    plan = _plan(df)
    assert "Exchange" not in plan  # per-row array exprs, codegen only
    rows = df.collect()
    assert rows
    passes = {r.gopher_pass for r in rows}
    assert passes == {0, 1}  # rules actually discriminate on the corpus
    for r in rows:
        assert r.gopher_pass == (
            r.flag_len & r.flag_mwl & r.flag_distinct & r.flag_stop
        )
