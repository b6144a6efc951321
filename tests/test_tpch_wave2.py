"""Wave-2 decision-support shapes: plan contracts + semantic
invariants (values vs the DuckDB oracles are covered by
scripts/check_correctness.py at sf0.01; these guard the physical
plans and cross-query consistency at sf0.001)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def qs():
    import __spark_entry__ as e

    return e.queries()


def test_q7_broadcasts_both_nation_dims(spark, qs):
    plan = _plan(qs["tpch_q7_volume_shipping"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2


def test_q8_region_filter_is_semi_join(spark, qs):
    plan = _plan(qs["tpch_q8_national_market_share"](spark, SF))
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan


def test_q9_all_dims_broadcast_no_fact_shuffle_join(spark, qs):
    # part pattern + supplier nation both ride broadcasts; the only
    # Exchange should be the final aggregation, never a fact-side
    # sort-merge join
    plan = _plan(qs["tpch_q9_part_pattern_revenue"](spark, SF))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_q13_left_outer_counts_zero_order_customers(spark, qs):
    df = qs["tpch_q13_customer_distribution"](spark, SF)
    assert "LeftOuter" in _plan(df)
    rows = {r["c_count"]: r["custdist"] for r in df.collect()}
    # the histogram partitions the full customer set
    from airline_dataset_hadoop_public_spark.sources.catalog import load_table

    assert sum(rows.values()) == load_table(spark, SF, "customer").count()


def test_q15_caches_revenue_view_and_matches_max(spark, qs):
    df = qs["tpch_q15_top_supplier"](spark, SF)
    plan = _plan(df)
    # the revenue view feeds two consumers — it must come from cache,
    # not a recomputed scan+agg lineage
    assert "InMemoryTableScan" in plan
    rows = df.collect()
    assert len(rows) >= 1
    assert len({r["total_revenue"] for r in rows}) == 1  # all tied at max


def test_q16_excludes_denylist_via_broadcast_anti(spark, qs):
    plan = _plan(qs["tpch_q16_supplier_diversity"](spark, SF))
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_q21_semi_and_anti_on_cached_late_frame(spark, qs):
    df = qs["tpch_q21_waiting_suppliers"](spark, SF)
    plan = _plan(df)
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "InMemoryTableScan" in plan  # late frame cached, 2 consumers
    counts = [r["numwait"] for r in df.collect()]
    assert counts == sorted(counts, reverse=True)


def test_grouping_sets_single_expand_pass(spark, qs):
    df = qs["grouping_sets_revenue"](spark, SF)
    plan = _plan(df)
    assert "Expand" in plan  # all granularities in one shuffle
    rows = df.collect()
    # grand total row exists exactly once and equals the sum over the
    # finest granularity
    totals = [r for r in rows if r["g_flag"] == 1 and r["g_status"] == 1]
    assert len(totals) == 1
    fine = [r for r in rows if r["g_flag"] == 0 and r["g_status"] == 0]
    assert abs(sum(r["revenue"] for r in fine) - totals[0]["revenue"]) < 1.0
    assert sum(r["n_lines"] for r in fine) == totals[0]["n_lines"]
