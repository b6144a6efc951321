"""Wave-3 decision-support shapes (Q2/Q4/Q11/Q20 analogs): plan
contracts + semantic invariants (value parity vs the DuckDB oracles
is covered by scripts/check_correctness.py at sf0.01; these guard
the physical plans and query-level invariants at sf0.001)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def qs():
    import __spark_entry__ as e

    return e.queries()


def test_q2_no_fact_sort_merge_join(spark, qs):
    # part filter and EUROPE-supplier side both ride broadcasts at
    # this scale; the window min runs on the aggregated (part,
    # supplier) frame only. r10: their hard hints are gone (part- and
    # supplier-scaled frames — broadcast audit), so the static plan
    # may stage a sort-merge; the contract moves to the AQE-FINAL
    # plan, which re-plans the tiny runtime sides as broadcasts.
    df = qs["tpch_q2_min_cost_supplier"](spark, SF)
    df.collect()
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_q2_keeps_only_per_part_minima(spark, qs):
    rows = qs["tpch_q2_min_cost_supplier"](spark, SF).collect()
    assert 0 < len(rows) <= 100
    best: dict[int, float] = {}
    for r in rows:
        best.setdefault(r.p_partkey, r.unit_cost)
        assert r.unit_cost == best[r.p_partkey]  # all ties, nothing above min
    accts = [r.s_acctbal for r in rows]
    assert accts == sorted(accts, reverse=True)


def test_q4_exists_is_semi_join_no_row_explosion(spark, qs):
    df = qs["tpch_q4_order_priority_check"](spark, SF)
    plan = _plan(df)
    assert "LeftSemi" in plan
    rows = df.collect()
    assert rows and all(r.order_count > 0 for r in rows)
    prios = [r.o_orderpriority for r in rows]
    assert prios == sorted(prios)


def test_q11_single_lineitem_scan_via_cache(spark, qs):
    # threshold derives from the cached per-part aggregate: BOTH
    # consumers (the filter side and the one-row cutoff broadcast)
    # must read the InMemoryRelation — lineitem parquet appears only
    # inside the cached lineage, never as a live second scan
    plan = _plan(qs["tpch_q11_important_parts"](spark, SF))
    assert plan.count("InMemoryTableScan") == 2
    for chunk in plan.split("InMemoryRelation")[:1]:  # text above the cache
        assert "lineitem.parquet" not in chunk


def test_q11_values_sorted_desc(spark, qs):
    rows = qs["tpch_q11_important_parts"](spark, SF).collect()
    assert rows
    vals = [r.part_value for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_q20_agg_before_supplier_semi_join(spark, qs):
    df = qs["tpch_q20_excess_shippers"](spark, SF)
    plan = _plan(df)
    assert plan.count("LeftSemi") >= 2  # part filter + supplier filter
    rows = df.collect()
    assert rows
    names = [r.s_name for r in rows]
    assert names == sorted(names)
