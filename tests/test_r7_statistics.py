"""r7 statistics wave: hand-computed pins for the new estimators.

Each test builds a tiny synthetic fixture dir (only the tables the
query touches) and checks the registered query against values computed
by hand / naive local code — independent of the DuckDB oracle, so a
shared misreading of the algorithm on both engine sides would still
be caught here.
"""

import datetime as dt

import pytest

D = dt.date
TS = dt.datetime


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/{name}.parquet")
    return str(tmp_path)


def _orders(spark, tmp_path, rows):
    """rows: (o_orderkey, o_custkey, o_orderdate, o_totalprice)"""
    full = [
        (k, c, "O", p, d, "3-MEDIUM") for (k, c, d, p) in rows
    ]
    return _write(
        spark,
        tmp_path,
        "orders",
        full,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    )


# ---------------------------------------------------------------------------
# Kaplan–Meier
# ---------------------------------------------------------------------------


def test_kaplan_meier_hand_case(spark, tmp_path):
    from airline_dataset_hadoop_public_spark.plans.fixtures_statistics import (
        orders_repeat_kaplan_meier,
    )

    # c1: repeat at 2d; c2: repeat at 5d; c3 censored at 10d;
    # c4 censored at 4d; c5: repeat at 2d.  dmax = 2024-01-11.
    sf = _orders(
        spark,
        tmp_path,
        [
            (1, 1, D(2024, 1, 1), 1.0),
            (2, 1, D(2024, 1, 3), 1.0),
            (3, 2, D(2024, 1, 1), 1.0),
            (4, 2, D(2024, 1, 6), 1.0),
            (5, 3, D(2024, 1, 1), 1.0),
            (6, 4, D(2024, 1, 7), 1.0),
            (7, 5, D(2024, 1, 9), 1.0),
            (8, 5, D(2024, 1, 11), 1.0),
        ],
    )
    rows = sorted(
        (r["duration_days"], r["n_events"], r["n_at_risk"], r["survival"])
        for r in orders_repeat_kaplan_meier(spark, sf).collect()
    )
    # dur 2: 2 events of 5 at risk → S = 0.6
    # dur 5: 1 event of 2 at risk  → S = 0.6 * 0.5 = 0.3
    assert rows == [(2, 2, 5, 0.6), (5, 1, 2, 0.3)]


def test_kaplan_meier_terminal_zero_step_excluded(spark, tmp_path):
    from airline_dataset_hadoop_public_spark.plans.fixtures_statistics import (
        orders_repeat_kaplan_meier,
    )

    # every customer repeats; the last event step has d_t == n_t
    # (survival exactly 0) and is excluded per the stated definition
    sf = _orders(
        spark,
        tmp_path,
        [
            (1, 1, D(2024, 1, 1), 1.0),
            (2, 1, D(2024, 1, 2), 1.0),  # dur 1
            (3, 2, D(2024, 1, 1), 1.0),
            (4, 2, D(2024, 1, 4), 1.0),  # dur 3
            (5, 3, D(2024, 1, 1), 1.0),
            (6, 3, D(2024, 1, 4), 1.0),  # dur 3
        ],
    )
    rows = sorted(
        (r["duration_days"], r["n_events"], r["n_at_risk"], r["survival"])
        for r in orders_repeat_kaplan_meier(spark, sf).collect()
    )
    assert rows == [(1, 1, 3, round(2.0 / 3.0, 4))]


def test_kaplan_meier_curve_is_monotone_nonincreasing(spark):
    from airline_dataset_hadoop_public_spark.plans.fixtures_statistics import (
        orders_repeat_kaplan_meier,
    )

    rows = (
        orders_repeat_kaplan_meier(spark, "/root/testdata/sf0.001")
        .orderBy("duration_days")
        .collect()
    )
    assert len(rows) > 10
    surv = [r["survival"] for r in rows]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    assert all(0.0 <= s <= 1.0 for s in surv)
    # risk set shrinks as duration grows
    risk = [r["n_at_risk"] for r in rows]
    assert all(a > b for a, b in zip(risk, risk[1:]))


# ---------------------------------------------------------------------------
# Mann–Whitney U
# ---------------------------------------------------------------------------


def test_mann_whitney_hand_case_with_ties(spark, tmp_path):
    from airline_dataset_hadoop_public_spark.plans.fixtures_statistics import (
        events_mann_whitney_weekend,
    )

    # weekend (Sat 2024-01-06): values [1, 2, 2]; weekday (Mon
    # 2024-01-08): [2, 3].  Combined ranks: 1→1, the 2-tie → avg 3,
    # 3→5.  R1 = 7, U1 = 7 − 6 = 1, μ = 3,
    # σ² = (6/12)(6 − 24/20) = 2.4, z = −2/√2.4 = −1.2910,
    # rank-biserial = 1 − 2·1/6 = 0.6667.
    rows = [
        (1, TS(2024, 1, 6, 10), 1, "view", 1.0, "{}"),
        (2, TS(2024, 1, 6, 11), 1, "view", 2.0, "{}"),
        (3, TS(2024, 1, 6, 12), 1, "view", 2.0, "{}"),
        (4, TS(2024, 1, 8, 10), 1, "view", 2.0, "{}"),
        (5, TS(2024, 1, 8, 11), 1, "view", 3.0, "{}"),
    ]
    sf = _write(
        spark,
        tmp_path,
        "events",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    r = events_mann_whitney_weekend(spark, sf).collect()[0]
    assert (r["n_weekend"], r["n_weekday"]) == (3, 2)
    assert r["u1_x2"] == 2  # exact integer: 2·U1
    assert r["z_score"] == round(-2.0 / (2.4 ** 0.5), 4)
    assert r["rank_biserial"] == round(1.0 - 2.0 / 6.0, 4)


def test_mann_whitney_symmetric_groups_z_zero(spark, tmp_path):
    from airline_dataset_hadoop_public_spark.plans.fixtures_statistics import (
        events_mann_whitney_weekend,
    )

    # identical value multisets on both sides → U1 = n1·n2/2, z = 0
    rows = []
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0]):
        rows.append((10 + i, TS(2024, 1, 6, i + 1), 1, "view", v, "{}"))
        rows.append((20 + i, TS(2024, 1, 8, i + 1), 1, "view", v, "{}"))
    sf = _write(
        spark,
        tmp_path,
        "events",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    r = events_mann_whitney_weekend(spark, sf).collect()[0]
    assert r["u1_x2"] == 16  # 2 · (4·4/2)
    assert r["z_score"] == 0.0
    assert r["rank_biserial"] == 0.0


# ---------------------------------------------------------------------------
# Gini / Lorenz
# ---------------------------------------------------------------------------


def _customers(spark, tmp_path, rows):
    """rows: (c_custkey, c_nationkey, c_mktsegment)"""
    return _write(
        spark,
        tmp_path,
        "customer",
        rows,
        "c_custkey long, c_nationkey long, c_mktsegment string",
    )


def test_gini_equal_and_concentrated(spark, tmp_path):
    from airline_dataset_hadoop_public_spark.plans.fixtures_statistics import (
        orders_segment_revenue_gini,
    )

    _customers(
        spark,
        tmp_path,
        [(1, 0, "EQ"), (2, 0, "EQ"), (3, 0, "EQ"),
         (4, 0, "SKEW"), (5, 0, "SKEW")],
    )
    _orders(
        spark,
        tmp_path,
        [
            # EQ: all customers earn the same → Gini 0
            (1, 1, D(2024, 1, 1), 5.0),
            (2, 2, D(2024, 1, 1), 5.0),
            (3, 3, D(2024, 1, 1), 5.0),
            # SKEW: revenues 1¢-worth 0.01 and 0.03 → Gini 0.25
            (4, 4, D(2024, 1, 1), 0.01),
            (5, 5, D(2024, 1, 1), 0.03),
        ],
    )
    got = {
        r["mktsegment"]: (r["n_customers"], r["total_cents"], r["gini"])
        for r in orders_segment_revenue_gini(spark, str(tmp_path)).collect()
    }
    assert got["EQ"] == (3, 1500, 0.0)
    # [1, 3]: G = (2(1·1+2·3) − 3·4) / (2·4) = 2/8
    assert got["SKEW"] == (2, 4, 0.25)


# ---------------------------------------------------------------------------
# Largest-remainder apportionment
# ---------------------------------------------------------------------------


def _nations(spark, tmp_path, rows):
    return _write(
        spark,
        tmp_path,
        "nation",
        rows,
        "n_nationkey long, n_name string, n_regionkey long",
    )


def test_largest_remainder_exact_total_and_tiebreak(spark, tmp_path):
    from airline_dataset_hadoop_public_spark.plans.fixtures_statistics import (
        _BUDGET_UNITS,
        nation_budget_largest_remainder,
    )

    _nations(spark, tmp_path, [(0, "AAA", 0), (1, "BBB", 0), (2, "CCC", 0)])
    _customers(spark, tmp_path, [(1, 0, "X"), (2, 1, "X"), (3, 2, "X")])
    # equal revenues: base = 333333 each, leftover 1 goes to the
    # smallest nationkey (remainder tie-break)
    _orders(
        spark,
        tmp_path,
        [
            (1, 1, D(2024, 1, 1), 7.0),
            (2, 2, D(2024, 1, 1), 7.0),
            (3, 3, D(2024, 1, 1), 7.0),
        ],
    )
    rows = {
        r["nation"]: r["alloc_units"]
        for r in nation_budget_largest_remainder(
            spark, str(tmp_path)
        ).collect()
    }
    assert sum(rows.values()) == _BUDGET_UNITS
    assert rows == {"AAA": 333334, "BBB": 333333, "CCC": 333333}


def test_largest_remainder_proportionality(spark, tmp_path):
    from airline_dataset_hadoop_public_spark.plans.fixtures_statistics import (
        _BUDGET_UNITS,
        nation_budget_largest_remainder,
    )

    _nations(spark, tmp_path, [(0, "AAA", 0), (1, "BBB", 0)])
    _customers(spark, tmp_path, [(1, 0, "X"), (2, 1, "X")])
    _orders(
        spark,
        tmp_path,
        [(1, 1, D(2024, 1, 1), 1.0), (2, 2, D(2024, 1, 1), 3.0)],
    )
    rows = {
        r["nation"]: r["alloc_units"]
        for r in nation_budget_largest_remainder(
            spark, str(tmp_path)
        ).collect()
    }
    assert rows == {
        "AAA": _BUDGET_UNITS // 4,
        "BBB": 3 * _BUDGET_UNITS // 4,
    }


# ---------------------------------------------------------------------------
# Pareto coverage
# ---------------------------------------------------------------------------


def test_pareto_coverage_hand_case(spark, tmp_path):
    from airline_dataset_hadoop_public_spark.plans.fixtures_statistics import (
        supplier_pareto_coverage,
    )

    _nations(spark, tmp_path, [(0, "AAA", 0)])
    _write(
        spark,
        tmp_path,
        "supplier",
        [(1, 0), (2, 0), (3, 0), (4, 0)],
        "s_suppkey long, s_nationkey long",
    )
    # revenues 50 / 30 / 15 / 5 — top-2 reach exactly 80%
    li = [
        (1, 1, 50.0),
        (2, 2, 30.0),
        (3, 3, 15.0),
        (4, 4, 5.0),
    ]
    _write(
        spark,
        tmp_path,
        "lineitem",
        [(k, s, p) for (k, s, p) in li],
        "l_orderkey long, l_suppkey long, l_extendedprice double",
    )
    r = supplier_pareto_coverage(spark, str(tmp_path)).collect()
    assert len(r) == 1
    assert (r[0]["nation"], r[0]["n_suppliers"], r[0]["n_top"]) == (
        "AAA",
        4,
        2,
    )
    assert r[0]["covered_share"] == 0.8


# ---------------------------------------------------------------------------
# NPMI
# ---------------------------------------------------------------------------


def test_npmi_perfect_cooccurrence_is_one(spark, tmp_path):
    from airline_dataset_hadoop_public_spark.plans.fixtures_behavior import (
        parts_copurchase_npmi,
    )

    # parts 1, 2 appear ONLY together (2 baskets of 3) → npmi = 1.0:
    # ln(2·3 / (2·2)) / ln(3/2) = ln(1.5)/ln(1.5)
    li = [
        (1, 1), (1, 2),
        (2, 1), (2, 2),
        (3, 3), (3, 4), (3, 3),  # dup line: DISTINCT membership
    ]
    _write(
        spark,
        tmp_path,
        "lineitem",
        li,
        "l_orderkey long, l_partkey long",
    )
    rows = {
        (r["p1"], r["p2"]): (r["n_both"], r["npmi"])
        for r in parts_copurchase_npmi(spark, str(tmp_path)).collect()
    }
    assert rows == {(1, 2): (2, 1.0)}  # (3,4) pair has n_both = 1 < floor


# ---------------------------------------------------------------------------
# Time-decay attribution
# ---------------------------------------------------------------------------


def test_time_decay_weights_and_shares(spark, tmp_path):
    from airline_dataset_hadoop_public_spark.plans.fixtures_product_analytics import (
        events_time_decay_attribution,
    )

    p_ts = TS(2024, 1, 10, 12, 0, 0)
    rows = [
        # same-instant touch: Δ = 0 d → w = 1000
        (1, p_ts, 7, "click", None, "{}"),
        # exactly 7 days before (inclusive boundary): Δ = 7 → w = 500
        (2, TS(2024, 1, 3, 12, 0, 0), 7, "view", None, "{}"),
        # 8 days before: outside the lookback entirely
        (3, TS(2024, 1, 2, 12, 0, 0), 7, "error", None, "{}"),
        (4, p_ts, 7, "purchase", 1.0, "{}"),  # 100 cents
        # untouched purchase by another user → full credit to (none)
        (5, TS(2024, 1, 5), 8, "purchase", 2.0, "{}"),
    ]
    sf = _write(
        spark,
        tmp_path,
        "events",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        r["channel"]: (r["n_share_events"], r["attributed_bp"])
        for r in events_time_decay_attribution(spark, sf).collect()
    }
    # Σw_m = 1500; click: 100·100·1000 div 1500 = 6666;
    # view: 100·100·500 div 1500 = 3333; error never enters
    assert got == {
        "click": (1, 6666),
        "view": (1, 3333),
        "(none)": (1, 20000),
    }


def test_time_decay_negative_value_excluded(spark, tmp_path):
    from airline_dataset_hadoop_public_spark.plans.fixtures_product_analytics import (
        events_time_decay_attribution,
    )

    rows = [
        (1, TS(2024, 1, 10), 7, "click", None, "{}"),
        (2, TS(2024, 1, 10, 1), 7, "purchase", -5.0, "{}"),  # refund: out
        (3, TS(2024, 1, 10, 2), 7, "purchase", 3.0, "{}"),
    ]
    sf = _write(
        spark,
        tmp_path,
        "events",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        r["channel"]: r["attributed_bp"]
        for r in events_time_decay_attribution(spark, sf).collect()
    }
    assert got == {"click": 30000}


# ---------------------------------------------------------------------------
# Revenue bridge waterfall
# ---------------------------------------------------------------------------


def test_waterfall_components_hand_case(spark, tmp_path):
    from airline_dataset_hadoop_public_spark.plans.fixtures_product_analytics import (
        orders_revenue_bridge_waterfall,
    )

    sf = _orders(
        spark,
        tmp_path,
        [
            (1, 1, D(2024, 1, 5), 100.0),   # A Jan
            (2, 1, D(2024, 2, 5), 150.0),   # A Feb: expansion +50
            (3, 2, D(2024, 1, 9), 200.0),   # B Jan only: churns in Feb
            (4, 3, D(2024, 2, 1), 80.0),    # C Feb only: new
            (5, 4, D(2024, 1, 2), 50.0),    # D Jan
            (6, 4, D(2024, 2, 2), 30.0),    # D Feb: contraction −20
        ],
    )
    got = {
        r["month"]: (
            r["new_cents"],
            r["expansion_cents"],
            r["contraction_cents"],
            r["churned_cents"],
        )
        for r in orders_revenue_bridge_waterfall(spark, sf).collect()
    }
    assert got["2024-01"] == (35000, 0, 0, 0)
    assert got["2024-02"] == (8000, 5000, 2000, 20000)
    # the month after the last data month carries churn only
    assert got["2024-03"] == (0, 0, 0, 26000)


def test_waterfall_identity_on_fixture_data(spark):
    from airline_dataset_hadoop_public_spark.plans.fixtures_product_analytics import (
        orders_revenue_bridge_waterfall,
    )
    import duckdb

    rows = orders_revenue_bridge_waterfall(
        spark, "/root/testdata/sf0.001"
    ).collect()
    per_month = duckdb.sql(
        """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS m,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
           FROM read_parquet('/root/testdata/sf0.001/orders.parquet')
           WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
                 AND o_totalprice IS NOT NULL
           GROUP BY 1"""
    ).fetchall()
    totals = {m: c for m, c in per_month}
    for r in rows:
        delta = totals.get(r["month"], 0) - totals.get(
            _prev_month(r["month"]), 0
        )
        assert (
            r["new_cents"]
            + r["expansion_cents"]
            - r["contraction_cents"]
            - r["churned_cents"]
            == delta
        ), r["month"]


def _prev_month(m: str) -> str:
    y, mm = int(m[:4]), int(m[5:7])
    return f"{y - 1 if mm == 1 else y}-{12 if mm == 1 else mm - 1:02d}"
