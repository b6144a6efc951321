"""Property-based tests for the r7 statistics wave (SURVEY.md §5.2
style): hypothesis-generated tables written to a scratch fixture dir,
each registered query checked against a plain-Python reference
implementation of the estimator's DEFINITION — independent of both
the Spark plan and the DuckDB oracle, so a shared misreading can't
hide. Integer outputs compare exactly; ROUND(.,4) floats compare to
1e-4 (the op ORDER of double sums may differ from Python's)."""

from __future__ import annotations

import datetime as dt
import math
import os
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_BASE = dt.date(2024, 1, 1)


def _fixture_dir(spark, tmp_path_factory, tables: dict[str, tuple]) -> str:
    d = tmp_path_factory.mktemp("propfx")
    for name, (rows, schema) in tables.items():
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(str(d), f"{name}.parquet"))
    return str(d)


# ---------------------------------------------------------------------------
# Kaplan–Meier vs a naive per-customer Python replay
# ---------------------------------------------------------------------------

_km_orders = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 30)),  # (custkey, day)
    min_size=1,
    max_size=40,
)


@given(rows=_km_orders)
@settings(**_SETTINGS)
def test_kaplan_meier_matches_naive(spark, tmp_path_factory, rows):
    from airline_dataset_hadoop_public_spark.plans.fixtures_statistics import (
        orders_repeat_kaplan_meier,
    )

    orders = [
        (i, c, "O", 1.0, _BASE + dt.timedelta(days=day), "3-MEDIUM")
        for i, (c, day) in enumerate(rows)
    ]
    sf = _fixture_dir(
        spark,
        tmp_path_factory,
        {
            "orders": (
                orders,
                "o_orderkey long, o_custkey long, o_orderstatus string, "
                "o_totalprice double, o_orderdate date, "
                "o_orderpriority string",
            )
        },
    )
    got = {
        r["duration_days"]: (r["n_events"], r["n_at_risk"], r["survival"])
        for r in orders_repeat_kaplan_meier(spark, sf).collect()
    }

    # naive: per customer (first, second) by (day, orderkey), censor at dmax
    by_c = defaultdict(list)
    for i, (c, day) in enumerate(rows):
        by_c[c].append((day, i))
    dmax = max(day for _, day in rows)
    per = []
    for c, ds in by_c.items():
        ds.sort()
        if len(ds) >= 2:
            per.append((ds[1][0] - ds[0][0], 1))
        else:
            per.append((dmax - ds[0][0], 0))
    agg = defaultdict(lambda: [0, 0])  # dur -> [d_t, all_t]
    for dur, ev in per:
        agg[dur][0] += ev
        agg[dur][1] += 1
    expect = {}
    s = 1.0
    remaining = len(per)
    for dur in sorted(agg):
        d_t, all_t = agg[dur]
        n_t = remaining
        if d_t > 0 and n_t > d_t:
            s *= 1.0 - d_t / n_t
            expect[dur] = (d_t, n_t, s)
        elif d_t > 0:  # terminal zero step: excluded by definition
            pass
        remaining -= all_t
    assert set(got) == set(expect)
    for dur, (d_t, n_t, s) in expect.items():
        gd, gn, gs = got[dur]
        assert (gd, gn) == (d_t, n_t), dur
        assert abs(gs - round(s, 4)) <= 1e-4, dur


# ---------------------------------------------------------------------------
# Mann–Whitney vs naive average-tied-rank computation
# ---------------------------------------------------------------------------

_mwu_rows = st.lists(
    st.tuples(
        st.booleans(),  # weekend?
        st.integers(0, 6),  # value from a small domain to force ties
    ),
    min_size=4,
    max_size=50,
).filter(
    lambda rs: any(w for w, _ in rs) and any(not w for w, _ in rs)
)


@given(rows=_mwu_rows)
@settings(**_SETTINGS)
def test_mann_whitney_matches_naive(spark, tmp_path_factory, rows):
    from airline_dataset_hadoop_public_spark.plans.fixtures_statistics import (
        events_mann_whitney_weekend,
    )

    sat = dt.datetime(2024, 1, 6, 12)  # Saturday
    mon = dt.datetime(2024, 1, 8, 12)  # Monday
    events = [
        (i, sat if wk else mon, 1, "view", float(v), "{}")
        for i, (wk, v) in enumerate(rows)
    ]
    sf = _fixture_dir(
        spark,
        tmp_path_factory,
        {
            "events": (
                events,
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string",
            )
        },
    )
    r = events_mann_whitney_weekend(spark, sf).collect()[0]

    vals = sorted(v for _, v in rows)
    # average rank per distinct value (exact rational via 2x)
    rank_x2 = {}
    pos = 0
    for v in sorted(set(vals)):
        c = vals.count(v)
        rank_x2[v] = 2 * pos + c + 1
        pos += c
    n1 = sum(1 for w, _ in rows if w)
    n2 = len(rows) - n1
    r1_x2 = sum(rank_x2[v] for w, v in rows if w)
    u1_x2 = r1_x2 - n1 * (n1 + 1)
    assert (r["n_weekend"], r["n_weekday"]) == (n1, n2)
    assert r["u1_x2"] == u1_x2
    n = n1 + n2
    tie = sum(
        vals.count(v) ** 3 - vals.count(v) for v in set(vals)
    )
    var = n1 * n2 / 12.0 * ((n + 1.0) - tie / (n * (n - 1.0)))
    if var > 0:
        z = (u1_x2 / 2.0 - n1 * n2 / 2.0) / math.sqrt(var)
        assert abs(r["z_score"] - round(z, 4)) <= 1e-4
    rb = 1.0 - u1_x2 / (n1 * n2)
    assert abs(r["rank_biserial"] - round(rb, 4)) <= 1e-4


# ---------------------------------------------------------------------------
# Hamilton apportionment: exact-total and quota-bound invariants
# ---------------------------------------------------------------------------

_lr_revs = st.lists(
    st.integers(1, 10_000), min_size=1, max_size=12
)


@given(revs=_lr_revs)
@settings(**_SETTINGS)
def test_largest_remainder_quota_invariants(spark, tmp_path_factory, revs):
    from airline_dataset_hadoop_public_spark.plans.fixtures_statistics import (
        _BUDGET_UNITS,
        nation_budget_largest_remainder,
    )

    nations = [(k, f"N{k:02d}", 0) for k in range(len(revs))]
    customers = [(k + 1, k, "X") for k in range(len(revs))]
    orders = [
        (k + 1, k + 1, "O", cents / 100.0, _BASE, "3-MEDIUM")
        for k, cents in enumerate(revs)
    ]
    sf = _fixture_dir(
        spark,
        tmp_path_factory,
        {
            "nation": (
                nations,
                "n_nationkey long, n_name string, n_regionkey long",
            ),
            "customer": (
                customers,
                "c_custkey long, c_nationkey long, c_mktsegment string",
            ),
            "orders": (
                orders,
                "o_orderkey long, o_custkey long, o_orderstatus string, "
                "o_totalprice double, o_orderdate date, "
                "o_orderpriority string",
            ),
        },
    )
    got = {
        r["nation"]: (r["revenue_cents"], r["alloc_units"])
        for r in nation_budget_largest_remainder(spark, sf).collect()
    }
    total = sum(revs)
    # invariant 1: the allocation sums to the budget EXACTLY
    assert sum(a for _, a in got.values()) == _BUDGET_UNITS
    # invariant 2 (quota rule): floor(q_i) <= alloc_i <= ceil(q_i)
    for k, cents in enumerate(revs):
        rev, alloc = got[f"N{k:02d}"]
        assert rev == cents
        lo = (_BUDGET_UNITS * cents) // total
        hi = lo + (1 if (_BUDGET_UNITS * cents) % total else 0)
        assert lo <= alloc <= hi, (k, lo, alloc, hi)


# ---------------------------------------------------------------------------
# Gini vs the naive sorted-rank formula
# ---------------------------------------------------------------------------

_gini_revs = st.lists(st.integers(1, 500), min_size=1, max_size=20)


@given(revs=_gini_revs)
@settings(**_SETTINGS)
def test_gini_matches_naive(spark, tmp_path_factory, revs):
    from airline_dataset_hadoop_public_spark.plans.fixtures_statistics import (
        orders_segment_revenue_gini,
    )

    customers = [(k + 1, 0, "SEG") for k in range(len(revs))]
    orders = [
        (k + 1, k + 1, "O", cents / 100.0, _BASE, "3-MEDIUM")
        for k, cents in enumerate(revs)
    ]
    sf = _fixture_dir(
        spark,
        tmp_path_factory,
        {
            "customer": (
                customers,
                "c_custkey long, c_nationkey long, c_mktsegment string",
            ),
            "orders": (
                orders,
                "o_orderkey long, o_custkey long, o_orderstatus string, "
                "o_totalprice double, o_orderdate date, "
                "o_orderpriority string",
            ),
        },
    )
    r = orders_segment_revenue_gini(spark, sf).collect()[0]
    xs = sorted(revs)
    n, tot = len(xs), sum(xs)
    gini = (2 * sum((i + 1) * x for i, x in enumerate(xs)) - (n + 1) * tot) / (
        n * tot
    )
    assert r["n_customers"] == n
    assert r["total_cents"] == tot
    assert abs(r["gini"] - round(gini, 4)) <= 1e-4
    assert 0.0 <= r["gini"] < 1.0


# ---------------------------------------------------------------------------
# Waterfall: per-month decomposition identity on random data
# ---------------------------------------------------------------------------

_wf_rows = st.lists(
    st.tuples(
        st.integers(0, 5),  # custkey
        st.integers(0, 3),  # month index
        st.integers(1, 1000),  # cents
    ),
    min_size=1,
    max_size=40,
)


@given(rows=_wf_rows)
@settings(**_SETTINGS)
def test_waterfall_identity_random(spark, tmp_path_factory, rows):
    from airline_dataset_hadoop_public_spark.plans.fixtures_product_analytics import (
        orders_revenue_bridge_waterfall,
    )

    orders = [
        (
            i + 1,
            c,
            "O",
            cents / 100.0,
            dt.date(2024, 1 + m, 5),
            "3-MEDIUM",
        )
        for i, (c, m, cents) in enumerate(rows)
    ]
    sf = _fixture_dir(
        spark,
        tmp_path_factory,
        {
            "orders": (
                orders,
                "o_orderkey long, o_custkey long, o_orderstatus string, "
                "o_totalprice double, o_orderdate date, "
                "o_orderpriority string",
            )
        },
    )
    got = {
        r["month"]: r for r in orders_revenue_bridge_waterfall(spark, sf).collect()
    }
    totals = defaultdict(int)
    for c, m, cents in rows:
        totals[f"2024-{1 + m:02d}"] += cents
    months = [f"2024-{m:02d}" for m in range(1, 6)]
    for i, mo in enumerate(months):
        if mo not in got:
            continue
        r = got[mo]
        prev = totals.get(months[i - 1], 0) if i > 0 else 0
        delta = totals.get(mo, 0) - prev
        assert (
            r["new_cents"]
            + r["expansion_cents"]
            - r["contraction_cents"]
            - r["churned_cents"]
            == delta
        ), mo
        # components are individually non-negative
        for col in (
            "new_cents",
            "expansion_cents",
            "contraction_cents",
            "churned_cents",
        ):
            assert r[col] >= 0, (mo, col)


# ---------------------------------------------------------------------------
# Frequent triples: BOTH physical branches vs a brute-force Python
# Apriori on random baskets (r7b — the cost-based branch must be a
# physical choice only, and each branch must match the definition)
# ---------------------------------------------------------------------------

_basket_rows = st.lists(
    st.tuples(
        st.integers(0, 5),  # custkey
        st.integers(0, 1),  # which of the customer's two orders
        st.integers(10, 17),  # partkey
    ),
    min_size=3,
    max_size=50,
)


@given(rows=_basket_rows)
@settings(**_SETTINGS)
def test_triple_itemsets_branches_match_bruteforce(
    spark, tmp_path_factory, rows, monkeypatch
):
    from itertools import combinations

    from airline_dataset_hadoop_public_spark.plans import fixtures_graph as g

    lineitem = [
        (c * 2 + o, p, 1, 1.0, 1.0, _BASE, c)
        for c, o, p in rows
    ]
    orders = [
        (c * 2 + o, c, 1.0, _BASE)
        for c in range(6)
        for o in (0, 1)
    ]
    sf = _fixture_dir(
        spark,
        tmp_path_factory,
        {
            "lineitem": (
                lineitem,
                "l_orderkey long, l_partkey long, l_suppkey long, "
                "l_quantity double, l_extendedprice double, "
                "l_shipdate date, l_linenumber long",
            ),
            "orders": (
                orders,
                "o_orderkey long, o_custkey long, o_totalprice double, "
                "o_orderdate date",
            ),
        },
    )

    baskets = defaultdict(set)
    for c, _o, p in rows:
        baskets[c].add(p)
    sup3 = defaultdict(int)
    for parts in baskets.values():
        for t in combinations(sorted(parts), 3):
            sup3[t] += 1
    want = sorted(
        ((a, b, c, s) for (a, b, c), s in sup3.items() if s >= 2),
        key=lambda r: (-r[3], r[0], r[1], r[2]),
    )[:20]

    for cap in (0, 10**15):  # dense branch, then sparse branch
        monkeypatch.setattr(g, "_TRIPLE_CAND_CAP", cap)
        got = [
            (r["part_a"], r["part_b"], r["part_c"], r["support"])
            for r in g.parts_copurchase_triple_itemsets(spark, sf).collect()
        ]
        assert got == want, (cap, got, want)
