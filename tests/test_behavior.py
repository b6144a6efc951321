"""Behavior wave (fixtures_behavior.py): hand-computed cases for the
seasonal anomaly detector, trigram paths, and market-basket lift."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from airline_dataset_hadoop_public_spark.plans.fixtures_behavior import (
    events_seasonal_anomaly_hours,
    events_top_trigram_paths,
    parts_copurchase_lift,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


def test_seasonal_anomaly_hand_case(spark, tmp_path, monkeypatch):
    # hour 9 counts across 4 days: 2,2,2,14 → mu=5, σ²=(3·4+81)/3=…
    # exact: n=4, S1=20, S2=216; varnum=4·216−400=464
    # day 4 dev=4·14−20=36 → 36²·3=3888 > 4·4·464=7424? No → not 3888>7424
    # make it starker: counts 2,2,2,30 → S1=36, S2=912, varnum=2352
    # dev=4·30−36=84 → 84²·3=21168 > 16·2352=37632? still no (σ huge).
    # With one wild day among uniform days, 2σ on n=4 is hard to beat —
    # use 5 days: 2,2,2,2,22 → n=5 S1=30 S2=500 varnum=1600
    # dev=5·22−30=80 → 80²·4=25600 > 20·1600=32000? no. z_max for
    # n points has a known bound ((n−1)/√n ≈ 1.79 at n=5) — a single
    # outlier can NEVER exceed 2σ below n=6. Use n=10, nine 2s one 22:
    # S1=40, S2=520, varnum=3600; dev=10·22−40=180;
    # 180²·9=291600 > 40·3600=144000 ✓ outlier flagged; a "2" day:
    # dev=10·2−40=−20 → 400·9=3600 < 144000 ✓ not flagged.
    base = dt.datetime(2024, 1, 1, 9, 0, 0)
    rows = []
    eid = 0
    for day in range(10):
        k = 22 if day == 9 else 2
        for j in range(k):
            rows.append(
                (eid, base + dt.timedelta(days=day, seconds=j), 1, "click", 0.0, "{}")
            )
            eid += 1
    src = str(tmp_path / "ev")
    _ev(spark, rows).write.parquet(src)

    import airline_dataset_hadoop_public_spark.plans.fixtures_behavior as B

    monkeypatch.setattr(
        B, "load_table", lambda spark_, sf, name: spark_.read.parquet(src)
    )
    out = events_seasonal_anomaly_hours(spark, "unused").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["d"], r["h"], r["cnt"]) == ("2024-01-10", 9, 22)
    assert r["mu"] == pytest.approx(4.0)  # 40/10
    # sigma = sqrt(3600/90) ≈ 6.3246; z = 18/6.3246
    assert r["z"] == pytest.approx(round(18 / (3600 / 90) ** 0.5, 4))


def test_trigram_paths_hand_case(spark, tmp_path, monkeypatch):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, base, 1, "a", 0.0, "{}"),
        (1, base + dt.timedelta(minutes=1), 1, "b", 0.0, "{}"),
        (2, base + dt.timedelta(minutes=2), 1, "c", 0.0, "{}"),
        (3, base + dt.timedelta(minutes=3), 1, "a", 0.0, "{}"),
        (4, base, 2, "a", 0.0, "{}"),
        (5, base + dt.timedelta(minutes=1), 2, "b", 0.0, "{}"),
        (6, base + dt.timedelta(minutes=2), 2, "c", 0.0, "{}"),
    ]
    src = str(tmp_path / "ev")
    _ev(spark, rows).write.parquet(src)
    import airline_dataset_hadoop_public_spark.plans.fixtures_behavior as B

    monkeypatch.setattr(
        B, "load_table", lambda spark_, sf, name: spark_.read.parquet(src)
    )
    got = [
        (r["e1"], r["e2"], r["e3"], r["n"])
        for r in events_top_trigram_paths(spark, "unused").collect()
    ]
    assert got == [("a", "b", "c", 2), ("b", "c", "a", 1)]


def test_copurchase_lift_hand_case(spark, monkeypatch):
    # orders: {1,2}, {1,2}, {1,3}, {2,3}, {3} → N=5
    # sup: 1→3, 2→3, 3→3; pairs(≥2): (1,2)→2 only
    # conf = 2/3 → 6666 bp; lift = 2·5/(3·3) = 10/9 → 11111 bp
    rows = [
        (10, 1), (10, 2),
        (11, 1), (11, 2),
        (12, 1), (12, 3),
        (13, 2), (13, 3),
        (14, 3), (14, 3),  # duplicate line: DISTINCT collapses it
    ]
    li = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    import airline_dataset_hadoop_public_spark.plans.fixtures_behavior as B

    monkeypatch.setattr(B, "load_table", lambda spark_, sf, name: li)
    got = [tuple(r) for r in parts_copurchase_lift(spark, "unused").collect()]
    assert got == [(1, 2, 2, 6666, 11111)]


def test_lift_plan_expands_pairs_in_partition(spark, monkeypatch):
    li = spark.createDataFrame([(1, 1), (1, 2)], ["l_orderkey", "l_partkey"])
    import airline_dataset_hadoop_public_spark.plans.fixtures_behavior as B

    monkeypatch.setattr(B, "load_table", lambda spark_, sf, name: li)
    plan = (
        parts_copurchase_lift(spark, "unused")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # no self-join of the membership table: pair expansion is the
    # in-partition generate over the collected order basket
    assert "Generate" in plan and "PythonUDF" not in plan


def test_weighted_sample_favors_long_docs(spark, monkeypatch):
    """Statistical sanity: with weights n_chars, the ES top-k's mean
    length exceeds the corpus mean (length-proportional inclusion),
    and the result is a deterministic function of doc_id."""
    from airline_dataset_hadoop_public_spark.plans.fixtures_behavior import (
        docs_weighted_sample,
    )
    import airline_dataset_hadoop_public_spark.plans.fixtures_behavior as B

    rows = [(i, 10 if i % 2 else 1000) for i in range(400)]
    docs = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    monkeypatch.setattr(B, "load_table", lambda spark_, sf, name: docs)
    out = docs_weighted_sample(spark, "unused").collect()
    assert len(out) == 100
    assert [r["rank"] for r in out[:3]] == [1, 2, 3]
    long_frac = sum(1 for r in out if r["n_chars"] == 1000) / 100
    assert long_frac > 0.8  # 100x weight ratio dominates the sample
    # determinism: second run returns the identical sample
    again = docs_weighted_sample(spark, "unused").collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in out]


def test_holt_hand_case(spark):
    """x=[4,8,10]: l=[4,6,8.5], b=[0,1,1.75] under alpha=beta=0.5."""
    from airline_dataset_hadoop_public_spark.operators.timeseries import (
        holt_per_key,
    )

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=i), float(v))
         for i, v in enumerate([4, 8, 10])],
        ["user_id", "ts", "value"],
    )
    rows = holt_per_key(df, "user_id", "ts", "value").orderBy("ts").collect()
    assert [(r["level"], r["trend"]) for r in rows] == [
        (4.0, 0.0),
        (6.0, 1.0),
        (8.5, 1.75),
    ]


def test_eventually_follows_hand_case(spark, tmp_path, monkeypatch):
    # user 1: a@0, b@1, a@2  → a⇝a (0<2), a⇝b (0<1), b⇝a (1<2),
    #   plus b⇝b? min_b=1 < max_b=1 false. a⇝a: min_a=0 < max_a=2 ✓
    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, base, 1, "a", 0.0, "{}"),
        (1, base + dt.timedelta(minutes=1), 1, "b", 0.0, "{}"),
        (2, base + dt.timedelta(minutes=2), 1, "a", 0.0, "{}"),
    ]
    src = str(tmp_path / "ev")
    _ev(spark, rows).write.parquet(src)
    import airline_dataset_hadoop_public_spark.plans.fixtures_behavior as B

    monkeypatch.setattr(
        B, "load_table", lambda spark_, sf, name: spark_.read.parquet(src)
    )
    got = {
        (r["e_from"], r["e_to"]): r["n_users"]
        for r in B.events_eventually_follows(spark, "unused").collect()
    }
    assert got == {("a", "a"): 1, ("a", "b"): 1, ("b", "a"): 1}


def test_ab_ztest_hand_case(spark, tmp_path, monkeypatch):
    """2 users per variant; conversions (>=14 purchases): variant 0 →
    1 of 2, variant 1 → 2 of 2. z = (0.5-1)/sqrt(0.75·0.25·(1/2+1/2))."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid, n_purch in [(0, 20), (2, 3), (1, 15), (3, 14)]:
        for j in range(n_purch):
            rows.append(
                (eid, base + dt.timedelta(seconds=eid), uid, "purchase", 0.0, "{}")
            )
            eid += 1
    src = str(tmp_path / "ev")
    _ev(spark, rows).write.parquet(src)
    import airline_dataset_hadoop_public_spark.plans.fixtures_behavior as B

    monkeypatch.setattr(
        B, "load_table", lambda spark_, sf, name: spark_.read.parquet(src)
    )
    r = B.events_ab_conversion_ztest(spark, "unused").collect()[0]
    assert (r["n1"], r["c1"], r["n2"], r["c2"]) == (2, 1, 2, 2)
    import math

    expect = (0.5 - 1.0) / math.sqrt(0.75 * 0.25 * (0.5 + 0.5))
    assert r["z"] == pytest.approx(round(expect, 4))
