"""r9 wave: the two-level grouped top-k heap
(`operators.topk.top_k_per_group_distributed`) that replaced the r8
judge's four remaining Gini-class window sites (KMV sketch builds x2,
winsorized-stats histogram walk, per-stratum weighted reservoir),
pinned against the plain-window semantics it must reproduce
bit-for-bit, plus the ntile integer-`div` regression guards (ADVICE
r8) and the running-sums dtype contract."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from airline_dataset_hadoop_public_spark.operators.topk import (
    ntile_bucket,
    ordered_prefix_distributed,
    top_k_per_group_distributed,
)


def _noisy(spark, n=600, groups=("a", "b", "c", None), seed=9):
    """Heavy ties, a NULL group, a total-order tie-break key, and many
    input partitions so the level-1 local heaps actually split work."""
    rng = random.Random(seed)
    rows = [
        Row(g=groups[i % len(groups)], v=rng.randint(0, 15), k=i)
        for i in range(n)
    ]
    return spark.createDataFrame(rows).repartition(13)


def _norm(rows):
    return sorted((tuple(r) for r in rows), key=repr)


def _plain_topk(df, partition, order, k, rn):
    w = Window.partitionBy(*partition).orderBy(*order)
    return df.withColumn(rn, F.row_number().over(w)).filter(F.col(rn) <= k)


@pytest.mark.parametrize("k", [1, 3, 17])
def test_two_level_topk_matches_plain_window(spark, k):
    df = _noisy(spark)
    got = top_k_per_group_distributed(
        df, ["g"], ["v", "k"], k, rn="rn"
    ).collect()
    want = _plain_topk(df, ["g"], [F.col("v"), F.col("k")], k, "rn").collect()
    assert _norm(got) == _norm(want)


def test_two_level_topk_groups_smaller_than_k_keep_everything(spark):
    """Ranks up to the group size must be TRUE ranks even when the
    group holds fewer than k rows — the KMV `rn == least(k, n)`
    readout depends on nothing being pruned below capacity."""
    df = _noisy(spark, n=24, groups=("x", "y"))
    got = top_k_per_group_distributed(df, ["g"], ["v", "k"], 100, rn="rn")
    want = _plain_topk(df, ["g"], [F.col("v"), F.col("k")], 100, "rn")
    assert _norm(got.collect()) == _norm(want.collect())
    assert got.count() == 24  # nothing pruned


def test_two_level_topk_desc_order_and_drop_rn(spark):
    df = _noisy(spark, groups=("a", "b"))
    got = top_k_per_group_distributed(
        df, ["g"], [F.desc("v"), F.asc("k")], 5
    )
    assert "__rn" not in got.columns and "rn" not in got.columns
    want = _plain_topk(
        df, ["g"], [F.desc("v"), F.asc("k")], 5, "rn"
    ).drop("rn")
    assert _norm(got.collect()) == _norm(want.collect())


def test_two_level_topk_empty_input(spark):
    df = _noisy(spark, n=4).filter(F.lit(False))
    assert top_k_per_group_distributed(df, ["g"], ["v", "k"], 3).count() == 0


def test_two_level_topk_plan_is_two_bounded_windows(spark):
    """Plan contract: level 1 keys its window by (__tkpid, group) —
    frames bounded by one input partition — and the only other window
    ranks the post-prune survivors (<= k * numPartitions per group)."""
    df = _noisy(spark)
    plan = (
        top_k_per_group_distributed(df, ["g"], ["v", "k"], 3, rn="rn")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    lines = [ln for ln in plan.splitlines() if "windowspecdefinition(" in ln]
    assert len(lines) == 2
    assert sum("__tkpid" in ln for ln in lines) == 1


# --- ntile integer division (ADVICE r8: q reverted to a double `/`) --------


def test_ntile_bucket_is_integral_divide_in_plan(spark):
    """The quotient q and ceil_div must compile to IntegralDivide
    (` div `), never a double `/` whose long-to-double cast rounds
    above 2^53."""
    df = spark.range(10).select(
        F.col("id").alias("rk"), F.lit(10).cast("long").alias("n")
    )
    col = ntile_bucket(F.col("rk"), F.col("n"), 3)
    plan = df.select(col.alias("b"))._jdf.queryExecution().analyzed().toString()
    assert " div " in plan
    assert "/" not in plan.split("AS b")[0].replace("//", "")


@pytest.mark.parametrize("n,k", [(10, 3), (7, 7), (5, 8), (1, 2), (97, 10)])
def test_ntile_bucket_matches_sql_ntile(spark, n, k):
    df = spark.range(1, n + 1).select(F.col("id").alias("v"))
    w = Window.orderBy("v")
    want = df.select("v", F.ntile(k).over(w).alias("b")).collect()
    ranked = df.select(
        "v",
        F.row_number().over(w).cast("long").alias("rk"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    got = ranked.select(
        "v", ntile_bucket(F.col("rk"), F.col("n"), k).alias("b")
    ).collect()
    assert _norm(got) == _norm(want)


def test_ntile_bucket_exact_above_2_53():
    """Pure driver-side arithmetic check of the closed form at a scale
    where double division would misplace boundaries: the bucket of the
    last row must be k, and boundaries must match exact integer math."""
    n = (1 << 55) + 3  # N - N%k not representable exactly as double
    k = 7
    q, r = divmod(n, k)
    # closed form evaluated with Python ints (what `div` computes)
    def bucket(rank):
        big = r * (q + 1)
        if rank <= big:
            return -(-rank // (q + 1))
        return r + -(-(rank - big) // q)

    assert bucket(1) == 1
    assert bucket(n) == k
    assert bucket(r * (q + 1)) == r
    assert bucket(r * (q + 1) + 1) == r + 1


# --- running-sums dtype contract (ADVICE r8: float offsets) ----------------


def test_ordered_prefix_rejects_float_running_sums(spark):
    df = spark.createDataFrame(
        [Row(g="a", v=1, x=1.5), Row(g="a", v=2, x=2.5)]
    )
    with pytest.raises(TypeError, match="integral or decimal"):
        ordered_prefix_distributed(
            df, order=["v"], partition_by=["g"], running_sums={"x": "run"}
        )
