"""r8 wave: the two-pass range-partitioned rank/prefix-sum helper
(`operators.topk.ordered_prefix_distributed`) that replaced the r7
judge's three single-partition-window findings, pinned against the
plain-window semantics it must reproduce bit-for-bit."""

from __future__ import annotations

import random
from decimal import Decimal

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from airline_dataset_hadoop_public_spark.operators.topk import (
    ordered_prefix_distributed,
)


def _noisy(spark, n=500, groups=None, seed=8):
    """Rows with heavy ties and a total-order tie-break key, spread
    over many input partitions so the range exchange actually routes."""
    rng = random.Random(seed)
    rows = [
        Row(
            g=(groups[i % len(groups)] if groups else "all"),
            v=rng.randint(0, 20),
            k=i,
            amt=rng.randint(-50, 1000),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows).repartition(13)


def test_global_rank_and_running_sum_match_plain_window(spark):
    df = _noisy(spark)
    got = (
        ordered_prefix_distributed(
            df, order=["v", "k"], rank="r", running_sums={"amt": "run"}
        )
        .select("k", "r", "run")
        .collect()
    )
    w = Window.orderBy("v", "k")
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = (
        df.select(
            "k",
            F.row_number().over(w).cast("long").alias("r"),
            F.sum("amt").over(wr).alias("run"),
        ).collect()
    )
    assert sorted(got) == sorted(want)


def test_grouped_desc_rank_matches_plain_window(spark):
    df = _noisy(spark, groups=["a", "b", "c", "d", "e"])
    got = (
        ordered_prefix_distributed(
            df,
            order=[F.desc("v"), F.asc("k")],
            partition_by=["g"],
            rank="r",
            running_sums={"amt": "run"},
        )
        .select("g", "k", "r", "run")
        .collect()
    )
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("k"))
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = (
        df.select(
            "g",
            "k",
            F.row_number().over(w).cast("long").alias("r"),
            F.sum("amt").over(wr).alias("run"),
        ).collect()
    )
    assert sorted(got) == sorted(want)


def test_decimal_running_sum_and_nulls(spark):
    # decimal offsets cross the driver as Decimal, and NULL values must
    # contribute nothing to the running sum (SUM semantics) on both the
    # window side and the offset-accumulation side
    rows = [Row(k=i, d=(None if i % 7 == 0 else Decimal(i * 3))) for i in range(80)]
    df = spark.createDataFrame(
        rows, "k long, d decimal(38,0)"
    ).repartition(9)
    got = (
        ordered_prefix_distributed(
            df, order=["k"], rank=None, running_sums={"d": "run"}
        )
        .select("k", "run")
        .collect()
    )
    wr = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.select("k", F.sum("d").over(wr).alias("run")).collect()
    assert sorted(got, key=lambda r: r["k"]) == sorted(
        want, key=lambda r: r["k"]
    )


def test_empty_input(spark):
    df = spark.createDataFrame([], "g string, v long, k long")
    out = ordered_prefix_distributed(
        df, order=["v", "k"], partition_by=["g"], rank="r",
        running_sums={"v": "run"},
    )
    assert out.count() == 0
    assert {"r", "run"} <= set(out.columns)


def test_rank_spans_partition_boundaries(spark):
    # the whole point of the helper: with enough rows per shuffle
    # partition, ranks must compose ACROSS partitions via the offsets,
    # not restart at 1 — verify the global rank set is exactly 1..N
    df = _noisy(spark, n=300)
    ranks = [
        r["r"]
        for r in ordered_prefix_distributed(df, order=["v", "k"], rank="r")
        .select("r")
        .collect()
    ]
    assert sorted(ranks) == list(range(1, 301))
