"""Round-6 pins: the four ADVICE.md (r5) findings stay fixed.

1. Skyline SFS ordering — equal-ROUNDED-sum dominators must still
   precede the points they dominate (medium finding: the float64
   preference sum ties past 2^53, and the old stable argsort could
   emit the dominated point first, leaking it into the skyline).
2. ntile_distributed's q = floor(N/k) must use integer `div`, not
   double `/` (low finding: near-2^53 double division rounds across
   the floor boundary and shifts every bucket).
3. CUSUM zero-variance guard must compare in a 128-bit-class domain
   (low finding: BIGINT s*s wraps silently under Spark's non-ANSI
   multiply once Σc > ~3.04e9, while DuckDB raises — engine/oracle
   divergence exactly at claimed scale).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# 1. skyline tie-break
# ---------------------------------------------------------------------------


def test_skyline_equal_rounded_sum_dominator_still_wins_kernel():
    from airline_dataset_hadoop_public_spark.operators.skyline import _sfs_kernel

    # ADVICE.md's exact construction: dims (5e15, 4.5e15+1) dominates
    # (5e15, 4.5e15); both per-dim values are inside the exact-double
    # domain, but the two sums round to the same float64.
    dominator = (5e15, 4.5e15 + 1)
    dominated = (5e15, 4.5e15)
    assert (
        np.float64(dominator[0]) + np.float64(dominator[1])
        == np.float64(dominated[0]) + np.float64(dominated[1])
    ), "fixture must exercise the rounded-sum tie"
    # dominated listed FIRST so a stable sum-only sort would keep it
    pdf = pd.DataFrame(
        {
            "x": [dominated[0], dominator[0]],
            "y": [dominated[1], dominator[1]],
            "id": ["dominated", "dominator"],
        }
    )
    kernel = _sfs_kernel(["x", "y"], [1.0, 1.0])
    out = pd.concat(list(kernel(iter([pdf]))), ignore_index=True)
    assert list(out["id"]) == ["dominator"]


def test_skyline_equal_rounded_sum_dominator_still_wins_operator(spark):
    from airline_dataset_hadoop_public_spark.operators.skyline import skyline

    rows = [
        (float(5e15), float(4.5e15), "dominated"),
        (float(5e15), float(4.5e15 + 1), "dominator"),
        (1.0, 1.0, "small"),
    ]
    df = spark.createDataFrame(rows, "x double, y double, id string")
    got = sorted(r["id"] for r in skyline(df, maximize=["x", "y"]).collect())
    assert got == ["dominator"]


def test_skyline_lexsort_tiebreak_random_ties_match_naive():
    """Property sweep on a tie-rich integer grid: kernel == O(n^2) naive."""
    from airline_dataset_hadoop_public_spark.operators.skyline import _sfs_kernel

    rng = np.random.RandomState(7)
    for trial in range(20):
        # tiny integer domain → many equal-sum groups
        pts = rng.randint(0, 4, size=(30, 3)).astype(float)
        pdf = pd.DataFrame(pts, columns=["a", "b", "c"])
        pdf["id"] = range(len(pdf))
        kernel = _sfs_kernel(["a", "b", "c"], [1.0, 1.0, 1.0])
        got = sorted(
            pd.concat(list(kernel(iter([pdf]))), ignore_index=True)["id"]
        )
        naive = []
        for i in range(len(pts)):
            dominated = any(
                (pts[j] >= pts[i]).all() and (pts[j] > pts[i]).any()
                for j in range(len(pts))
            )
            if not dominated:
                naive.append(i)
        assert got == naive, f"trial {trial}"


# ---------------------------------------------------------------------------
# 2. ntile q via integer div
# ---------------------------------------------------------------------------


def test_ntile_q_integer_div_near_2p53(spark):
    # n = 2^53 + 3 rounds to 2^53 + 4 as a double (ties-to-even), so the
    # old (n / 2).cast(long) path returns floor+1; `div` stays exact.
    n = 2**53 + 3
    df = spark.createDataFrame([(n,)], "__n long")
    row = df.select(
        F.expr("__n div 2").alias("exact"),
        (F.col("__n") / 2).cast("long").alias("via_double"),
    ).first()
    assert row["exact"] == n // 2
    assert row["via_double"] == n // 2 + 1, (
        "double division no longer misrounds here — if Spark changed "
        "semantics, the ntile_distributed comment should be revisited"
    )


# ---------------------------------------------------------------------------
# 3. CUSUM variance guard in a wide domain
# ---------------------------------------------------------------------------


def test_variance_guard_wide_domain_no_wraparound(spark):
    # Two hourly cells of 0 and 4e9 events: real variance, but BIGINT
    # s*s = 1.6e19 wraps negative under non-ANSI multiply, so the old
    # guard could misfire. ss*n = 3.2e19 also exceeds int64.
    big = 4_000_000_000
    series = spark.createDataFrame(
        [("k", 0), ("k", big), ("z", big), ("z", big)], "k string, c long"
    )
    stats = series.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("ss"),
    )
    kept = sorted(
        r["k"]
        for r in stats.filter(
            F.col("ss") * F.col("n")
            > F.col("s").cast("decimal(38,0)") * F.col("s")
        ).collect()
    )
    # k has variance → kept; z is constant (4e9, 4e9) → dropped, even
    # though every BIGINT product in sight would have wrapped
    assert kept == ["k"]

    # and the hazard is real: the narrow-domain product either raises
    # ARITHMETIC_OVERFLOW (ANSI mode — Spark 4 default, a crash at
    # scale) or wraps negative (non-ANSI — a silent guard misfire)
    try:
        wrapped = (
            stats.filter(F.col("k") == "z")
            .select((F.col("s") * F.col("s")).alias("ss_bigint"))
            .first()["ss_bigint"]
        )
    except Exception as exc:  # noqa: BLE001 — Py4J surfaces SparkArithmeticException
        assert "ARITHMETIC_OVERFLOW" in str(exc)
    else:
        assert wrapped < 0, "expected BIGINT wrap under non-ANSI multiply"
