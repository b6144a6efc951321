"""Sort / limit / top-k operators (SURVEY.md §2.4, T1-T4, X1).

The reference implements every ranking as a SECOND MapReduce job whose
single reducer holds a globally sorted in-memory map
(/root/reference/README.md:151,175,195) — a one-node bottleneck. Spark
replaces:

- global top-k (T1 Top10AirportsByArrivalsAndDepartures README.md:165,
  T2 Top10AirlinesByDelay README.md:189) with `orderBy().limit(k)`,
  which physically compiles to TakeOrderedAndProject: each partition
  keeps its local k, the driver merges k*numPartitions rows — no global
  sort, no single-reducer stage.
- grouped top-k (T3 Top10ReducerByFloatV1 README.md:195, used by the
  three Group-2 jobs) with a ranking window — one hash-shuffle on the
  partition key, heap-free.
- global full sort (T4 ArrivalsAndDeparturesPerAirportSortedByFrequency
  README.md:381-398, with its DescendingIntegerComparator) with
  `orderBy(desc)` — a range-partitioned distributed sort; the custom
  comparator is just a `desc()` expression.

Every function REQUIRES a deterministic total order: callers pass
tie-break columns because the reference's sorted-map semantics leave
tie order unspecified (SURVEY.md §2.4 note) and golden tests need
stability.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(order: Sequence[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order]


def global_top_k(df: DataFrame, order: Sequence[str | Column], k: int) -> DataFrame:
    """T1/T2: distributed top-k. `order` must be a total order."""
    return df.orderBy(*_cols(order)).limit(k)


def global_sort(df: DataFrame, order: Sequence[str | Column]) -> DataFrame:
    """T4: full distributed sort (range-partitioned exchange)."""
    return df.orderBy(*_cols(order))


def top_k_per_group(
    df: DataFrame,
    partition: Sequence[str],
    order: Sequence[str | Column],
    k: int,
    rn: str | None = None,
) -> DataFrame:
    """T3: keep the k first rows per group under `order`.

    One shuffle on `partition`; rank computed with row_number (dense
    per-group, no global coordination). Keeps the rank column iff `rn`
    is given.
    """
    w = Window.partitionBy(*partition).orderBy(*_cols(order))
    ranked = df.withColumn(rn or "__rn", F.row_number().over(w))
    out = ranked.filter(F.col(rn or "__rn") <= k)
    return out if rn else out.drop("__rn")


def rank_table(
    df: DataFrame, order: Sequence[str | Column], rank: str = "rank"
) -> DataFrame:
    """X1: global 1..N rank assignment (G3Q1 popularity ranks,
    /root/reference/README.md:375-427).

    A global row_number window is a single-partition sort — acceptable
    ONLY because rank tables in this family are group-key-domain sized
    (|airports|, |carriers| — thousands of rows), never fact-table
    sized. For fact-scale ranking use `rank_table_distributed`.
    """
    w = Window.orderBy(*_cols(order))
    return df.withColumn(rank, F.row_number().over(w))


def rank_table_distributed(
    df: DataFrame, order: Sequence[str | Column], rank: str = "rank"
) -> DataFrame:
    """Fact-scale global 1..N ranking without a single-partition window.

    Two passes over a range-partitioned sort: (1) count rows per sorted
    partition and broadcast the cumulative offsets (numPartitions rows
    through the driver — a scalar per task, not data); (2) per-partition
    row_number + offset. Every stage is partition-parallel; `order`
    must be a total order so ranks are deterministic.
    """
    # pin the range partitioning: both passes must see the SAME
    # partition assignment (a recompute could re-sample boundaries)
    ordered = (
        df.orderBy(*_cols(order))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # cumulative offset per sorted partition (partitions are emitted in
    # range order, so pid order == global sort order)
    sizes = ordered.groupBy("__pid").count().collect()
    offsets, acc = {}, 0
    for row in sorted(sizes, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["count"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(p, o) for p, o in offsets.items()], "__pid int, __off long"
    )
    w = Window.partitionBy("__pid").orderBy(*_cols(order))
    return (
        ordered.join(F.broadcast(off_df), "__pid")
        .withColumn(rank, (F.row_number().over(w) + F.col("__off")).cast("long"))
        .drop("__pid", "__off")
    )


def ntile_distributed(
    df: DataFrame,
    order: Sequence[str | Column],
    k: int,
    out: str = "ntile",
) -> DataFrame:
    """Exact NTILE(k) over a global order WITHOUT a single-partition
    window (Spark's `ntile().over(Window.orderBy(...))` coalesces the
    whole frame into one task — fine for a manifest, fatal for a
    billion-row customer table).

    Layout: `rank_table_distributed` supplies the global 1..N rank
    (range-partitioned sort + broadcast offsets), then the SQL NTILE
    bucket is a closed form of (rank, N): with q = N // k and
    r = N % k, the first r buckets hold q+1 rows —
    bucket = ceil(rank/(q+1)) while rank <= r*(q+1), else
    r + ceil((rank - r*(q+1))/q). Integer arithmetic end to end, so
    assignment is bit-identical to any engine's NTILE given the same
    total order (`order` must be total — include a key tie-break).
    """
    ranked = rank_table_distributed(df, order, rank="__rk")
    n = ranked.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    # integer `div`, NOT `/`: double division of longs near 2^53 can
    # round across the floor boundary (same hazard ceil_div below
    # works around), and a misrounded q shifts every bucket boundary
    q = F.expr(f"__n div {int(k)}")
    r = F.col("__n") % k
    big = r * (q + 1)  # rows living in the size-(q+1) buckets
    rk = F.col("__rk")

    def ceil_div(a, b):
        # exact for any long: subtract the remainder first so the
        # double division is of an exactly-divisible pair (a `/` of
        # non-divisible longs near 2^53 could round across the ceil
        # boundary — r5 review finding)
        m = a + b - F.lit(1)
        return ((m - m % b) / b).cast("long")

    bucket = F.when(rk <= big, ceil_div(rk, q + 1)).otherwise(
        r + ceil_div(rk - big, q)
    )
    return (
        ranked.join(F.broadcast(n), how="cross")
        .withColumn(out, bucket)
        .drop("__rk", "__n")
    )
