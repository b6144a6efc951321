"""Time-series resampling operators: fixed-interval spine generation,
gap-filling, and forward-fill.

The reference (/root/reference/README.md) has no time-series surface —
its only temporal logic is per-day equi-keys in the G3Q2 join
(README.md:542-543). A production event pipeline needs regularized
series (monitoring rollups, feature windows for training data), so
these are extension operators per SURVEY.md §7.4.

Scale design (100 TB):
- The spine is calendar-bounded: |buckets| = time-range / interval,
  independent of fact cardinality — a month of 15-minute buckets is
  ~2.9k rows, a decade ~350k. Always broadcastable.
- The per-bucket aggregate output is at most |keys| x |buckets| rows,
  also calendar-bounded for low-cardinality keys; the only fact-sized
  work is the groupBy, which hash-partitions on (key, bucket) with
  map-side partial aggregation.
- The forward-fill window partitions by key over the calendar-bounded
  frame — never over raw facts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucket_start(ts: Column, seconds: int) -> Column:
    """Epoch-aligned bucket start (same alignment as DuckDB's
    time_bucket and Spark's window() — multiples of `seconds` since
    1970-01-01 00:00:00 UTC)."""
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(ts) / seconds).cast("long") * seconds
    )


def time_spine(df: DataFrame, ts_col: str, seconds: int) -> DataFrame:
    """One row per `seconds`-wide bucket covering [min(ts), max(ts)].

    Single-row aggregate then sequence+explode — the spine never
    touches the driver and is tiny by construction.
    """
    return (
        df.agg(
            bucket_start(F.min(ts_col), seconds).alias("t0"),
            bucket_start(F.max(ts_col), seconds).alias("t1"),
        )
        .select(
            F.explode(
                F.sequence(
                    F.col("t0"),
                    F.col("t1"),
                    F.expr(f"INTERVAL {seconds} SECONDS"),
                )
            ).alias("bucket")
        )
    )


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    seconds: int,
    sum_round: int | None = None,
) -> DataFrame:
    """Regularize an event stream to a fixed grid per key.

    Output: (key, bucket, n_obs, avg_value_ffill) — one row per
    (key, bucket) on the full grid; empty buckets get n_obs = 0 and
    the forward-filled running average (null before the first
    observation of that key).

    ``sum_round``: when set, the bucket average is computed as
    ROUND(SUM(value), sum_round) / COUNT — for fixed-decimal inputs
    (e.g. 2-decimal amounts with sum_round=2) the quantized sum is
    engine-order-independent, so the average is bit-identical across
    engines. Plain AVG parks k-decimal data exactly on rounding
    boundaries (sum/2^k effects), where per-engine summation-order
    ulp noise flips a downstream ROUND — 63 of 14.4k rows at sf0.1.
    """
    if sum_round is None:
        avg_expr = F.avg(value_col)
    else:
        avg_expr = F.round(F.sum(value_col), sum_round) / F.count(F.lit(1))
    agg = df.groupBy(
        F.col(key_col).alias("key"),
        bucket_start(F.col(ts_col), seconds).alias("bucket"),
    ).agg(
        F.count("*").alias("n_obs"),
        avg_expr.alias("avg_value"),
    )
    grid = (
        df.select(F.col(key_col).alias("key"))
        .distinct()
        .crossJoin(F.broadcast(time_spine(df, ts_col, seconds)))
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(agg, ["key", "bucket"], "left")
        .select(
            "key",
            "bucket",
            F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
            F.last("avg_value", ignorenulls=True).over(w).alias("avg_value_ffill"),
        )
    )


def ewma_per_key(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    out: str = "ewma",
    impl: str = "streamed",
) -> DataFrame:
    """Per-key exponentially-weighted moving average, exact recurrence
    y_t = alpha*x_t + (1-alpha)*y_{t-1} (y_0 = x_0), ordered by
    (ts, value). A window function cannot express the recurrence
    without exponentially-scaled weights that overflow on long series.

    Three implementations, same semantics and the same single shuffle:

    - ``streamed`` (default since r7): sorted-stream fold with the
      accumulator carried across Arrow batches (`_streamed_fold`) —
      peak memory one batch regardless of key length, identical IEEE
      sequence (bit-equal to packed, pytest-pinned). Also measured
      FASTER than packed at sf0.1 (0.50s vs 0.62s): it skips the
      collect_list materialization and the posexplode.
    - ``packed``: collect each key's sorted series into one array
      row, fold all series in ONE Arrow-batched kernel call,
      posexplode back. ~4x faster than grouped-pandas at sf0.1 —
      ``applyInPandas`` flushes a separate Arrow batch per GROUP, and
      with thousands of small groups that per-group overhead dominates
      the actual fold. Requires each key's series to fit in a row
      (the usual collect_list contract) — a hot key is one task's OOM,
      which is why it lost the default to streamed.
    - ``grouped_pandas``: ``groupBy().applyInPandas`` streaming one
      group at a time — NOTE this still materializes each GROUP as
      one pandas frame, so a hot key is still one task's memory.
    """
    if impl == "streamed":

        def ewma_chunk(x: np.ndarray, st):
            y = np.empty_like(x)
            acc = 0.0 if st is None else st
            first = st is None
            for i, v in enumerate(x):
                if first and i == 0:
                    acc = v
                else:
                    acc = alpha * v + (1.0 - alpha) * acc
                y[i] = acc
            return {out: y}, acc

        return _streamed_fold(df, key_col, ts_col, value_col, ewma_chunk, [out])

    if impl == "grouped_pandas":
        # derive the output schema from the INPUT types — hardcoding
        # 'long/timestamp/double' silently narrowed the accepted key
        # and ts types versus the type-generic packed path
        in_schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        schema = (
            f"{key_col} {in_schema[key_col]}, {ts_col} {in_schema[ts_col]}, "
            f"{value_col} double, {out} double"
        )

        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values([ts_col, value_col], kind="mergesort")
            x = pdf[value_col].to_numpy(dtype=np.float64)
            y = np.empty_like(x)
            acc = 0.0
            for i, v in enumerate(x):
                acc = v if i == 0 else alpha * v + (1.0 - alpha) * acc
                y[i] = acc
            pdf = pdf[[key_col, ts_col, value_col]].copy()
            pdf[out] = y
            return pdf

        return (
            df.select(key_col, ts_col, value_col)
            .groupBy(key_col)
            .applyInPandas(fold, schema=schema)
        )

    def fold_arrays(series: pd.Series) -> pd.Series:  # noqa: F821
        outv = []
        for xs in series:
            x = np.asarray(xs, dtype=np.float64)
            y = np.empty_like(x)
            acc = 0.0
            for i, v in enumerate(x):
                acc = v if i == 0 else alpha * v + (1.0 - alpha) * acc
                y[i] = acc
            outv.append(y)
        return pd.Series(outv)

    kernel = F.pandas_udf(fold_arrays, "array<double>")
    packed = df.groupBy(key_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(ts_col), F.col(value_col)))
        ).alias("__s")
    )
    folded = packed.select(
        key_col,
        F.expr(f"transform(__s, e -> e.{ts_col})").alias("__ts"),
        F.expr(f"transform(__s, e -> e.{value_col})").alias("__xs"),
    ).withColumn("__ys", kernel(F.col("__xs")))
    return folded.select(
        key_col,
        F.posexplode(F.arrays_zip("__ts", "__xs", "__ys")).alias("__i", "__z"),
    ).select(
        key_col,
        F.col("__z.__ts").alias(ts_col),
        F.col("__z.__xs").alias(value_col),
        F.col("__z.__ys").alias(out),
    )


def holt_per_key(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    impl: str = "streamed",
) -> DataFrame:
    """Per-key Holt double exponential smoothing (level + trend),
    exact recurrence with alpha = beta = 0.5 (both smoothing products
    are exact halvings, so every fold step is a fixed sequence of
    identically-rounded IEEE adds — the same bit-exactness contract as
    ewma_per_key, see the alpha=0.5 note there):

        l_0 = x_0, b_0 = 0
        l_t = 0.5·x_t + 0.5·(l_{t-1} + b_{t-1})
        b_t = 0.5·(l_t − l_{t-1}) + 0.5·b_{t-1}

    One shuffle on the key either way. Output adds (level, trend)
    columns; rows ordered within key by (ts, value).

    ``impl="streamed"`` (default since r7) carries the (level, trend)
    pair across Arrow batches over the sorted row stream — bounded
    memory for hot keys, identical IEEE sequence (see
    `_streamed_fold`), and measured faster than packed at sf0.1
    (0.44s vs 0.70s). ``impl="packed"`` keeps the collect-fold-explode
    layout (whole key in one array cell).
    """
    if impl == "streamed":

        def holt_chunk(x: np.ndarray, st):
            lv = np.empty_like(x)
            tr = np.empty_like(x)
            if st is None:
                l, b = x[0], 0.0
                lv[0], tr[0] = l, b
                start = 1
            else:
                l, b = st
                start = 0
            for i in range(start, len(x)):
                prev = l + b
                l_new = 0.5 * x[i] + 0.5 * prev
                b = 0.5 * (l_new - l) + 0.5 * b
                l = l_new
                lv[i], tr[i] = l, b
            return {"level": lv, "trend": tr}, (l, b)

        return _streamed_fold(
            df, key_col, ts_col, value_col, holt_chunk, ["level", "trend"]
        )

    def fold_arrays(series: pd.Series) -> pd.Series:
        outv = []
        for xs in series:
            x = np.asarray(xs, dtype=np.float64)
            lv = np.empty_like(x)
            tr = np.empty_like(x)
            l = x[0]
            b = 0.0
            lv[0], tr[0] = l, b
            for i in range(1, len(x)):
                prev = l + b
                l_new = 0.5 * x[i] + 0.5 * prev
                b = 0.5 * (l_new - l) + 0.5 * b
                l = l_new
                lv[i], tr[i] = l, b
            outv.append(np.stack([lv, tr], axis=1))
        return pd.Series(outv)

    kernel = F.pandas_udf(fold_arrays, "array<array<double>>")
    packed = df.groupBy(key_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(ts_col), F.col(value_col)))
        ).alias("__s")
    )
    folded = packed.select(
        key_col,
        F.expr(f"transform(__s, e -> e.{ts_col})").alias("__ts"),
        F.expr(f"transform(__s, e -> e.{value_col})").alias("__xs"),
    ).withColumn("__ys", kernel(F.col("__xs")))
    return folded.select(
        key_col,
        F.posexplode(F.arrays_zip("__ts", "__xs", "__ys")).alias("__i", "__z"),
    ).select(
        key_col,
        F.col("__z.__ts").alias(ts_col),
        F.col("__z.__xs").alias(value_col),
        F.col("__z.__ys")[0].alias("level"),
        F.col("__z.__ys")[1].alias("trend"),
    )


def clamped_running_balance(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    delta_col: str,
    lo: float = 0.0,
    hi: float = 100.0,
    out: str = "balance",
    step: str = "step",
    impl: str = "streamed",
) -> DataFrame:
    """Per-key two-sided-clamped running balance, ordered by
    (ts, delta):  b_t = min(hi, max(lo, b_{t-1} + delta_t)),  b_{-1}=0.

    The inventory / quota / token-bucket walk. Unlike the one-sided
    Lindley recursion (CUSUM's prefix-reflection identity,
    fixtures_timeseries.py) a TWO-sided barrier has no prefix-scan
    closed form — each step's clamp depends on which barrier was hit
    last — so this is the honest tier-(b) operator per the build
    rules: built-ins genuinely can't express it, and the sequential
    fold runs as one Arrow-batched numpy kernel per key batch
    (``ewma_per_key``'s packed layout: collect each key's sorted
    series into one array row, fold all rows in one pandas_udf call,
    posexplode back — a single shuffle, per-key-linear work,
    partition-parallel across keys).

    Determinism contract: the (ts, delta) sort is total up to ties of
    identical (ts, delta) pairs, and swapping two identical steps
    leaves the balance SEQUENCE unchanged, so outputs are
    well-defined; the emitted ``step`` column (0-based walk position)
    is the only safe way to address "the final balance" — selecting
    by max (ts, delta) instead would pick an arbitrary member of a
    tied group, whose balances differ even though the rows don't;
    the walk itself is the same IEEE add/min/max sequence in any
    engine that orders the same way (the DuckDB oracle's recursive
    CTE reproduces it bit-exactly). NULL key/ts/delta rows must be
    dropped by the caller (FIXTURES.md §J).

    ``impl="streamed"`` (default since r7) runs the fold over the
    sorted row stream with the accumulator carried across Arrow
    batches — peak memory one batch, hot keys of any length safe;
    ``impl="packed"`` keeps the r6 collect_list layout (per-key
    series must fit in one array row). Both execute the identical
    per-element IEEE sequence and are pytest-pinned bit-equal.
    """
    if impl == "streamed":

        def clamp_chunk(x: np.ndarray, st):
            acc = 0.0 if st is None else st
            y = np.empty_like(x)
            for i, v in enumerate(x):
                acc = acc + v
                if acc < lo:
                    acc = lo
                elif acc > hi:
                    acc = hi
                y[i] = acc
            return {out: y}, acc

        return _streamed_fold(
            df, key_col, ts_col, delta_col, clamp_chunk, [out],
            with_step=True, step=step,
        )

    def fold_arrays(series: pd.Series) -> pd.Series:
        outv = []
        for xs in series:
            x = np.asarray(xs, dtype=np.float64)
            y = np.empty_like(x)
            acc = 0.0
            for i, v in enumerate(x):
                acc = acc + v
                if acc < lo:
                    acc = lo
                elif acc > hi:
                    acc = hi
                y[i] = acc
            outv.append(y)
        return pd.Series(outv)

    kernel = F.pandas_udf(fold_arrays, "array<double>")
    packed = df.groupBy(key_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(ts_col), F.col(delta_col)))
        ).alias("__s")
    )
    folded = packed.select(
        key_col,
        F.expr(f"transform(__s, e -> e.{ts_col})").alias("__ts"),
        F.expr(f"transform(__s, e -> e.{delta_col})").alias("__xs"),
    ).withColumn("__ys", kernel(F.col("__xs")))
    return folded.select(
        key_col,
        F.posexplode(F.arrays_zip("__ts", "__xs", "__ys")).alias("__i", "__z"),
    ).select(
        key_col,
        F.col("__i").cast("long").alias(step),
        F.col("__z.__ts").alias(ts_col),
        F.col("__z.__xs").alias(delta_col),
        F.col("__z.__ys").alias(out),
    )


# ---------------------------------------------------------------------------
# Streamed (bounded-memory) sequential folds — r7.
#
# The packed layout above collects each key's ENTIRE series into one
# array row, which is the fast shape at bench scale but makes a
# pathological key (one user with 1e9 events at 100 TB) a single
# task's OOM: Arrow's maxRecordsPerBatch caps ROWS, not array cells,
# so one giant array cell rides one batch no matter the cap. The
# streamed shape removes the bound entirely:
#
#   repartition(key)                      -- one shuffle, same as packed
#   sortWithinPartitions(key, ts, x)      -- key runs become contiguous
#   mapInPandas(fold)                     -- iterate Arrow batches IN
#                                            PARTITION ORDER, carrying
#                                            (key, fold state, step) across
#                                            batch boundaries
#
# Peak memory is one Arrow batch (spark.sql.execution.arrow.
# maxRecordsPerBatch rows) regardless of how long any key's series
# is. The per-element arithmetic is the IDENTICAL IEEE sequence as
# the packed kernels — the carried state is exactly the accumulator
# the packed loop would hold at the same position — so packed and
# streamed are bit-equal and both satisfy the same DuckDB oracle
# (pytest-pinned in tests/test_r7_ops.py, including a 1e6-event
# single key under a 10k-row Arrow batch cap).
# ---------------------------------------------------------------------------


def _streamed_fold(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    x_col: str,
    fold_chunk,
    out_fields: list[str],
    with_step: bool = False,
    step: str = "step",
):
    """Per-key ordered fold with bounded memory (see section comment).

    ``fold_chunk(x: np.float64[n], state) -> (dict[name -> np.float64[n]],
    new_state)`` folds one contiguous chunk of a single key's series;
    ``state=None`` marks start-of-key. The chunk function must apply
    the same per-element operation sequence as its packed twin so the
    two implementations stay bit-equal.
    """
    in_schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    parts = [f"{key_col} {in_schema[key_col]}"]
    if with_step:
        parts.append(f"{step} long")
    parts.append(f"{ts_col} {in_schema[ts_col]}")
    parts.append(f"{x_col} double")
    parts.extend(f"{name} double" for name in out_fields)
    schema = ", ".join(parts)

    def run(batches):
        cur_key = None
        cur_null = False
        state = None
        base = 0
        have_key = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            k = pdf[key_col].to_numpy()
            # SQL GROUP BY puts every NULL key in ONE group (and the
            # repartition/sort upstream co-locates them contiguously,
            # NULLS FIRST), so key comparisons must be null-SAFE:
            # NaN != NaN / None != None would restart the fold state
            # on every null-key row (caught by the NULL-injection
            # adversarial axis).
            kn = pdf[key_col].isna().to_numpy()
            x = pdf[x_col].to_numpy(dtype=np.float64)
            with np.errstate(invalid="ignore"):
                neq = k[1:] != k[:-1]
            neq = (neq & ~(kn[1:] & kn[:-1])) | (kn[1:] ^ kn[:-1])
            change = np.nonzero(neq)[0] + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(k)]))
            outs = {name: np.empty(len(k)) for name in out_fields}
            steps = np.empty(len(k), dtype=np.int64) if with_step else None
            for s, e in zip(starts, ends):
                same = have_key and (
                    (kn[s] and cur_null)
                    or (not kn[s] and not cur_null and k[s] == cur_key)
                )
                st, b0 = (state, base) if same else (None, 0)
                chunk_out, st = fold_chunk(x[s:e], st)
                for name in out_fields:
                    outs[name][s:e] = chunk_out[name]
                if with_step:
                    steps[s:e] = b0 + np.arange(e - s, dtype=np.int64)
                cur_key, cur_null, state = k[s], bool(kn[s]), st
                base, have_key = b0 + (e - s), True
            res = pdf[[key_col, ts_col, x_col]].copy()
            res[x_col] = x
            if with_step:
                res.insert(1, step, steps)
            for name in out_fields:
                res[name] = outs[name]
            yield res

    return (
        df.select(key_col, ts_col, x_col)
        .repartition(key_col)
        .sortWithinPartitions(key_col, ts_col, x_col)
        .mapInPandas(run, schema=schema)
    )
