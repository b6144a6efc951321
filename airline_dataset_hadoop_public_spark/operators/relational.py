"""Warehouse-maintenance relational patterns: MERGE-style upsert and
SCD-2 validity intervals.

The reference's mutation story is "re-run the MapReduce job and
overwrite the serving table" (reference README.md:264-270 rebuilds the
Cassandra table per run); it has no incremental upsert or history
tracking. These close that gap with the two patterns every
lakehouse-shaped pipeline needs, expressed as pure shuffles so they
hold at 100 TB.

Scale notes:
- merge_upsert: one anti-join (base minus updated keys) + union — the
  copy-on-write MERGE kernel (what Delta/Hudi do per touched file
  group, here over the whole frame). Single shuffle on the key; with
  both sides bucketed by the key it is shuffle-free.
- scd2_intervals: the gaps-and-islands pattern — every window shares
  ONE partitioning on the entity key, so the whole history rebuild is
  a single exchange followed by in-partition sorts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame, delta: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """MERGE semantics: rows of ``delta`` win on key collision; base
    rows without a delta match pass through. Schemas must align by
    name."""
    surviving = base.join(delta.select(*keys), list(keys), "left_anti")
    return delta.unionByName(surviving)


def scd2_intervals(
    df: DataFrame,
    entity_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse an event history into SCD-2 validity intervals: one row
    per run of consecutive equal ``attr_col`` values per entity, with
    the run's start/end timestamps, row count, and a current-run flag.

    Ordering inside an entity is (ts, tiebreak) — the tiebreak must be
    unique per entity so runs are deterministic when timestamps tie.
    """
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w = Window.partitionBy(entity_col).orderBy(*order)
    # Null-safe change detection: lag(attr).isNull() is also true for a
    # genuine NULL attr mid-partition (not just at the partition
    # start), and `!=` against NULL yields NULL (counted as no-change)
    # — either way runs merge or split wrongly around NULL values.
    # Detect the partition start positionally (row_number 1): lag of
    # ANY column — including ts — can be legitimately NULL
    # mid-partition, so only position is a safe start marker.
    changed = (
        (F.row_number().over(w) == 1)
        | ~F.lag(attr_col).over(w).eqNullSafe(F.col(attr_col))
    ).cast("int")
    runs = df.withColumn(
        "__run",
        F.sum(changed).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_run = runs.groupBy(entity_col, "__run", attr_col).agg(
        F.min(ts_col).alias("valid_from"),
        F.max(ts_col).alias("valid_to"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    wruns = Window.partitionBy(entity_col)
    return (
        per_run.withColumn(
            "is_current", (F.col("__run") == F.max("__run").over(wruns))
        )
        .withColumn("version", F.col("__run").cast("long"))
        .drop("__run")
    )


def bin_pack_manifest(
    files: DataFrame,
    size_col: str,
    order_cols: str | Sequence[str],
    target_bytes: int,
) -> DataFrame:
    """Sorted-scan bin packing over a FILE MANIFEST: walk the files in
    `order_cols` order and start a new output group whenever the bytes
    accumulated BEFORE a file cross a `target_bytes` boundary — the
    small-file compaction planner every parquet lake runs (Iceberg's
    binPack rewrite / Delta OPTIMIZE plan the same greedy shape).

    `order_cols` must be a TOTAL order over the manifest (include a
    tie-break column such as the file path): the ROWS-frame running
    sum is order-sensitive, so ties would make group assignment
    nondeterministic across runs and engines.

    Emits the input rows with a `compaction_group` id. The unpartitioned
    running-sum window is deliberate: it ranges over the MANIFEST (one
    row per file — ~10^5 rows for a 100 TB table at 1 GB files), never
    over data, so the single-partition sort is metadata-sized. The
    planner's output feeds a group-keyed rewrite that IS distributed.
    """
    order = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    w = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum(size_col).over(w)
    return files.withColumn(
        "compaction_group",
        F.floor((cum - F.col(size_col)) / F.lit(target_bytes)).cast("long"),
    )


def ansi_empty_grouping_row(
    input_df: DataFrame, result: DataFrame, row: Sequence
) -> DataFrame:
    """Append the global grouping-set row to a ROLLUP/CUBE/GROUPING
    SETS `result` exactly when `input_df` was empty.

    ANSI SQL (and DuckDB/Postgres) emit one row for the `()` grouping
    set even over an empty table — the global aggregate over zero rows
    — but Spark's rollup/cube/groupingSets return an empty frame
    there. The emptiness probe is `input_df.limit(1)` aggregated to a
    count — a LocalLimit early-exit that reads at most one row
    regardless of table size — NOT a re-derivation of `result`: a pad
    branch built over `result` itself misses the cache inside the
    self-referential union (DeduplicateRelations renumbers the
    Expand's grouping-id attribute and the cache lookup fails), which
    would silently re-run the whole fact aggregation.

    `row` lists one Column per output column (aliased to the result's
    column names, NULL/0 as the empty-aggregate values dictate).
    """
    pad = (
        input_df.select(F.lit(1).alias("__one"))
        .limit(1)
        .groupBy()
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") == 0)
        .select(*row)
    )
    return result.unionByName(pad)
