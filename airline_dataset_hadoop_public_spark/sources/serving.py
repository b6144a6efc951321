"""Partitioned-parquet serving layer (SURVEY.md §2.1 S6/S7, §2.9 X2).

Replaces the reference's Cassandra serving tables
(/root/reference/README.md:264-274,597-615): where Cassandra keys a
table per access path (`(airport, unique_carrier)`,
`(origin, stop, dest, date)`) for CQL point lookups, we write results
`partitionBy(serving keys)` and serve point reads as filtered scans —
Spark's partition pruning turns the equality filter into a file-level
prune, the same I/O profile as a Cassandra partition read. For
high-cardinality keys, `bucketBy` into the session catalog is the
analog (see `save_bucketed`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_serving(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """S6: persist a query result keyed for point lookups."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def point_read(
    spark: SparkSession, path: str, schema=None, **key_equalities
) -> DataFrame:
    """X2: point lookup — conjunctive equality on serving keys.
    Filters on partition columns prune at file level (check
    `.explain` for PartitionFilters).

    Pass the serving table's ``schema`` (a catalog would supply it at
    scale) to make the read robust to an EMPTY serving table:
    ``partitionBy`` of a zero-row frame writes no files, and
    schema inference over the bare directory raises where an explicit
    schema simply yields an empty scan."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path)
    for k, v in key_equalities.items():
        df = df.filter(F.col(k) == F.lit(v))
    return df


def create_database(spark: SparkSession, name: str) -> None:
    """S7: keyspace DDL analog (README.md:63-70)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def write_text_report(
    df: DataFrame,
    path: str,
    sep: str = " ",
    single_file: bool = False,
    mode: str = "overwrite",
) -> None:
    """S4: the reference's part-r-00000 text sink
    (README.md:133-139) — space-delimited lines of the stringified
    columns. `single_file=True` reproduces the one-file layout via
    coalesce(1); leave False at scale (a single writer serializes the
    job — the reference's own bottleneck)."""
    out = df.select(
        F.concat_ws(sep, *[F.col(c).cast("string") for c in df.columns]).alias(
            "value"
        )
    )
    if single_file:
        out = out.coalesce(1)
    out.write.mode(mode).text(path)


def save_bucketed(
    df: DataFrame, table: str, bucket_cols: list[str], num_buckets: int = 16
) -> None:
    """High-cardinality serving: bucketed catalog table — co-locates
    later joins/lookups on the bucket key without a shuffle."""
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table)
    )
