"""Custom Python Data Source (Spark 4 DataSource API): a partitioned,
deterministic synthetic-events generator.

The reference's only extension point is "write another MapReduce job";
Spark's programmable-source API is the engine-side answer — a source
that participates in the planner like any file format (schema,
partition-parallel reads, Arrow-friendly batches). The generator is
seeded by row index through md5, so ANY engine can reproduce the
exact rows (the registered query's DuckDB oracle regenerates them
from `range(n)` with the same md5 arithmetic — bit-for-bit parity
with zero data files).

Scale design: `partitions()` splits the row domain into disjoint
index ranges — each task generates its slice independently (no
driver materialization, no skew); at cluster scale this is the
standard benchmark-data / backfill-synthesis source shape
(tpch-dbgen-as-a-source).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ("click", "view", "purchase", "signup", "share")


def synth_row(idx: int) -> tuple:
    """Deterministic row for index `idx` — md5-derived so any SQL
    engine reproduces it: user_id = md5int(idx) % 1000, event_type by
    md5int(idx+1) % 5, value = (md5int(idx+2) % 100000) / 100."""
    def md5int(x: int) -> int:
        return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)

    return (
        idx,
        md5int(idx) % 1000,
        EVENT_TYPES[md5int(idx + 1) % 5],
        (md5int(idx + 2) % 100_000) / 100.0,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", "10000"))
        self.num_partitions = int(options.get("partitions", "8"))

    def partitions(self) -> list[InputPartition]:
        per = -(-self.n // self.num_partitions)  # ceil
        return [
            _RangePartition(lo, min(lo + per, self.n))
            for lo in range(0, self.n, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for idx in range(partition.start, partition.end):
            yield synth_row(idx)


class SyntheticEventsDataSource(DataSource):
    """`spark.read.format("synthetic_events").option("n", ...)`."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id BIGINT, user_id BIGINT, event_type STRING, "
            "value DOUBLE"
        )

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent registration (re-register is a cheap overwrite)."""
    spark.dataSource.register(SyntheticEventsDataSource)
