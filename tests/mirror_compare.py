"""Shared mirror-vs-oracle compare for the adversarial regression
tests (skew / NULLs / extremes): run each named query on a mirrored
fixture dir in Spark AND its DuckDB oracle over the same parquet,
assert row count + columns + the order-insensitive value hash — the
identical semantics to scripts/check_correctness.py, kept in one
place."""

from __future__ import annotations

import os
import sys


def assert_mirror_matches_oracles(spark, mirror_dir: str, names) -> None:
    import duckdb

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    from check_correctness import value_hash

    import __spark_entry__ as e
    from airline_dataset_hadoop_public_spark.sources.catalog import (
        FIXTURE_TABLES,
    )

    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{mirror_dir}/{t}.parquet'"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    for name in names:
        sdf = qs[name](spark, mirror_dir)
        cols = sdf.columns
        rows = [tuple(r) for r in sdf.collect()]
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        assert len(rows) == len(orows), (name, len(rows), len(orows))
        assert sorted(cols) == sorted(ocols), name
        assert value_hash(rows, cols) == value_hash(orows, ocols), name
