"""Smoke-level checks of the driver contract (__spark_entry__.py).

The heavyweight oracle comparison lives in scripts/check_correctness.py
(run at sf0.01); here we assert the contract shape and that every query
executes at sf0.001 with a stable, readable schema.
"""

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["key", "cnt"]


def test_every_oracle_key_has_query():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 14


def test_oracles_are_valid_duckdb_sql():
    """Every oracle must at least parse and bind against the fixture
    views (catches SQL typos without running Spark)."""
    con = duckdb.connect()
    from airline_dataset_hadoop_public_spark.sources.catalog import FIXTURE_TABLES

    for t in FIXTURE_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    for name, sql in entrymod.oracle_sql().items():
        try:
            con.execute(sql).fetchone()
        except Exception as ex:  # pragma: no cover
            pytest.fail(f"oracle for {name} failed: {ex}")


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_at_smoke_scale(spark, name):
    df = entrymod.queries()[name](spark, SF_SMOKE)
    assert df.columns, name
    df.limit(5).collect()
