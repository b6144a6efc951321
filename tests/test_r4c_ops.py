"""r4c additions: CDC change-log apply (last-writer-wins compaction)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row


@pytest.fixture()
def tiny_orders_dir(spark, tmp_path):
    """Keys chosen to hit every op class: 1 -> I only; 5 -> I,U;
    7 -> I,D (dead); 35 -> I,U,D,I (delete-then-reinsert)."""
    rows = [
        Row(o_orderkey=k, o_totalprice=100.0 * k, o_orderpriority="3-MEDIUM")
        for k in (1, 5, 7, 35)
    ]
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_cdc_apply_last_writer_wins(spark, tiny_orders_dir):
    import __spark_entry__ as e

    out = {
        r["o_orderkey"]: r
        for r in e.queries()["orders_cdc_log_apply"](
            spark, tiny_orders_dir
        ).collect()
    }
    # plain insert: untouched
    assert out[1]["price"] == 100.0
    assert out[1]["n_ops"] == 1 and out[1]["last_lsn"] == 1
    assert out[1]["priority"] == "3-MEDIUM"
    # insert+update: doubled price, urgent priority
    assert out[5]["price"] == 1000.0
    assert out[5]["priority"] == "1-URGENT"
    assert out[5]["n_ops"] == 2 and out[5]["last_lsn"] == 2
    # insert+delete: absent — a tombstone as the last op removes the key
    assert 7 not in out
    # delete-then-REINSERT: the truly-last op wins, not "any tombstone"
    assert out[35]["price"] == 1750.0  # 3500.0 / 2
    assert out[35]["priority"] == "3-MEDIUM"
    assert out[35]["n_ops"] == 4 and out[35]["last_lsn"] == 4
    assert set(out) == {1, 5, 35}


def test_cdc_apply_zero_rows(spark, tmp_path):
    from tests.test_r4_ops import _empty_tables

    import __spark_entry__ as e

    sf = _empty_tables(tmp_path)
    assert e.queries()["orders_cdc_log_apply"](spark, sf).count() == 0


def test_cdc_apply_plan_is_one_partial_aggregate(spark, tiny_orders_dir):
    """The compaction must be ONE shuffle with map-side combine and no
    window sort: partial_max_by below a single Exchange, no Window."""
    import __spark_entry__ as e

    df = e.queries()["orders_cdc_log_apply"](spark, tiny_orders_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_max_by" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan
