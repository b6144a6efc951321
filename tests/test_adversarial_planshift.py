"""Plan-shift invariance regression (sixth axis): results must not
depend on which physical strategy Catalyst picks. The five data axes
corrupt the input; this one perturbs the PLAN — AQE off, automatic
broadcast off, shuffled-hash preferred over sort-merge, DPP off — and
demands bit-identical oracle agreement on clean sf0.001 data. At
100 TB the optimizer's choices differ from any toy run (AQE re-plans,
thresholds flip join strategies), so a result that depends on the
strategy is a latent wrong answer toy-scale green cannot see.

The full-registry sweep lives in scripts/adversarial_planshift.py
(which also perturbs parallelism to local[7]/shuffle=13 in its own
process); this pins a strategy-sensitive subset on the shared session
via runtime confs so a regression can't land silently.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

# every entry auto-broadcasts, AQE-replans, or partition-prunes today —
# the confs below force a different physical plan for each
QUERIES = [
    "events_dpp_weekend_scan",        # DPP off: unpruned scan, same rows
    "warehouse_bucketed_join",        # join-pref flip on bucketed SMJ
    "tpch_q21_waiting_suppliers",     # 4-way join + anti/semi, no auto-BHJ
    "tpch_q9_part_pattern_revenue",   # star join cascade, all SMJ/SHJ now
    "skew_salted_dim_join",           # salting must not need AQE to be right
    "skew_heavy_hitter_keys",         # hot-key agg under no coalescing
    "g3q2_toms_leg1",                 # equi-join + argmin, join flip
    "orders_customer_join_ivm",       # three-term delta join algebra
    "lineitem_bloom_prune_revenue",   # literal bloom predicate + semi-join
    "events_ddsketch_quantiles",      # broadcast rank frame becomes SHJ
    "similarity_ivf_recall",          # left-semi + two ranking pipelines
    "customers_hierarchy_closure",    # recursive CTE joins, no auto-BHJ
]

PLAN_SHIFT_CONF = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.optimizer.dynamicPartitionPruning.enabled": "false",
}


@pytest.fixture()
def shifted(spark):
    old = {k: spark.conf.get(k, None) for k in PLAN_SHIFT_CONF}
    for k, v in PLAN_SHIFT_CONF.items():
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_planshift_confs_change_the_plan(shifted):
    """Sanity that the perturbation bites: the DPP query's plan loses
    its dynamicpruning subquery once DPP is disabled (the normal-conf
    plan contract asserting its presence lives in
    test_scale_patterns.py)."""
    from airline_dataset_hadoop_public_spark.plans.fixtures_scale_patterns import (
        events_dpp_weekend_scan,
    )

    plan = (
        events_dpp_weekend_scan(shifted, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "dynamicpruning" not in plan.lower()


def test_planshift_subset_matches_oracles(shifted):
    from tests.mirror_compare import assert_mirror_matches_oracles

    assert_mirror_matches_oracles(shifted, SF, QUERIES)
