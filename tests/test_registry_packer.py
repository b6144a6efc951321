"""Window-packer invariants (plans/registry.py): the driver verifies a
50-query prefix, so these properties ARE the coverage guarantee —
pinned here so future registrations can't silently break them."""

from __future__ import annotations

WINDOW = 50


def _ordered():
    from airline_dataset_hadoop_public_spark.plans import registry

    registry._load_all()
    return registry._ordered()


def _pinned():
    from airline_dataset_hadoop_public_spark.plans import registry

    registry._load_all()
    return [n for n in registry._PINNED_FIRST if n in registry.REGISTRY]


def test_pinned_redefinitions_lead_the_window():
    """Queries whose DEFINITION changed after their newest green row
    jump the queue (r7 tier 1): their old evidence verified old
    semantics, so they must not coast at the verified tier's back."""
    items = _ordered()
    pins = _pinned()
    assert [n for n, _ in items[: len(pins)]] == pins


def test_window_is_all_unverified_while_backlog_exceeds_window():
    from airline_dataset_hadoop_public_spark.plans.driver_history import (
        DRIVER_VERIFIED,
    )

    items = _ordered()
    pins = _pinned()
    # pins occupy the very front; the tier contract below applies to
    # the remaining slots
    rest = [n for n, _ in items[len(pins) :]]
    unverified = [n for n in rest if n not in DRIVER_VERIFIED]
    # a pinned tier at or beyond the window would make the slice below
    # silently index from the end and check the wrong names (r7 advice)
    assert len(pins) < WINDOW
    window = rest[: WINDOW - len(pins)]
    if len(unverified) >= len(window):
        assert all(n not in DRIVER_VERIFIED for n in window)
    else:
        # backlog smaller than the window: all of it must be in front
        assert window[: len(unverified)] == unverified


def test_every_backlogged_family_lands_in_the_window():
    from airline_dataset_hadoop_public_spark.plans.driver_history import (
        DRIVER_VERIFIED,
    )

    items = _ordered()
    backlog_families = {
        d.module for n, d in items if n not in DRIVER_VERIFIED
    }
    window_families = {d.module for _, d in items[:WINDOW]}
    if len(backlog_families) <= WINDOW:
        assert backlog_families <= window_families


def test_registration_order_is_preserved_within_each_family():
    from collections import defaultdict

    from airline_dataset_hadoop_public_spark.plans import registry

    registry._load_all()
    reg_order = defaultdict(list)
    for n, d in registry.REGISTRY.items():  # dict = registration order
        reg_order[d.module].append(n)
    seen = defaultdict(list)
    for n, d in _ordered():
        seen[d.module].append(n)
    from airline_dataset_hadoop_public_spark.plans.driver_history import (
        DRIVER_VERIFIED,
    )

    from airline_dataset_hadoop_public_spark.plans.driver_history import (
        DRIVER_LAST_GREEN,
    )

    pins = set(_pinned())
    for mod, names in seen.items():
        # within a family, unverified names keep registration order and
        # verified names keep it WITHIN a staleness tier (the r6 packer
        # sorts the verified bucket by newest-green round, stably);
        # pinned redefinitions are their own tier and exempt
        unv = [n for n in names if n not in DRIVER_VERIFIED]
        ver = [n for n in names if n in DRIVER_VERIFIED and n not in pins]
        ref = reg_order[mod]
        assert unv == [n for n in ref if n not in DRIVER_VERIFIED]
        ref_ver = [
            n for n in ref if n in DRIVER_VERIFIED and n not in pins
        ]
        assert ver == sorted(ref_ver, key=lambda n: DRIVER_LAST_GREEN[n])


def test_window_fronts_globally_stalest_verified_names():
    """With the never-verified backlog empty (post-r5 state), every
    window slot not taken by pinned/backlog names must hold a verified
    query whose newest driver-green row is no fresher than any query
    OUTSIDE the window — the r5 verdict's 'rotate to evidence
    freshness' contract."""
    from airline_dataset_hadoop_public_spark.plans.driver_history import (
        DRIVER_LAST_GREEN,
        DRIVER_VERIFIED,
    )

    items = _ordered()
    pins = set(_pinned())
    inside = [
        n for n, _ in items[:WINDOW] if n in DRIVER_VERIFIED and n not in pins
    ]
    outside = [n for n, _ in items[WINDOW:] if n in DRIVER_VERIFIED]
    if inside and outside:
        assert max(DRIVER_LAST_GREEN[n] for n in inside) <= min(
            DRIVER_LAST_GREEN[n] for n in outside
        )


def test_driver_last_green_covers_verified_set():
    from airline_dataset_hadoop_public_spark.plans.driver_history import (
        DRIVER_LAST_GREEN,
        DRIVER_VERIFIED,
    )

    assert frozenset(DRIVER_LAST_GREEN) == DRIVER_VERIFIED
    assert all(r >= 1 for r in DRIVER_LAST_GREEN.values())


def test_queries_and_oracles_align():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 175  # the registry never silently shrinks
    # one sentinel per fixture module: a swallowed import error that
    # deregistered a whole family must fail HERE, not pass vacuously
    sentinels = {
        "ingest_csv_roundtrip",  # fixtures_ingest
        "ingest_jsonl_roundtrip",  # fixtures_ingest_extra
        "g1q1_top10_popularity",  # fixtures_parity
        "events_batch_sessionization",  # fixtures_analytics
        "tpch_q5_local_supplier_revenue",  # fixtures_tpch_extra
        "tpch_q7_volume_shipping",  # fixtures_tpch_wave2
        "tpch_q2_min_cost_supplier",  # fixtures_tpch_wave3
        "events_cohort_retention",  # fixtures_product_analytics
        "docs_pack_sequences",  # fixtures_training_prep
        "events_resample_15m_ffill",  # fixtures_timeseries
        "warehouse_bucketed_join",  # fixtures_scale_patterns
        "orders_bloom_semijoin_reduction",  # fixtures_resolution
        "parts_copurchase_pagerank",  # fixtures_graph
        "events_type_streaks_udtf",  # fixtures_procedural
        "corpus_bpe_pair_merge",  # fixtures_corpus_model
        "events_eventually_follows",  # fixtures_behavior
        "dedup_minhash_incremental",  # fixtures_storage
        "dedup_minhash_neardup",  # fixtures_extensions
        "streaming_tumbling_counts",  # fixtures_streaming
    }
    missing = sentinels - set(qs)
    assert not missing, f"family sentinel(s) vanished: {sorted(missing)}"
