"""Cache lifecycle: plan-internal persisted frames must be releasable.

VERDICT r01 flagged unbounded `.cache()` accumulation across a
full-registry session as the one genuine 100x-scale risk. Contract:
every plan-internal cache goes through ``runtime.cache_tracked``, and
``runtime.release_caches()`` leaves zero pinned RDDs; the driver-entry
wrapper releases the previous query's caches before each run.
"""

from __future__ import annotations

from conftest import SF_SMOKE

from airline_dataset_hadoop_public_spark.runtime import cache_tracked, release_caches


def _persistent_ids(spark) -> set:
    """Ids of currently pinned RDDs. Set-based comparisons (new - base)
    keep the assertions immune to the ContextCleaner asynchronously
    GCing localCheckpoint RDDs left over from OTHER tests mid-test —
    absolute counts flaked exactly that way."""
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def test_release_after_cached_dedup_query(spark):
    release_caches()  # start clean regardless of test ordering
    base = _persistent_ids(spark)
    from airline_dataset_hadoop_public_spark.plans.fixtures_extensions import (
        dedup_minhash_neardup,
        text_winnowing_overlap,
    )

    dedup_minhash_neardup(spark, SF_SMOKE).count()
    text_winnowing_overlap(spark, SF_SMOKE).count()
    assert _persistent_ids(spark) - base  # the plans do cache
    release_caches()
    assert not (_persistent_ids(spark) - base)  # ...and release fully


def test_entry_wrapper_releases_between_queries(spark):
    import __spark_entry__ as e

    release_caches()
    base = _persistent_ids(spark)
    qs = e.queries()
    qs["dedup_simhash"](spark, SF_SMOKE).count()
    assert _persistent_ids(spark) - base
    # running the NEXT query through the wrapper frees the previous one
    qs["g1q1_top10_popularity"](spark, SF_SMOKE).count()
    assert len(_persistent_ids(spark) - base) <= 1  # only simhash's successor, if any
    release_caches()
    assert not (_persistent_ids(spark) - base)


def test_cache_tracked_is_reusable_after_release(spark):
    df = cache_tracked(spark.range(10))
    assert df.count() == 10
    release_caches()
    assert df.count() == 10  # unpersisted frame still computable


def test_release_after_r4_cached_queries(spark):
    """The r4 cache sites (containment postings, KMV overlap distinct/
    sketch frames) go through cache_tracked and release fully."""
    release_caches()
    base = _persistent_ids(spark)
    from airline_dataset_hadoop_public_spark.plans.fixtures_extensions import (
        dedup_containment_neardup,
    )
    from airline_dataset_hadoop_public_spark.plans.fixtures_scale_patterns import (
        events_kmv_type_overlap,
    )

    dedup_containment_neardup(spark, SF_SMOKE).count()
    events_kmv_type_overlap(spark, SF_SMOKE).count()
    assert _persistent_ids(spark) - base
    release_caches()
    assert not (_persistent_ids(spark) - base)
