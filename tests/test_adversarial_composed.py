"""Composed-corruption regression (fifth axis, VERDICT r4 #4): skew +
NULLs + IEEE-754 extremes applied together to one mirror — the
interaction cases the four per-axis sweeps can't see (NULLS-LAST
argmin meeting NaN-LAST sort in one ranking, identical-set collapse
meeting nulled/emptied members of the viral clique, hot keys
coexisting with NULL join keys in the same column).

The full-registry sweep lives in scripts/adversarial_composed.py
(r5 first run: ALL GREEN with no new contracts — the r4 two-sided
contracts compose; recorded in BASELINE.md). This pins a subset of
interaction-sensitive representatives so composition can't regress
silently.
"""

from __future__ import annotations

import pytest

# each exercises at least two corruption axes at once
QUERIES = [
    "g3q2_toms_leg1",                # argmin: NULL order keys + hot keys
    "g1q1_top10_popularity",         # top-k over skewed + nulled keys
    "dedup_minhash_neardup",         # viral clique w/ nulled+emptied text
    "dedup_containment_neardup",     # one-sided prefix on corrupted clique
    "dedup_exact",                   # collapse with null text members
    "events_value_percentiles",      # NaN/Inf + hot user + null values
    "events_weighted_median_udaf",   # NaN groups + null keys + skew
    "embeddings_gram_matrix",        # NaN/zero vectors in viral cluster
    "similarity_bruteforce_topk",    # invalid vectors + duplicate floods
    "orders_customer_join_ivm",      # null join keys + hot customer
    "orders_cdc_log_apply",          # max_by under skewed + nulled dates
    "orders_window_rank_profile",    # rank functions over corrupted orders
    "text_quality_scores",           # empty/ws/multibyte + nulls + virals
    "streaming_stateful_running_counts",  # state over null+skewed keys
]


@pytest.fixture(scope="module")
def composed_dir(tmp_path_factory):
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from adversarial_composed import build_composed

    dst = str(tmp_path_factory.mktemp("composed"))
    return build_composed("/root/testdata/sf0.001", dst)


def test_composed_mirror_has_all_three_axes(composed_dir):
    import duckdb

    con = duckdb.connect()
    # skew survived the later passes: hot user still dominates
    top_share = con.execute(
        f"""SELECT MAX(c) * 1.0 / SUM(c) FROM (
              SELECT COUNT(*) AS c FROM '{composed_dir}/events.parquet'
              WHERE user_id IS NOT NULL GROUP BY user_id)"""
    ).fetchone()[0]
    assert top_share > 0.2
    # NULLs present in join keys and measures
    nulls = con.execute(
        f"""SELECT COUNT(*) FILTER (WHERE user_id IS NULL),
                   COUNT(*) FILTER (WHERE value IS NULL)
            FROM '{composed_dir}/events.parquet'"""
    ).fetchone()
    assert nulls[0] > 0 and nulls[1] > 0
    # extremes present alongside them
    nan_n = con.execute(
        f"SELECT COUNT(*) FROM '{composed_dir}/events.parquet' "
        f"WHERE isnan(value)"
    ).fetchone()[0]
    assert nan_n > 0
    # the viral doc cluster contains corrupted members (null or empty
    # text on a doc whose id is in the viral class doc_id % 4 = 0)
    corrupted_viral = con.execute(
        f"""SELECT COUNT(*) FROM '{composed_dir}/documents.parquet'
            WHERE doc_id % 4 = 0 AND (text IS NULL OR trim(text) = '')"""
    ).fetchone()[0]
    assert corrupted_viral > 0


def test_composed_subset_matches_oracles(spark, composed_dir):
    from tests.mirror_compare import assert_mirror_matches_oracles

    assert_mirror_matches_oracles(spark, composed_dir, QUERIES)
