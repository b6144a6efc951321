"""Adversarial-skew regression: the skew classes the full sweep
exercised (hot event user + hot type, hot customer, hot part, viral
duplicate document, repeated embedding vector) stay value-correct
against DuckDB on a representative query subset.

The full 200+-query sweep lives in scripts/adversarial_skew.py (run
per-round, results recorded in BASELINE.md); this pins the machinery
and the one defect class it caught — the raw-float Gramian rounding
flip, fixed by the quantized-sum contract — so it cannot regress
silently.
"""

from __future__ import annotations

import pytest


# skew-sensitive representatives: one per skew-handling mechanism
QUERIES = [
    "skew_salted_dim_join",          # salted hot-key join
    "skew_heavy_hitter_keys",        # hot-key diagnostic itself
    "events_countmin_heavy_hitters", # sketch under a hot key
    "dedup_minhash_neardup",         # viral doc -> identical-set collapse
    "dedup_ngram_jaccard",           # posting caps under duplicates
    "dedup_connected_canonical",     # viral duplicate cluster CC
    "similarity_srp_lsh_pairs",      # repeated vector in LSH bands
    "embeddings_gram_matrix",        # quantized-sum Gramian (the fix)
    "parts_copurchase_triangles",    # hub node under orientation
    "parts_copurchase_kcore",        # hub-degree peeling
    "events_hll_sketch_merge",       # sketch merge under hot type/user
    "orders_target_encoding_oof",    # skewed category/fold cells
]


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from adversarial_skew import build_skewed

    dst = str(tmp_path_factory.mktemp("skew"))
    return build_skewed("/root/testdata/sf0.001", dst)


def test_skew_mirror_is_actually_skewed(skew_dir):
    import duckdb

    con = duckdb.connect()
    top_user_frac = con.execute(
        f"""SELECT MAX(c)::DOUBLE / SUM(c) FROM (
              SELECT COUNT(*) AS c FROM '{skew_dir}/events.parquet'
              GROUP BY user_id)"""
    ).fetchone()[0]
    assert top_user_frac > 0.3
    viral_frac = con.execute(
        f"""SELECT MAX(c)::DOUBLE / SUM(c) FROM (
              SELECT COUNT(*) AS c FROM '{skew_dir}/documents.parquet'
              GROUP BY text)"""
    ).fetchone()[0]
    assert viral_frac > 0.2


def test_skew_subset_matches_oracles(spark, skew_dir):
    from tests.mirror_compare import assert_mirror_matches_oracles

    assert_mirror_matches_oracles(spark, skew_dir, QUERIES)
