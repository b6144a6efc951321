"""NULL-injection regression: the NULL classes the full sweep
exercised (NULL join/group keys, NULL measures, NULL dates, NULL
text, NULL embedding vectors) stay value-correct against DuckDB on a
representative query subset.

The full 200+-query sweep lives in scripts/adversarial_nulls.py (run
per-round, results recorded in BASELINE.md); this pins the NULL
contracts it forced — vector/text/payload ops drop NULL inputs at
the operator entry (mirrored by IS NOT NULL in oracles), argmin
ranks NULL order keys last, as-of keys follow SQL equi-join
semantics, SCD-2 detects runs positionally, and incremental splits
partition the fact exhaustively — so they cannot regress silently.
"""

from __future__ import annotations

import pytest


# NULL-sensitive representatives: one per NULL-contract mechanism
QUERIES = [
    "similarity_bruteforce_topk",    # NULL vectors at unit_normalize
    "similarity_pq_adc_topk",        # NULL vectors at the PQ encoder
    "embeddings_gram_matrix",        # NULL vectors at the BLAS kernel
    "dedup_semantic_keeplist",       # flag table excludes NULL vectors
    "text_winnowing_overlap",        # NULL text -> empty fingerprints
    "text_rolling_hash",             # NULL text dropped both sides
    "multimodal_byte_features",      # NULL payload skipped in Arrow
    "g3q2_toms_leg1",                # argmin NULLS-LAST order contract
    "events_asof_last_purchase",     # NULL as-of keys never match
    "orders_priority_scd2",          # positional run-start detection
    "orders_customer_join_ivm",      # exhaustive base/delta split
    "ingest_schema_evolution",       # exhaustive v1/v2 batch split
    "events_value_deciles",          # NULL measures carry no rank
    "events_weighted_median_udaf",   # NULL measures outside the median
    "events_zorder_keys",            # pinned NULL placement in sort
]


@pytest.fixture(scope="module")
def nulls_dir(tmp_path_factory):
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from adversarial_nulls import build_nulled

    dst = str(tmp_path_factory.mktemp("nulls"))
    return build_nulled("/root/testdata/sf0.001", dst)


def test_null_mirror_actually_has_nulls(nulls_dir):
    import duckdb

    con = duckdb.connect()
    for table, col in [
        ("events", "value"),
        ("events", "user_id"),
        ("orders", "o_orderdate"),
        ("documents", "text"),
        ("embeddings", "embedding"),
    ]:
        n = con.execute(
            f"SELECT COUNT(*) FROM '{nulls_dir}/{table}.parquet' "
            f"WHERE {col} IS NULL"
        ).fetchone()[0]
        assert n > 0, (table, col)


def test_null_subset_matches_oracles(spark, nulls_dir):
    from tests.mirror_compare import assert_mirror_matches_oracles

    assert_mirror_matches_oracles(spark, nulls_dir, QUERIES)
