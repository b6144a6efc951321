"""Extreme-value regression: the IEEE-754-special and degenerate-
payload classes the full sweep exercised (NaN/±Inf measures, zero and
NaN-element vectors, empty/whitespace/multibyte text, negative
prices, out-of-domain discounts) stay value-correct against DuckDB on
a representative query subset.

The full 200+-query sweep lives in scripts/adversarial_extremes.py
(run per-round, results recorded in BASELINE.md); this pins the
contracts it forced — vector validity (non-NULL, all-finite, norm>0)
at the operator entry, finite-measure guards on quantile/median/
regression/smoothing fixtures, the rank-band (not value-relative)
approx-percentile check, and the frame-sample oracle's explicit
ASCII scope — so they cannot regress silently.
"""

from __future__ import annotations

import pytest


# extreme-sensitive representatives: one per contract mechanism
QUERIES = [
    "similarity_bruteforce_topk",    # NaN vector would flood top-k
    "dedup_embedding_cosine_ivf",    # zero vector: cosine is 0/0
    "embeddings_gram_matrix",        # NaN element poisons BLAS partial
    "embeddings_int8_quantize",      # validity implies absmax > 0
    "events_value_percentiles",      # finite-measure quantiles
    "events_mad_outliers",           # finite-measure robust stats
    "approx_percentile_check",       # rank-band sketch check
    "events_ewma_per_user",          # finite-measure smoother
    "events_regr_value_trend",       # finite-measure regression
    "events_weighted_median_udaf",   # pandas NaN-group drop guarded
    "p_leg_candidates",              # non-finite delay = malformed row
    "multimodal_frame_sample",       # byte-true op, ASCII-scoped oracle
    "streaming_stateful_running_counts",  # NULL-or-finite state input
    "text_quality_scores",           # empty/whitespace/multibyte text
    "tpch_q1_pricing",               # out-of-domain discount passthrough
]


@pytest.fixture(scope="module")
def extremes_dir(tmp_path_factory):
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from adversarial_extremes import build_extreme

    dst = str(tmp_path_factory.mktemp("extremes"))
    return build_extreme("/root/testdata/sf0.001", dst)


def test_extremes_mirror_has_specials(extremes_dir):
    import duckdb

    con = duckdb.connect()
    nan_n, pinf, ninf = con.execute(
        f"""SELECT COUNT(*) FILTER (WHERE isnan(value)),
                   COUNT(*) FILTER (WHERE value = 'inf'::DOUBLE),
                   COUNT(*) FILTER (WHERE value = '-inf'::DOUBLE)
            FROM '{extremes_dir}/events.parquet'"""
    ).fetchone()
    assert nan_n > 0 and pinf > 0 and ninf > 0
    empty, multibyte = con.execute(
        f"""SELECT COUNT(*) FILTER (WHERE text = ''),
                   COUNT(*) FILTER (WHERE octet_length(encode(text))
                                    <> length(text))
            FROM '{extremes_dir}/documents.parquet'"""
    ).fetchone()
    assert empty > 0 and multibyte > 0
    bad_vec = con.execute(
        f"""SELECT COUNT(*) FROM '{extremes_dir}/embeddings.parquet'
            WHERE list_aggregate(list_transform(embedding,
                    x -> CASE WHEN isfinite(x) THEN 0 ELSE 1 END),
                  'max') = 1
               OR list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * x), 'sum') = 0"""
    ).fetchone()[0]
    assert bad_vec > 0


def test_extremes_subset_matches_oracles(spark, extremes_dir):
    from tests.mirror_compare import assert_mirror_matches_oracles

    assert_mirror_matches_oracles(spark, extremes_dir, QUERIES)
