"""Training-prep wave: plan contracts + semantic invariants
(value parity vs DuckDB oracles runs in scripts/check_correctness.py
at sf0.01; these guard physical plans and invariants at sf0.001)."""

from __future__ import annotations

from collections import defaultdict

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def qs():
    import __spark_entry__ as e

    return e.queries()


def test_pii_redaction_counts_and_shuffle_free(spark, qs):
    df = qs["text_pii_redaction"](spark, SF)
    plan = _plan(df)
    # per-row regexp kernels only: no shuffle anywhere in the plan
    assert "Exchange" not in plan
    rows = df.collect()
    assert rows
    for r in rows:
        # every doc gets exactly one appended email and one phone
        assert r.n_emails == 1
        assert r.n_phones == 1
        assert len(r.redacted_fp) == 32


def test_pack_sequences_offsets_contiguous_per_source(spark, qs):
    rows = qs["docs_pack_sequences"](spark, SF).collect()
    assert rows
    by_source = defaultdict(list)
    for r in rows:
        assert r.tokens > 0
        by_source[r.source].append(r)
    for legs in by_source.values():
        legs.sort(key=lambda r: r.doc_id)
        offset = 0
        for r in legs:
            assert r.start_offset == offset
            assert r.pack_id == offset // 512
            offset += r.tokens


def test_pack_sequences_single_window_exchange(spark, qs):
    plan = _plan(qs["docs_pack_sequences"](spark, SF))
    # one hash exchange for the per-source window, nothing else
    assert plan.count("Exchange") == 1
    assert "Window" in plan


def test_train_split_is_shuffle_free_and_partitioned(spark, qs):
    df = qs["docs_train_split"](spark, SF)
    assert "Exchange" not in _plan(df)
    rows = df.collect()
    assert rows
    counts = defaultdict(int)
    for r in rows:
        expect = (
            "train" if r.bucket < 800 else "val" if r.bucket < 900 else "test"
        )
        assert r.split == expect
        counts[r.split] += 1
    # 80/10/10 within generous tolerance at 50 docs
    assert counts["train"] > counts["val"]
    assert counts["train"] > counts["test"]


def test_train_split_stable_under_corpus_growth(spark, qs):
    # a doc's split depends only on doc_id: identical across sf dirs
    small = {
        r.doc_id: r.split for r in qs["docs_train_split"](spark, SF).collect()
    }
    big = {
        r.doc_id: r.split
        for r in qs["docs_train_split"](spark, "/root/testdata/sf0.01").collect()
    }
    assert small
    for doc_id, split in small.items():
        assert big[doc_id] == split


def test_lang_rebalance_equalizes_counts(spark, qs):
    rows = qs["docs_lang_rebalance"](spark, SF).collect()
    assert rows
    counts = defaultdict(int)
    for r in rows:
        counts[r.lang] += 1
    sizes = set(counts.values())
    assert len(sizes) == 1  # every language downsampled to min count


def test_decontaminate_hits_only_train_bucket(spark, qs):
    import pyspark.sql.functions as F

    hits = qs["docs_decontaminate"](spark, "/root/testdata/sf0.01")
    rows = hits.collect()
    assert rows  # the near-dup clusters guarantee cross-split overlap
    split = {
        r.doc_id: r.bucket
        for r in qs["docs_train_split"](spark, "/root/testdata/sf0.01").collect()
    }
    for r in rows:
        assert r.n_hits > 0
        assert split[r.doc_id] < 800  # only train-split docs are reported
    # the test-ngram side must broadcast, not shuffle-join
    plan = _plan(hits)
    assert "BroadcastHashJoin" in plan


def test_int8_quantize_codes_bounded_and_rmse_small(spark, qs):
    rows = qs["embeddings_int8_quantize"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.scale_r > 0
        assert len(r.code_fp) == 32
        # absmax symmetric quantization: rmse well under one code step
        assert 0 <= r.rmse <= r.scale_r / 127.0


def test_int8_quantize_shuffle_free(spark, qs):
    assert "Exchange" not in _plan(qs["embeddings_int8_quantize"](spark, SF))


def test_temperature_resample_upweights_low_resource(spark, qs):
    rows = qs["docs_temperature_resample"](spark, SF).collect()
    assert rows
    rate_by_lang = {}
    for r in rows:
        assert 0 < r.keep_rate <= 1.0
        rate_by_lang[r.lang] = r.keep_rate
    # smallest language keeps (close to) everything; at least one
    # larger language is genuinely downsampled
    assert max(rate_by_lang.values()) > 0.99
    assert min(rate_by_lang.values()) < 1.0
