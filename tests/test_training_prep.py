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


def test_pack_sequences_windows_are_pid_partitioned(spark, qs):
    """r8 reshape: the per-source running offset rides the two-pass
    range-partitioned prefix — every window is (__pid, source)-keyed,
    never one whole-source window task."""
    plan = _plan(qs["docs_pack_sequences"](spark, SF))
    lines = [
        ln for ln in plan.splitlines() if "windowspecdefinition(" in ln
    ]
    assert lines
    assert all("__pid" in ln for ln in lines)


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


# ---------------------------------------------------------------------------
# Weighted reservoir per key (A-ES)
# ---------------------------------------------------------------------------


def test_weighted_reservoir_matches_local_reference(spark):
    """Engine selection equals a pure-python A-ES over the same
    portable hash — the operator is exactly top-k of -ln(u)/w."""
    import math

    from airline_dataset_hadoop_public_spark.operators.sampling import (
        weighted_reservoir_per_key,
    )
    from airline_dataset_hadoop_public_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents")
    got = weighted_reservoir_per_key(
        docs, "source", "doc_id", "n_chars", k=3
    ).collect()

    rows = docs.select("source", "doc_id", "n_chars").collect()
    by_key = defaultdict(list)
    for r in rows:
        if r["source"] is None or r["doc_id"] is None:
            continue
        if r["n_chars"] is None or r["n_chars"] <= 0:
            continue
        u = ((r["doc_id"] * 2654435761) % 999999937 + 0.5) / 999999937.0
        by_key[r["source"]].append(
            (-math.log(u) / float(r["n_chars"]), r["doc_id"])
        )
    expect = {
        (k, d): i + 1
        for k, lst in by_key.items()
        for i, (_, d) in enumerate(sorted(lst)[:3])
    }
    assert {(r["source"], r["doc_id"]): r["sample_rank"] for r in got} == expect


def test_weighted_reservoir_rank_boundary_margin(spark):
    """The k/k+1 ES-key margin per stratum must dwarf libm ln()'s
    1-ulp cross-engine noise — the condition that makes the oracle's
    selection engine-independent (operators/sampling.py docstring)."""
    import math

    from airline_dataset_hadoop_public_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    rows = docs.select("source", "doc_id", "n_chars").collect()
    by_key = defaultdict(list)
    for r in rows:
        if r["n_chars"] and r["n_chars"] > 0 and r["source"] is not None:
            u = ((r["doc_id"] * 2654435761) % 999999937 + 0.5) / 999999937.0
            by_key[r["source"]].append(-math.log(u) / float(r["n_chars"]))
    worst = 1.0
    for lst in by_key.values():
        lst.sort()
        if len(lst) > 5:
            gap = (lst[5] - lst[4]) / max(abs(lst[4]), 1e-300)
            worst = min(worst, gap)
    assert worst > 1e-9, worst


def test_weighted_reservoir_excludes_invalid_rows(spark):
    """NULL/zero/negative weights and NULL ids/keys never sample."""
    from airline_dataset_hadoop_public_spark.operators.sampling import (
        weighted_reservoir_per_key,
    )

    df = spark.createDataFrame(
        [
            ("a", 1, 10.0),
            ("a", 2, None),
            ("a", 3, 0.0),
            ("a", 4, -5.0),
            (None, 5, 10.0),
            ("a", None, 10.0),
            ("b", 7, 1.0),
        ],
        "k string, id bigint, w double",
    )
    got = weighted_reservoir_per_key(df, "k", "id", "w", k=10).collect()
    assert {(r["k"], r["id"]) for r in got} == {("a", 1), ("b", 7)}


def test_weighted_reservoir_single_exchange(spark, qs):
    plan = _plan(qs["docs_weighted_reservoir"](spark, SF))
    # one shuffle on the stratum key; row_number + filter share it
    assert plan.count("Exchange") == 1
