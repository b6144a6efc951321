"""Entity-resolution + join-reduction wave (fixtures_resolution.py).

Value semantics are covered by the DuckDB oracles; these tests pin the
physical contracts (bloom probe path stays broadcast-only, fuzzy
verify runs over the collapsed name vocabulary) and brute-force the
kernels against independent in-test references.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def qs():
    import __spark_entry__ as e

    return e.queries()


# ---------------------------------------------------------------------------
# bloom semi-join reduction
# ---------------------------------------------------------------------------


def test_bloom_matches_plain_semijoin(spark, qs):
    """No false negatives + exact verify ⇒ identical to the plain
    semi-join at any filter size."""
    from airline_dataset_hadoop_public_spark.sources.catalog import load_table

    got = {
        tuple(r)
        for r in qs["orders_bloom_semijoin_reduction"](spark, SF).collect()
    }
    cust = load_table(spark, SF, "customer")
    orders = load_table(spark, SF, "orders")
    rich = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    want = {
        tuple(r)
        for r in (
            orders.join(rich, orders.o_custkey == rich.c_custkey, "semi")
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            )
            .collect()
        )
    }
    assert got == want and got


def test_bloom_probe_path_is_broadcast_only(spark, qs):
    """The probe side must prune through BroadcastHashJoins (3 bloom
    word tests + 1 exact semi) — a shuffle on the probe side would
    defeat the reduction."""
    plan = _plan(qs["orders_bloom_semijoin_reduction"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 4
    # sanity: the only SortMergeJoin-free plan shape
    assert "SortMergeJoin" not in plan


def test_bloom_filter_is_fixed_size(spark):
    """The build aggregate lands in <= 1024 int64 words regardless of
    dim cardinality — the fixed 8 KiB contract that makes the filter
    broadcastable at any scale."""
    from airline_dataset_hadoop_public_spark.sources.catalog import load_table

    cust = load_table(spark, SF, "customer")
    rich = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    bits = rich.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64("c_custkey", F.lit(s)), F.lit(1 << 16))
                    for s in range(3)
                ]
            )
        ).alias("bit")
    )
    words = bits.select((F.col("bit") / 64).cast("int").alias("w")).distinct()
    assert words.count() <= 1024


# ---------------------------------------------------------------------------
# blocked fuzzy name match
# ---------------------------------------------------------------------------


def test_fuzzy_pairs_match_bruteforce(spark, qs):
    """Blocking must lose nothing below the distance threshold that a
    full quadratic scan would find — for this vocabulary every <=2
    pair shares its last token (verified, not assumed)."""
    from airline_dataset_hadoop_public_spark.sources.catalog import load_table

    got = {
        (r.name_a, r.name_b, r.dist)
        for r in qs["parts_fuzzy_name_pairs"](spark, SF).collect()
    }
    names = load_table(spark, SF, "part").select("p_name").distinct()
    a, b = names.alias("a"), names.alias("b")
    brute = {
        (r[0], r[1], r[2])
        for r in (
            a.crossJoin(b)
            .filter(F.col("a.p_name") < F.col("b.p_name"))
            .select(
                F.col("a.p_name"),
                F.col("b.p_name"),
                F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("d"),
            )
            .filter("d <= 2")
            .collect()
        )
    }
    # brute pairs that share the block key must all be found; and the
    # corpus happens to put every close pair in one block, so equality
    same_block = {
        (x, y, d)
        for (x, y, d) in brute
        if x.rsplit(" ", 1)[-1] == y.rsplit(" ", 1)[-1]
    }
    assert got == same_block
    assert got == brute  # no cross-block near-pair exists in this vocab


def test_fuzzy_verify_is_vocab_bounded(spark, qs):
    """The quadratic stage runs over DISTINCT names (adjective x noun
    vocabulary), not over parts — the row count entering the self-join
    equals the vocabulary size."""
    from airline_dataset_hadoop_public_spark.sources.catalog import load_table

    part = load_table(spark, SF, "part")
    n_names = part.select("p_name").distinct().count()
    n_parts = part.count()
    assert n_names < n_parts / 3  # collapse is real on this corpus


# ---------------------------------------------------------------------------
# token-window span dedup
# ---------------------------------------------------------------------------


def test_span_dedup_matches_python_bruteforce(spark, qs):
    """Per-doc duplicated-window counts equal a pure-Python sliding
    window reference over the same corpus."""
    rows = qs["docs_ngram_span_dedup"](spark, SF).collect()
    got = {r.doc_id: (r.n_windows, r.n_dup_windows) for r in rows}

    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    win_docs: dict[str, set] = {}
    per_doc: dict = {}
    for doc_id, text in docs.itertuples(index=False):
        toks = text.split(" ")
        wins = [
            hashlib.md5(" ".join(toks[i : i + 8]).encode()).hexdigest()
            for i in range(len(toks) - 7)
        ]
        per_doc[doc_id] = wins
        for w in wins:
            win_docs.setdefault(w, set()).add(doc_id)
    for doc_id, wins in per_doc.items():
        n_dup = sum(1 for w in wins if len(win_docs[w]) > 1)
        assert got[doc_id] == (len(wins), n_dup), doc_id
    assert set(got) == set(per_doc)


# ---------------------------------------------------------------------------
# deterministic hash sample
# ---------------------------------------------------------------------------


def test_hash_sample_is_deterministic_and_bounded(spark, qs):
    run1 = sorted(map(tuple, qs["events_hash_sample_per_user"](spark, SF).collect()))
    run2 = sorted(map(tuple, qs["events_hash_sample_per_user"](spark, SF).collect()))
    assert run1 == run2  # rerun-idempotent: no rand() anywhere
    counts = (
        qs["events_hash_sample_per_user"](spark, SF)
        .groupBy("user_id")
        .count()
        .collect()
    )
    assert counts and all(r["count"] <= 2 for r in counts)


def test_hash_sample_rows_come_from_source(spark, qs):
    from airline_dataset_hadoop_public_spark.sources.catalog import load_table

    sample = qs["events_hash_sample_per_user"](spark, SF)
    ev = load_table(spark, SF, "events").select("event_id").distinct()
    orphans = sample.join(ev, "event_id", "left_anti")
    assert orphans.count() == 0
