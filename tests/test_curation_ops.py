"""Round-3b curation operators: KMV distinct sketch, manifest
bin-packing, mutual-kNN graph, DSIR importance weights.

Result semantics at corpus scale are covered by the DuckDB oracles
(events_kmv_distinct_users, storage_compaction_bin_pack,
embeddings_mutual_knn_graph, docs_dsir_importance_weights); these
tests pin the operator semantics on hand-built frames where the
expected answer is computed independently in plain Python, plus the
broadcast contract on the DSIR ratio join.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from airline_dataset_hadoop_public_spark.operators.lm import (
    dsir_importance_weights,
)
from airline_dataset_hadoop_public_spark.operators.relational import (
    bin_pack_manifest,
)
from airline_dataset_hadoop_public_spark.operators.similarity import (
    mutual_knn_graph,
)
from airline_dataset_hadoop_public_spark.operators.sketches import (
    kmv_distinct_per_key,
)


def _md5_60(v: str) -> int:
    return int(hashlib.md5(v.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------


def test_kmv_exact_below_capacity(spark):
    rows = [Row(k="a", v=str(i)) for i in range(5) for _ in range(3)]
    out = kmv_distinct_per_key(
        spark.createDataFrame(rows), "k", "v", k=32
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_exact == 5
    assert r.kmv_estimate == 5.0  # sketch is exact below capacity
    assert r.rel_err == 0.0


def test_kmv_estimator_formula_at_capacity(spark):
    k = 8
    values = [str(i) for i in range(100)]
    rows = [Row(k="a", v=v) for v in values]
    out = kmv_distinct_per_key(
        spark.createDataFrame(rows), "k", "v", k=k
    ).collect()[0]
    kth = sorted(_md5_60(v) for v in values)[k - 1]
    expected = (k - 1) / (kth / 2.0**60)
    assert out.n_exact == 100
    assert out.kmv_estimate == round(expected, 4)
    # the estimator should land within ~3/sqrt(k) of truth here
    assert abs(out.kmv_estimate - 100) / 100 < 1.2


def test_kmv_is_mergeable_order_statistic(spark):
    """Union-then-sketch equals sketch-of-union: the k smallest hashes
    of A ∪ B are the k smallest of (mins of A) ∪ (mins of B)."""
    a = [str(i) for i in range(60)]
    b = [str(i) for i in range(30, 90)]  # overlapping halves
    k = 8
    union_kth = sorted({_md5_60(v) for v in set(a) | set(b)})[k - 1]
    merged_kth = sorted(
        set(sorted(_md5_60(v) for v in set(a))[:k])
        | set(sorted(_md5_60(v) for v in set(b))[:k])
    )[k - 1]
    assert union_kth == merged_kth
    rows = [Row(k="u", v=v) for v in a + b]
    out = kmv_distinct_per_key(
        spark.createDataFrame(rows), "k", "v", k=k
    ).collect()[0]
    assert out.kmv_estimate == round((k - 1) / (union_kth / 2.0**60), 4)


def test_kmv_ignores_null_values(spark):
    """NULL is not a value (COUNT(DISTINCT) semantics): a null must
    not occupy a rank slot or shift the k-th order statistic."""
    k = 4
    vals = [str(i) for i in range(10)]
    rows = [Row(k="a", v=v) for v in vals] + [Row(k="a", v=None)]
    out = kmv_distinct_per_key(
        spark.createDataFrame(rows, "k string, v string"), "k", "v", k=k
    ).collect()[0]
    kth = sorted(_md5_60(v) for v in vals)[k - 1]
    assert out.n_exact == 10
    assert out.kmv_estimate == round((k - 1) / (kth / 2.0**60), 4)


# ---------------------------------------------------------------------------
# bin packing
# ---------------------------------------------------------------------------


def test_bin_pack_boundaries_match_greedy_scan(spark):
    sizes = [40, 40, 40, 10, 100, 5, 5, 200]
    rows = [Row(f=f"f{i:02d}", bytes=s) for i, s in enumerate(sizes)]
    out = (
        bin_pack_manifest(spark.createDataFrame(rows), "bytes", "f", 100)
        .orderBy("f")
        .collect()
    )
    # greedy: a file opens a new group when bytes before it cross 100
    cum, expected = 0, []
    for s in sizes:
        expected.append(cum // 100)
        cum += s
    assert [r.compaction_group for r in out] == expected
    # every group except possibly the last holds >= 1 file and the
    # group id sequence is non-decreasing with no gaps
    gids = [r.compaction_group for r in out]
    assert gids == sorted(gids)
    assert set(gids) == set(range(max(gids) + 1))


def test_bin_pack_single_file_larger_than_target(spark):
    rows = [Row(f="a", bytes=500), Row(f="b", bytes=10)]
    out = (
        bin_pack_manifest(spark.createDataFrame(rows), "bytes", "f", 100)
        .orderBy("f")
        .collect()
    )
    # oversized file occupies its own group; next file starts a new one
    assert out[0].compaction_group == 0
    assert out[1].compaction_group == 5


# ---------------------------------------------------------------------------
# mutual kNN
# ---------------------------------------------------------------------------


def _vec_rows(vecs):
    return [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in vecs]


def test_mutual_knn_keeps_only_reciprocal_edges(spark):
    # one cell (single centroid). k=1: A and B are each other's nearest;
    # C's nearest is A, but A's nearest is B → only (A, B) survives.
    vecs = [
        (0, [1.0, 0.0]),  # A
        (1, [0.999, 0.04]),  # B: nearest to A
        (2, [0.7, 0.7]),  # C: nearest is A or B, not reciprocated
    ]
    emb = spark.createDataFrame(_vec_rows(vecs))
    cent = spark.createDataFrame(_vec_rows([(0, [1.0, 0.0])]))
    out = mutual_knn_graph(emb, cent, k=1).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(0, 1)]
    assert abs(out[0].cosine - 1.0) < 0.01


def test_mutual_knn_degree_bounded_by_k(spark):
    # star layout: many satellites all nearest the hub; with k=2 each
    # satellite lists the hub, the hub reciprocates only its own top-2
    rng = [
        (0, [1.0, 0.0]),
        *[
            (i, [math.cos(0.02 * i), math.sin(0.02 * i)])
            for i in range(1, 9)
        ],
    ]
    emb = spark.createDataFrame(_vec_rows(rng))
    cent = spark.createDataFrame(_vec_rows([(0, [1.0, 0.0])]))
    out = mutual_knn_graph(emb, cent, k=2).collect()
    deg: dict[int, int] = {}
    for r in out:
        deg[r.id_a] = deg.get(r.id_a, 0) + 1
        deg[r.id_b] = deg.get(r.id_b, 0) + 1
    assert deg and max(deg.values()) <= 2


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------


def test_dsir_separates_target_like_text(spark):
    rows = (
        [Row(doc_id=i, text="alpha beta gamma delta", lang="en") for i in range(8)]
        + [Row(doc_id=100 + i, text="uno dos tres cuatro", lang="es") for i in range(8)]
        + [Row(doc_id=200, text="alpha beta gamma delta", lang="es")]
    )
    out = dsir_importance_weights(
        spark.createDataFrame(rows), F.col("lang") == "en", buckets=64
    ).collect()
    w = {r.doc_id: r.dsir_weight for r in out}
    # target-vocabulary docs outweigh raw-only-vocabulary docs...
    assert w[0] > w[100]
    # ...and the weight depends on TEXT, not the label: the es-labelled
    # doc with en vocabulary scores like the en docs
    assert w[200] == w[0]
    # unigrams + bigrams: 4 tokens → 7 features
    assert {r.n_feats for r in out} == {7}


def test_dsir_ratio_join_is_broadcast(spark):
    rows = [
        Row(doc_id=i, text=f"tok{i} tok{i + 1} tok{i + 2}", lang="en")
        for i in range(20)
    ]
    df = dsir_importance_weights(
        spark.createDataFrame(rows), F.col("lang") == "en", buckets=32
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # bucket ratio table broadcast


# ---------------------------------------------------------------------------
# bitmap retention
# ---------------------------------------------------------------------------


def test_bitmap_retention_matches_pair_recount(spark):
    """The bitwise formulation equals the naive (day, day+d) pair count
    computed from the raw user-day set in plain Python."""
    import datetime

    from airline_dataset_hadoop_public_spark.plans.fixtures_product_analytics import (
        events_bitmap_retention,
    )
    from airline_dataset_hadoop_public_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    out = {
        r.offset_days: r for r in events_bitmap_retention(spark, sf).collect()
    }
    epoch = datetime.date(2024, 1, 1)
    raw = (
        load_table(spark, sf, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .collect()
    )
    days_by_user: dict[int, set[int]] = {}
    for r in raw:
        days_by_user.setdefault(r.user_id, set()).add((r.day - epoch).days)
    for d in (1, 3, 7):
        pairs = sum(
            sum(1 for x in ds if x + d in ds) for ds in days_by_user.values()
        )
        retained = sum(
            1 for ds in days_by_user.values() if any(x + d in ds for x in ds)
        )
        assert out[d].n_day_pairs == pairs
        assert out[d].n_users_retained == retained
        assert out[d].retained_user_frac == round(
            retained / len(days_by_user), 4
        )


# ---------------------------------------------------------------------------
# degenerate inputs
# ---------------------------------------------------------------------------


def test_curation_ops_empty_inputs(spark):
    """Empty frames flow through every r3b operator without error and
    yield empty results (the all-filtered partition every 100 TB run
    contains somewhere)."""
    empty_kv = spark.createDataFrame([], "k string, v string")
    assert kmv_distinct_per_key(empty_kv, "k", "v", k=4).count() == 0

    empty_manifest = spark.createDataFrame([], "f string, bytes long")
    assert (
        bin_pack_manifest(empty_manifest, "bytes", "f", 100).count() == 0
    )

    empty_vec = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    cent = spark.createDataFrame(_vec_rows([(0, [1.0, 0.0])]))
    assert mutual_knn_graph(empty_vec, cent, k=2).count() == 0

    empty_docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string"
    )
    assert (
        dsir_importance_weights(
            empty_docs, F.col("lang") == "en", buckets=16
        ).count()
        == 0
    )


def test_dsir_no_target_docs_still_scores(spark):
    """An all-raw corpus (empty target slice) degrades to the uniform
    Laplace target distribution — weights are finite and defined."""
    rows = [
        Row(doc_id=i, text="alpha beta gamma", lang="es") for i in range(6)
    ]
    out = dsir_importance_weights(
        spark.createDataFrame(rows), F.col("lang") == "en", buckets=16
    ).collect()
    assert len(out) == 6
    assert all(r.dsir_weight is not None for r in out)


def test_mutual_knn_k_larger_than_cell(spark):
    """k exceeding the cell population returns the full mutual graph,
    not an error (every pair is mutual when everyone lists everyone)."""
    vecs = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.8, 0.2])]
    emb = spark.createDataFrame(_vec_rows(vecs))
    cent = spark.createDataFrame(_vec_rows([(0, [1.0, 0.0])]))
    out = mutual_knn_graph(emb, cent, k=50).collect()
    assert len(out) == 3  # C(3,2) pairs, all reciprocal


# ---------------------------------------------------------------------------
# XML round-trip escaping
# ---------------------------------------------------------------------------


def test_xml_roundtrip_preserves_adversarial_text(spark, tmp_path):
    """The fixture corpus is plain words, so this pins what it cannot:
    entity-escaped characters, quotes, unicode, and surrounding
    whitespace all survive the XML write/read cycle byte-for-byte
    (ignoreSurroundingSpaces=false, as ingest_xml_roundtrip sets)."""
    texts = [
        "a & b < c > d \"quoted\" 'apos'",
        "  leading and trailing  ",
        "unicode: é中文 — dash",
        "&amp; literal entity-looking text &#38;",
        "tabs\tand  double  spaces",
        "multi\nline\ntext",
    ]
    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    path = str(tmp_path / "xmlrt")
    (
        spark.createDataFrame(rows)
        .write.mode("overwrite")
        .format("xml")
        .option("rootTag", "corpus")
        .option("rowTag", "doc")
        .save(path)
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .option("ignoreSurroundingSpaces", "false")
        .schema("doc_id bigint, text string")
        .load(path)
    )
    got = {r.doc_id: r.text for r in back.collect()}
    assert got == {i: t for i, t in enumerate(texts)}


# ---------------------------------------------------------------------------
# triangle counting
# ---------------------------------------------------------------------------


def test_triangle_counts_hand_graph(spark):
    """K4 on {1,2,3,4} plus a pendant 5: every K4 vertex closes 3
    triangles (clustering 1.0), the pendant closes none."""
    from airline_dataset_hadoop_public_spark.operators.graph import (
        triangle_counts,
    )

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in k4] + [Row(src=4, dst=5)]
    )
    out = {r.node: r for r in triangle_counts(edges).collect()}
    for n in (1, 2, 3):
        assert (out[n].degree, out[n].triangles, out[n].clustering) == (3, 3, 1.0)
    assert (out[4].degree, out[4].triangles) == (4, 3)
    assert out[4].clustering == 0.5  # 3 of the 6 neighbor pairs close
    assert (out[5].degree, out[5].triangles, out[5].clustering) == (1, 0, 0.0)


def test_triangle_counts_orientation_invariance(spark):
    """Duplicate and reversed input edges collapse to one undirected
    edge set; a triangle is never double-counted."""
    from airline_dataset_hadoop_public_spark.operators.graph import (
        triangle_counts,
    )

    tri = [(1, 2), (2, 3), (3, 1)]
    noisy = tri + [(b, a) for a, b in tri] + tri  # reversed + repeated
    out = {
        r.node: r.triangles
        for r in triangle_counts(
            spark.createDataFrame([Row(src=a, dst=b) for a, b in noisy])
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1}
