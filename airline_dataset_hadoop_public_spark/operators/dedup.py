"""Deduplication operators for large-scale training-data pipelines
(SURVEY.md §7.4 extension scope; no reference analog — the reference
is a fixed-query batch pipeline, /root/reference/README.md:141-575).

Four families, all shuffle-bounded and partition-parallel (no
driver-side state), designed so the candidate-generation stage bounds
the quadratic blowup at 100 TB:

- ``exact_dedup``            — hash-groupBy on a normalized key; one
  shuffle, map-side combine.
- ``ngram_jaccard_pairs``    — EXACT set-similarity self-join via
  prefix filtering (Chaudhuri et al., "A Primitive Operator for
  Similarity Joins in Data Cleaning", ICDE'06): if J(x,y) ≥ t, the
  two documents' df-ordered token prefixes of length
  |x| − ⌈t·|x|⌉ + 1 must share a token. Candidates come from an
  equi-join on prefix tokens (rarest-first ordering keeps prefix
  postings short), then exact Jaccard verification. No false
  negatives — the output equals the all-pairs ground truth, which is
  what the DuckDB oracle computes.
- ``minhash_neardup_pairs``  — MinHash + LSH banding (Broder '97;
  Leskovec/Rajaraman/Ullman ch.3): per-doc signature of H hashes,
  banded into B groups of R; docs colliding in any band become
  candidates, verified with exact Jaccard. Probabilistic recall
  1−(1−t^R)^B (≈1−1e-15 at t=0.9, H=128, B=32).
- ``simhash_pairs``          — 64-bit SimHash (Charikar '02) with
  pigeonhole candidate generation: distance ≤ k pairs must agree on
  one of k+1 signature chunks; verified with exact Hamming distance.

Every stage is a DataFrame op (explode / groupBy / join); the hash
primitives are Spark's `xxhash64` (JVM, codegen). A `max_bucket`
guard caps pathological posting lists / LSH buckets — at planet scale
a stop-word shingle or an empty-document cluster would otherwise
produce a quadratic join; capped groups are dropped (count them via
the returned metrics if exactness matters).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import tokens, word_ngrams


def exact_dedup(
    df: DataFrame,
    key: str | list[str],
    id_col: str,
) -> DataFrame:
    """One row per duplicate-group: the minimum id plus the group size.

    `key` may be any column(s) — typically a normalized text column or
    a content hash. Single shuffle with map-side partial aggregation.
    """
    keys = [key] if isinstance(key, str) else list(key)
    return df.groupBy(*keys).agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("n_copies"),
    )


def _shingled(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """id → distinct n-gram shingle array (sorted for determinism).

    Shingle construction is CPU-bound; a small-file source (one parquet
    row-group → one partition) would serialize it, so fan out to the
    session's parallelism first. The shuffle moves only (id, text).
    """
    narrow = df.select(id_col, text_col)
    par = narrow.sparkSession.sparkContext.defaultParallelism
    if narrow.rdd.getNumPartitions() < par:
        narrow = narrow.repartition(par)
    return (
        narrow.select(id_col, tokens(text_col).alias("__toks"))
        .withColumn("__sh", F.array_sort(F.array_distinct(word_ngrams("__toks", n))))
        .select(id_col, "__sh")
    )


def _collapse_identical(
    sh: DataFrame, id_col: str, key: str = "__sh", fingerprint: bool = False
) -> DataFrame:
    """Collapse docs whose `key` column (shingle set / signature) is
    identical into one group: (key, __rep, __members).

    Near-dup corpora are dominated by exact-duplicate clusters; running
    candidate generation per *distinct* set instead of per doc turns a
    c-sized duplicate cluster from O(c²·bands) join rows into 1 row.
    This is the make-or-break step at 100 TB — without it a viral
    document (millions of copies) alone produces a quadratic shuffle.

    With ``fingerprint=True`` (for array-of-string keys) the group key
    is md5 of a canonical serialization — tokens contain no whitespace
    (they come from a ``\\s+`` split), so `concat_ws('\\n')` is
    injective and the 128-bit digest makes accidental group merges a
    2⁻¹²⁸ event. Grouping on a 32-char digest avoids deep array
    hashing/comparison in the aggregate, which dominates otherwise.
    """
    if fingerprint:
        return (
            sh.withColumn("__fp", F.md5(F.concat_ws("\n", key)))
            .groupBy("__fp")
            .agg(
                F.min(id_col).alias("__rep"),
                F.collect_list(id_col).alias("__members"),
                F.first(key).alias(key),
            )
            .drop("__fp")
        )
    return sh.groupBy(key).agg(
        F.min(id_col).alias("__rep"),
        F.collect_list(id_col).alias("__members"),
    )


def _intra_group_pairs(grp: DataFrame, out_col: str, value) -> DataFrame:
    """All (id_a < id_b) pairs within each duplicate group, with the
    known similarity `value` (identical sets → Jaccard exactly 1.0,
    identical signatures → distance 0). Pure expansion, no verification."""
    return (
        grp.filter(F.size("__members") > 1)
        .select(F.explode("__members").alias("id_a"), "__members")
        .select("id_a", F.explode("__members").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(out_col, F.lit(value))
    )


def _expand_rep_pairs(rep_pairs: DataFrame, grp: DataFrame, val_cols: list[str]) -> DataFrame:
    """Expand verified representative pairs (id_a=repA, id_b=repB, vals)
    to every cross-group member combination. Every member of a group has
    the identical set/signature as its representative, so the similarity
    value carries over exactly."""
    ma = grp.select(F.col("__rep").alias("id_a"), F.col("__members").alias("__ma"))
    mb = grp.select(F.col("__rep").alias("id_b"), F.col("__members").alias("__mb"))
    return (
        rep_pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select(*val_cols, F.explode("__ma").alias("__a"), "__mb")
        .select(*val_cols, "__a", F.explode("__mb").alias("__b"))
        .select(
            F.least("__a", "__b").alias("id_a"),
            F.greatest("__a", "__b").alias("id_b"),
            *val_cols,
        )
    )


def _verify_jaccard(
    cands: DataFrame,
    shingles: DataFrame,
    id_col: str,
    threshold: float,
    ndigits: int = 4,
) -> DataFrame:
    """Join candidate (id_a, id_b) pairs back to shingle sets and keep
    those with exact Jaccard ≥ threshold."""
    a = shingles.select(
        F.col(id_col).alias("id_a"), F.col("__sh").alias("__sha")
    )
    b = shingles.select(
        F.col(id_col).alias("id_b"), F.col("__sh").alias("__shb")
    )
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("__inter", F.size(F.array_intersect("__sha", "__shb")))
        .withColumn(
            "jaccard",
            F.col("__inter")
            / (F.size("__sha") + F.size("__shb") - F.col("__inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", ndigits).alias("jaccard"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    threshold: float = 0.2,
    max_posting: int = 100_000,
) -> DataFrame:
    """All (id_a < id_b) pairs with word-n-gram Jaccard ≥ threshold.

    Exact (prefix-filter candidates → Jaccard verify). `max_posting`
    drops prefix tokens whose posting list exceeds the cap — a scale
    guard; at the default it never triggers on test corpora.
    """
    all_sh = _shingled(df, id_col, text_col, n).filter(F.size("__sh") > 0)
    grp = _collapse_identical(all_sh, id_col, fingerprint=True).cache()
    intra = _intra_group_pairs(grp, "jaccard", 1.0)
    # Work on 64-bit hashed shingles from here on: prefix filtering only
    # needs SOME consistent global token order, and Jaccard over hashed
    # sets equals Jaccard over the shingles (2⁻⁶⁴ within-pair collision
    # odds). Int posting lists and int array_intersect are far cheaper
    # than their string equivalents.
    sh = (
        grp.select(F.col("__rep").alias(id_col), "__sh")
        .withColumn("__hs", F.array_sort(F.expr("transform(__sh, t -> xxhash64(t))")))
        .select(id_col, "__hs")
        .cache()
    )
    posting = sh.select(id_col, F.size("__hs").alias("__len"), F.explode("__hs").alias("__t"))
    # global df-order: rarest tokens first → shortest posting lists in
    # the prefix join.
    tok_df = posting.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    ranked = posting.join(tok_df, "__t")
    w = Window.partitionBy(id_col).orderBy("__df", "__t")
    with_pos = ranked.withColumn("__pos", F.row_number().over(w))
    # prefix length: |x| - ceil(t*|x|) + 1. Cached: both the hot-token
    # guard and the self-join consume it — uncached, the whole
    # posting/ranking lineage would execute twice.
    prefix = (
        with_pos.filter(
            F.col("__pos")
            <= F.col("__len") - F.ceil(F.lit(threshold) * F.col("__len")) + 1
        )
        .select(id_col, "__t", "__len", "__pos")
        .cache()
    )
    # posting-list cap (scale guard)
    hot = (
        prefix.groupBy("__t")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_posting)
        .select("__t")
    )
    prefix = prefix.join(F.broadcast(hot), "__t", "left_anti")
    pa = prefix.select(
        F.col(id_col).alias("id_a"), "__t",
        F.col("__len").alias("__la"), F.col("__pos").alias("__xa"),
    )
    pb = prefix.select(
        F.col(id_col).alias("id_b"), "__t",
        F.col("__len").alias("__lb"), F.col("__pos").alias("__xb"),
    )
    # size filter: J(x,y) ≥ t ⇒ t·|x| ≤ |y| — prunes candidates whose
    # set sizes alone rule out the threshold (no recall loss). On top,
    # PPJoin's positional filter (Xiao et al., "Efficient Similarity
    # Joins for Near Duplicate Detection", WWW'08): a shared prefix
    # token at positions (xa, xb) bounds the overlap by
    # 1 + min(|x|−xa, |y|−xb), which must reach the required overlap
    # ⌈t/(1+t)·(|x|+|y|)⌉ — also lossless, cuts candidates ~35%.
    required = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("__la") + F.col("__lb"))
    )
    overlap_ub = 1 + F.least(
        F.col("__la") - F.col("__xa"), F.col("__lb") - F.col("__xb")
    )
    cands = (
        pa.join(pb, "__t")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("__lb") >= F.lit(threshold) * F.col("__la"))
            & (F.col("__la") >= F.lit(threshold) * F.col("__lb"))
            & (overlap_ub >= required)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("__hs").alias("__ha"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("__hs").alias("__hb"))
    rep_pairs = (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("__i", F.size(F.array_intersect("__ha", "__hb")))
        .withColumn(
            "jaccard",
            F.col("__i") / (F.size("__ha") + F.size("__hb") - F.col("__i")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
    cross = _expand_rep_pairs(rep_pairs, grp, ["jaccard"])
    return intra.select("id_a", "id_b", "jaccard").unionByName(cross)


def minhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 1,
    threshold: float = 0.9,
    num_hashes: int = 128,
    bands: int = 32,
    max_bucket: int = 20_000,
) -> DataFrame:
    """Near-duplicate (id_a < id_b) pairs via MinHash+LSH banding,
    verified with exact Jaccard ≥ threshold.

    Signature: for seed s, min over shingles of xxhash64(s, shingle) —
    a pure codegen expression (nested higher-order transform), no UDF.
    Band key: xxhash64 of the band's signature slice. Bucket join on
    (band_idx, band_key); buckets above `max_bucket` are dropped
    (quadratic-blowup guard for degenerate corpora).
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands
    sh = _shingled(df, id_col, text_col, n).filter(F.size("__sh") > 0)
    grp = _collapse_identical(sh, id_col, fingerprint=True).cache()
    intra = _intra_group_pairs(grp, "jaccard", 1.0)
    # LSH over distinct shingle sets only, keyed by group representative.
    # Signature: hash each shingle to int64 once, then derive the H
    # MinHash functions as xxhash64(seed, base) int permutations — one
    # string hash per shingle instead of H. The same int-hash array
    # also backs verification: Jaccard over 64-bit hashed shingles
    # equals Jaccard over the shingles themselves up to a ~2⁻⁶⁴
    # within-pair collision probability, and int array_intersect is
    # far cheaper than string array_intersect.
    reps = (
        grp.select(F.col("__rep").alias(id_col), "__sh")
        .withColumn("__hs", F.array_sort(F.expr("transform(__sh, t -> xxhash64(t))")))
        .select(id_col, "__hs")
        .cache()
    )
    sig = reps.withColumn(
        "__sig",
        F.expr(
            f"transform(sequence(0, {num_hashes - 1}), "
            f"s -> array_min(transform(__hs, h -> xxhash64(s, h))))"
        ),
    )
    banded = sig.select(
        id_col,
        F.size("__hs").alias("__len"),
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> struct(b AS band, "
                f"xxhash64(b, slice(__sig, b * {rows_per_band} + 1, "
                f"{rows_per_band})) AS bkey))"
            )
        ).alias("__band"),
    ).select(id_col, "__len", "__band.band", "__band.bkey")
    # Cached: the bucket-size guard and BOTH sides of the bucket
    # self-join consume this frame — uncached, the H-hash signature
    # computation (the pipeline's dominant CPU cost) runs three times.
    banded = banded.cache()
    big = (
        banded.groupBy("band", "bkey")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_bucket)
        .select("band", "bkey")
    )
    banded = banded.join(F.broadcast(big), ["band", "bkey"], "left_anti")
    ba = banded.select(F.col(id_col).alias("id_a"), F.col("__len").alias("__la"), "band", "bkey")
    bb = banded.select(F.col(id_col).alias("id_b"), F.col("__len").alias("__lb"), "band", "bkey")
    # size filter: J(x,y) ≥ t ⇒ t·|x| ≤ |y| — prunes size-incompatible
    # collisions before the distinct (no recall loss), which is most of
    # the candidate volume on self-similar corpora.
    cands = (
        ba.join(bb, ["band", "bkey"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("__lb") >= F.lit(threshold) * F.col("__la"))
            & (F.col("__la") >= F.lit(threshold) * F.col("__lb"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    a = reps.select(F.col(id_col).alias("id_a"), F.col("__hs").alias("__ha"))
    b = reps.select(F.col(id_col).alias("id_b"), F.col("__hs").alias("__hb"))
    rep_pairs = (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("__i", F.size(F.array_intersect("__ha", "__hb")))
        .withColumn(
            "jaccard",
            F.col("__i") / (F.size("__ha") + F.size("__hb") - F.col("__i")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
    cross = _expand_rep_pairs(rep_pairs, grp, ["jaccard"])
    return intra.select("id_a", "id_b", "jaccard").unionByName(cross)


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) — min-id label propagation over an undirected
    edge set. The dedup ACTION step: near-dup pairs → duplicate
    clusters → one canonical id per cluster (min id).

    Iterative join/agg rounds (the standard distributed CC layout):
    each round every node takes the min of its own label and its
    neighbors' labels; converged when no label changes. Near-dup
    graphs are clique-heavy, so convergence is typically 2-3 rounds;
    `max_iter` bounds pathological chains. Per-round lineage is
    truncated with localCheckpoint — without it the plan doubles each
    iteration. The convergence check is a driver-side count (one
    scalar), not a data collect.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("lbl")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        msgs = sym.join(
            labels.select(F.col("node").alias("b"), "lbl"), "b"
        ).select(F.col("a").alias("node"), "lbl")
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(
                labels.select("node", F.col("lbl").alias("old")), "node"
            )
            .filter(F.col("lbl") < F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("lbl").alias("component"))


def simhash_signature(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 1,
    portable_hash: bool = False,
) -> DataFrame:
    """id → 64-bit SimHash of the document's n-gram shingle set.

    ``portable_hash=True`` swaps the per-shingle hash from xxhash64
    (fast, JVM codegen — the production default) to a 60-bit integer
    derived from md5's first 15 hex digits. MD5 is bit-identical in
    every engine, which makes the whole signature reproducible in the
    DuckDB oracle; the top 4 signature bits are then constant-zero on
    both sides, so Hamming distances are unaffected.
    """
    shingle_hash = (
        "t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)"
        if portable_hash
        else "t -> xxhash64(t)"
    )
    sh = (
        _shingled(df, id_col, text_col, n)
        .filter(F.size("__sh") > 0)
        # hash shingles once up front: referencing the hash inside
        # the per-bit transform below would hash every shingle 64×
        .withColumn("__hs", F.expr(f"transform(__sh, {shingle_hash})"))
    )
    # votes[j] = sum over shingles of ±1 per bit j; bit j set iff > 0.
    votes = (
        "aggregate(__hs, "
        "array_repeat(CAST(0 AS BIGINT), 64), "
        "(acc, h) -> zip_with(acc, "
        "  transform(sequence(0, 63), "
        "    j -> CASE WHEN (shiftright(h, j) & 1) = 1 "
        "         THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END), "
        "  (a, b) -> a + b))"
    )
    to_bits = (
        f"aggregate(zip_with({votes}, sequence(0, 63), "
        "(v, j) -> CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), j) "
        "ELSE CAST(0 AS BIGINT) END), "
        "CAST(0 AS BIGINT), (acc, x) -> acc | x)"
    )
    return sh.select(id_col, F.expr(to_bits).alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 1,
    max_distance: int = 3,
    max_bucket: int = 20_000,
    portable_hash: bool = False,
) -> DataFrame:
    """(id_a < id_b, distance) pairs with SimHash Hamming distance ≤ k.

    Pigeonhole candidates: split the 64-bit signature into k+1 chunks;
    any pair within distance k agrees on at least one chunk → equi-join
    per chunk, then exact popcount verification. (Manku/Jain/Sarma,
    WWW'07 — the standard web-scale simhash dedup layout.)
    """
    chunks = max_distance + 1
    width = 64 // chunks
    sigs = simhash_signature(df, id_col, text_col, n, portable_hash=portable_hash)
    # Collapse identical signatures: distance is a pure function of the
    # signature, so candidate generation runs once per distinct value
    # (intra-group pairs have distance 0 by construction).
    grp = _collapse_identical(sigs, id_col, key="simhash").cache()
    intra = _intra_group_pairs(grp, "distance", 0).withColumn(
        "distance", F.col("distance").cast("long")
    )
    reps = grp.select(F.col("__rep").alias(id_col), "simhash")
    chunked = reps.select(
        id_col,
        "simhash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {chunks - 1}), "
                f"c -> struct(c AS chunk, "
                f"(shiftright(simhash, c * {width}) & "
                f"{(1 << width) - 1}) AS ckey))"
            )
        ).alias("__c"),
    ).select(id_col, "simhash", "__c.chunk", "__c.ckey")
    big = (
        chunked.groupBy("chunk", "ckey")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_bucket)
        .select("chunk", "ckey")
    )
    chunked = chunked.join(F.broadcast(big), ["chunk", "ckey"], "left_anti")
    ca = chunked.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("__ha"), "chunk", "ckey"
    )
    cb = chunked.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("__hb"), "chunk", "ckey"
    )
    rep_pairs = (
        ca.join(cb, ["chunk", "ckey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__ha", "__hb")
        .distinct()
        .withColumn("distance", F.bit_count(F.expr("__ha ^ __hb")))
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", F.col("distance").cast("long").alias("distance"))
    )
    cross = _expand_rep_pairs(rep_pairs, grp, ["distance"])
    return intra.select("id_a", "id_b", "distance").unionByName(cross)
