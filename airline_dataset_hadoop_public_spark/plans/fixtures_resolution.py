"""Entity-resolution + join-reduction wave: the record-linkage and
probe-side-pruning machinery a 100 TB pipeline uses before its
expensive joins — an explicit distributed Bloom-filter semi-join
reduction, a blocked fuzzy (edit-distance) match over a collapsed
name vocabulary, token-window exact-substring dedup (the n-gram
approximation of suffix-array substring dedup used for LLM training
corpora), and a deterministic hash-ranked per-key sample.

None of these exist in the reference (its join story is one tagged
reduce-side join, reference README.md:437-520; SURVEY.md §2.5). All
four have full DuckDB value oracles. Scale contracts:

- Bloom reduction: the filter is a fixed 8 KiB bitset built by a
  map-side-combinable ``bit_or`` aggregate and joined broadcast, so
  probe rows are pruned by three broadcast hash joins with ZERO
  shuffle before the exact semi-join — the hand-rolled version of
  Spark's runtime bloom-filter pruning, stated explicitly so the
  plan is auditable.
- Fuzzy match: quadratic verify runs over DISTINCT names only
  (vocabulary-bounded, not corpus-bounded) and inside last-token
  blocks — the classic blocking discipline of record linkage.
- Window dedup: candidate generation is one hash-shuffle of
  fixed-width window digests; no all-pairs stage exists at any
  scale.
- Hash sample: rank-by-md5 is a deterministic, rerun-idempotent,
  mergeable uniform sample — one shuffle, no rand() seeds to
  coordinate across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Distributed Bloom-filter semi-join reduction.
#
# Build side: customers with c_acctbal > 9000 (~10% of the dim) hash
# into a 65536-bit filter: k=3 positions per key via xxhash64(key,
# seed), OR-ed into 1024 int64 words by a bit_or aggregate (partial
# map-side combine -> the build shuffles 1024 rows regardless of dim
# size). Probe side: each order tests its 3 positions through three
# broadcast joins against the word table — no false negatives, so
# after the exact broadcast semi-join the result is IDENTICAL to the
# plain semi-join the oracle states. At 100 TB the win is that rows
# failing any bit test never reach the exact join.
# ---------------------------------------------------------------------------

_BLOOM_BITS = 1 << 16
_BLOOM_K = 3

_BLOOM_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
GROUP BY o_orderpriority
"""


@register("orders_bloom_semijoin_reduction", _BLOOM_ORACLE)
def orders_bloom_semijoin_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rich = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")

    def positions(key):
        # k independent positions from one 64-bit hash family
        return [
            F.pmod(F.xxhash64(key, F.lit(s)), F.lit(_BLOOM_BITS))
            for s in range(_BLOOM_K)
        ]

    # shiftleft's pyspark wrapper takes a literal bit count, so the
    # variable shift goes through F.expr
    mask = lambda bit: F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({bit} % 64 AS INT))")  # noqa: E731

    bits = rich.select(
        F.explode(F.array(*positions(F.col("c_custkey")))).alias("bit")
    )
    words = (
        bits.select(
            (F.col("bit") / 64).cast("int").alias("w"),
            mask("bit").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("word"))
    )

    probe = orders.select("o_custkey", "o_orderpriority", "o_totalprice")
    for s, pos in enumerate(positions(F.col("o_custkey"))):
        wcol, mcol, wordcol, bcol = f"w{s}", f"m{s}", f"word{s}", f"bit{s}"
        probe = (
            probe.withColumn(bcol, pos)
            .withColumn(wcol, (F.col(bcol) / 64).cast("int"))
            .withColumn(mcol, mask(bcol))
            .join(
                F.broadcast(
                    words.select(F.col("w").alias(wcol), F.col("word").alias(wordcol))
                ),
                wcol,
            )
            .filter(F.col(mcol).bitwiseAND(F.col(wordcol)) != 0)
            .drop(bcol, wcol, mcol, wordcol)
        )

    # the exact confirm join's build side is customer-scaled: no
    # broadcast hint (r10 broadcast audit) — the bloom prefilter above
    # already shrank the probe side, which is the operator's point
    exact = probe.join(
        rich, probe.o_custkey == rich.c_custkey, "semi"
    )
    return exact.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Blocked fuzzy name match (record linkage). Collapse to DISTINCT part
# names first — the generator's adjective×noun vocabulary bounds that
# set (64 names at any sf), so the quadratic Levenshtein verify is
# scale-CONSTANT while the corpus grows. Blocks = shared last token;
# verify edit distance <= 2; re-attach per-name part counts so the
# output carries linkage weight. Levenshtein is the same classic DP
# distance in Spark and DuckDB.
# ---------------------------------------------------------------------------

_FUZZY_ORACLE = """
WITH names AS (
  SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_parts
  FROM part GROUP BY p_name),
blocked AS (
  SELECT p_name, n_parts, string_split(p_name, ' ')[-1] AS blk FROM names)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
FROM blocked a JOIN blocked b
  ON a.blk = b.blk AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


@register("parts_fuzzy_name_pairs", _FUZZY_ORACLE)
def parts_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts"))
    blocked = names.withColumn("blk", F.element_at(F.split("p_name", " "), -1))
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .withColumn(
            "dist", F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
        )
        .filter(F.col("dist") <= 2)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.col("dist"),
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
        )
    )


# ---------------------------------------------------------------------------
# Token-window exact-substring dedup: the scalable n-gram
# approximation of suffix-array substring dedup (flag every 8-token
# window that appears verbatim in more than one document, report the
# per-document duplicated-window ratio). Window digests are md5 of the
# space-joined slice — bit-identical in both engines — and the only
# shuffle is the digest groupBy; candidate volume is linear in corpus
# tokens.
# ---------------------------------------------------------------------------

_WIN_K = 8

_SPAN_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
wins AS (
  SELECT doc_id, md5(array_to_string(t[i:i+{_WIN_K - 1}], ' ')) AS wh
  FROM toks, LATERAL (
    SELECT unnest(generate_series(1, len(t) - {_WIN_K - 1})) AS i) _x),
shared AS (
  SELECT wh FROM wins GROUP BY wh HAVING COUNT(DISTINCT doc_id) > 1)
SELECT w.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(CASE WHEN s.wh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_windows,
       ROUND(CAST(SUM(CASE WHEN s.wh IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS dup_ratio
FROM wins w LEFT JOIN shared s ON w.wh = s.wh
GROUP BY w.doc_id
"""


@register("docs_ngram_span_dedup", _SPAN_ORACLE)
def docs_ngram_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _span_report(load_table(spark, sf_dir, "documents"))


def _span_report(docs: DataFrame) -> DataFrame:
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    # Spark's sequence(1, 0) is the DESCENDING [1, 0], not empty like
    # DuckDB's generate_series(1, 0) — and its 0 element would crash
    # slice(t, 0, k). Docs shorter than one window must produce NO
    # window rows (they then drop from the report on both sides, same
    # as the oracle's empty wins CTE).
    wins = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.when(
                    F.size("t") >= _WIN_K,
                    F.sequence(F.lit(1), F.size("t") - (_WIN_K - 1)),
                ).otherwise(F.expr("CAST(array() AS ARRAY<INT>)")),
                lambda i: F.md5(F.concat_ws(" ", F.slice("t", i, _WIN_K))),
            )
        ).alias("wh"),
    )
    shared = (
        wins.groupBy("wh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("wh", F.lit(1).alias("is_dup"))
    )
    flagged = wins.join(shared, "wh", "left")
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.coalesce(F.sum("is_dup"), F.lit(0)).cast("long").alias("n_dup_windows"),
        F.round(
            F.coalesce(F.sum("is_dup"), F.lit(0)).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("dup_ratio"),
    )


# ---------------------------------------------------------------------------
# Deterministic hash-ranked per-key sample: 2 events per user, ranked
# by md5 of the event id. Equivalent in distribution to a per-key
# uniform sample but deterministic, idempotent across reruns, and
# mergeable (min-k by hash is an order-statistic sketch) — no rand()
# seed coordination across 1000 executors. One shuffle (the window
# partition).
# ---------------------------------------------------------------------------

_HASH_SAMPLE_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_id, event_type, value,
         ROW_NUMBER() OVER (
           PARTITION BY user_id
           ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
  FROM events)
SELECT user_id, event_id, event_type, ROUND(value, 4) AS value
FROM ranked WHERE rn <= 2
"""


@register("events_hash_sample_per_user", _HASH_SAMPLE_ORACLE)
def events_hash_sample_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
        )
    )
