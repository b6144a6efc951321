"""Graph-analytics wave: co-occurrence edge building and iterative
PageRank over the aggregated graph.

The 100 TB shape: the quadratic-looking part (items co-purchased in
one order) explodes only within an order (~4 lines -> ~12 directed
pairs), so the edge build is a linear scan plus one shuffle on the
pair key; the ITERATIVE part then runs on the collapsed graph (nodes
= part vocabulary), where each PageRank round is one join + one
aggregate on the edge table — never on the raw facts. The reference
has no graph surface (SURVEY.md §2.5; its one join is the tagged
reduce-side join, reference README.md:437-520).

Oracle notes: PageRank is fully SQL-expressible at fixed iteration
count — the oracle unrolls 3 Jacobi iterations as CTEs (validated
against an independent NumPy reference before registration). Output
ranks are scaled by N and ROUND(.,4) so double-summation low-bit
nondeterminism cannot flip the hash, and top-k ordering uses the
ROUNDED value + partkey so both engines cut the same 20 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import pagerank
from ..sources.catalog import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Co-purchase edge list, top pairs. Directed symmetric pairs within an
# order; weight = number of orders carrying both parts (an order's
# duplicate part lines count multiplicatively, matching the join
# semantics on both engines).
# ---------------------------------------------------------------------------


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One narrow shuffle instead of a shuffle self-join: group the
    order's part list, expand directed pairs in-partition (order size
    is bounded by the schema at ~7 lines, so the per-row quadratic is
    a constant), then count pairs. Semantics identical to the
    self-join on (same order, different part value): duplicate lines
    of a part pair multiplicatively, same-part lines never pair."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    per_order = li.groupBy("l_orderkey").agg(
        F.collect_list("l_partkey").alias("parts")
    )
    pairs = per_order.select(
        F.explode(
            F.flatten(
                F.transform(
                    "parts",
                    lambda a: F.transform(
                        F.filter("parts", lambda b: b != a),
                        lambda b: F.struct(a.alias("src"), b.alias("dst")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.groupBy(
        F.col("p.src").alias("src"), F.col("p.dst").alias("dst")
    ).agg(F.count(F.lit(1)).alias("w"))


_COPURCHASE_ORACLE = """
WITH e AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2)
SELECT src, dst, w FROM e
ORDER BY w DESC, src, dst
LIMIT 25
"""


@register("parts_copurchase_pairs_topk", _COPURCHASE_ORACLE)
def parts_copurchase_pairs_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _copurchase_edges(spark, sf_dir)
    return edges.orderBy(F.desc("w"), "src", "dst").limit(25)


# ---------------------------------------------------------------------------
# PageRank over the co-purchase graph: damping 0.85, exactly 3 Jacobi
# iterations from the uniform vector. The symmetric edge list means no
# dangling nodes, so rank mass is conserved and the fixed-iteration
# unrolled-CTE oracle states the identical computation.
# ---------------------------------------------------------------------------

_PAGERANK_ORACLE = """
WITH e AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst, CAST(COUNT(*) AS DOUBLE) AS w
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2),
nodes AS (SELECT DISTINCT src AS pk FROM e UNION SELECT DISTINCT dst FROM e),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
o AS (SELECT src, SUM(w) AS outw FROM e GROUP BY src),
c AS (SELECT e.src, e.dst, e.w / o.outw AS frac FROM e JOIN o USING (src)),
r0 AS (SELECT pk, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
r1 AS (
  SELECT n.pk, 0.15 / (SELECT n FROM nn)
         + 0.85 * COALESCE(SUM(p.r * c.frac), 0) AS r
  FROM nodes n LEFT JOIN c ON c.dst = n.pk LEFT JOIN r0 p ON p.pk = c.src
  GROUP BY n.pk),
r2 AS (
  SELECT n.pk, 0.15 / (SELECT n FROM nn)
         + 0.85 * COALESCE(SUM(p.r * c.frac), 0) AS r
  FROM nodes n LEFT JOIN c ON c.dst = n.pk LEFT JOIN r1 p ON p.pk = c.src
  GROUP BY n.pk),
r3 AS (
  SELECT n.pk, 0.15 / (SELECT n FROM nn)
         + 0.85 * COALESCE(SUM(p.r * c.frac), 0) AS r
  FROM nodes n LEFT JOIN c ON c.dst = n.pk LEFT JOIN r2 p ON p.pk = c.src
  GROUP BY n.pk)
SELECT CAST(pk AS BIGINT) AS partkey,
       ROUND(r * (SELECT n FROM nn), 4) AS rank_scaled
FROM r3
ORDER BY rank_scaled DESC, partkey
LIMIT 20
"""


@register("parts_copurchase_pagerank", _PAGERANK_ORACLE)
def parts_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _copurchase_edges(spark, sf_dir)
    # pagerank caches the contribution frame internally (the single
    # materialization of the self-join edge build) and returns an
    # eagerly checkpointed rank frame, so counting nodes off the
    # result is free
    ranks = pagerank(edges, damping=0.85, iters=3)
    n_nodes = ranks.count()
    scored = ranks.select(
        F.col("pk").alias("partkey"),
        F.round(F.col("r") * F.lit(float(n_nodes)), 4).alias("rank_scaled"),
    )
    return scored.orderBy(F.desc("rank_scaled"), "partkey").limit(20)


# ---------------------------------------------------------------------------
# Triangle counts + local clustering coefficient over the co-purchase
# graph, via degree-ordered orientation (Suri & Vassilvitskii WWW'11):
# out-degree after orientation is O(sqrt m) even under hub skew, so
# the wedge join is O(m^1.5) total — the property that keeps a
# 10^6-neighbor hub survivable. The oracle counts the same triangles
# naively (id-canonical a<b<c three-way join): orientation is a
# physical strategy, the triangle set is the logical result. The
# oracle's naive join is quadratic-in-degree — excluded at sf0.1 like
# the other all-pairs oracles.
# ---------------------------------------------------------------------------

_TRIANGLES_ORACLE = """
WITH e0 AS (
  SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
                  GREATEST(a.l_partkey, b.l_partkey) AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
d AS (
  SELECT n, COUNT(*) AS deg FROM (
    SELECT u AS n FROM e0 UNION ALL SELECT v FROM e0) GROUP BY 1),
t AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e0 e1
  JOIN e0 e2 ON e2.u = e1.v
  JOIN e0 e3 ON e3.u = e1.u AND e3.v = e2.v),
per AS (
  SELECT a AS n FROM t UNION ALL SELECT b FROM t UNION ALL SELECT c FROM t),
pc AS (SELECT n, COUNT(*) AS tri FROM per GROUP BY 1)
SELECT CAST(d.n AS BIGINT) AS node,
       CAST(d.deg AS BIGINT) AS degree,
       CAST(COALESCE(pc.tri, 0) AS BIGINT) AS triangles,
       ROUND(CASE WHEN d.deg >= 2
                  THEN 2.0 * COALESCE(pc.tri, 0) / (d.deg * (d.deg - 1.0))
                  ELSE 0.0 END, 4) AS clustering
FROM d LEFT JOIN pc ON pc.n = d.n
"""


@register("parts_copurchase_triangles", _TRIANGLES_ORACLE)
def parts_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import triangle_counts

    edges = _copurchase_edges(spark, sf_dir)
    return triangle_counts(edges, "src", "dst")


# ---------------------------------------------------------------------------
# Multi-source BFS hop distance (bounded depth 3) from the sparse seed
# set partkey % 199 == 0, over the co-purchase graph — the
# reachability/radius probe of the iterative-graph family (frontier
# expansion, vs pagerank's fixed-point scoring and CC's label
# propagation). Report = per-hop node count + id checksum, so the
# whole BFS wavefront is value-checked without a node-per-row output.
# Oracle: recursive CTE with UNION (distinct) recursion — the working
# set stays (node, hop)-bounded — then MIN(hop) per node, the textbook
# SQL statement of BFS min-distance.
# ---------------------------------------------------------------------------

_BFS_ORACLE = """
WITH RECURSIVE e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
seeds AS (SELECT DISTINCT src AS n FROM e WHERE src % 199 = 0),
walk(n, hop) AS (
  SELECT n, 0 FROM seeds
  UNION
  SELECT e.dst, w.hop + 1 FROM walk w JOIN e ON e.src = w.n
  WHERE w.hop < 3),
best AS (SELECT n, MIN(hop) AS hop FROM walk GROUP BY 1)
SELECT CAST(hop AS INT) AS hop,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(n) AS BIGINT) AS node_sum
FROM best GROUP BY 1
"""


@register("parts_copurchase_bfs_hops", _BFS_ORACLE)
def parts_copurchase_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import bfs_hops

    # distinct unweighted edges: BFS cares about adjacency, not weight.
    # Materialized ONCE: the seed filter plus every frontier-expansion
    # round re-joins this frame, and without truncation each round
    # would re-run the lineitem self-join lineage (measured 11.3s ->
    # ~4s at sf0.1 from this alone).
    edges = (
        _copurchase_edges(spark, sf_dir)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    seeds = edges.filter(F.col("src") % 199 == 0).select(
        F.col("src").alias("n")
    )
    reached = bfs_hops(edges, seeds, max_hops=3)
    return reached.groupBy(F.col("hop").cast("int").alias("hop")).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("n").alias("node_sum"),
    )


# ---------------------------------------------------------------------------
# Bounded k-core peeling (k=80, 8 rounds) over the co-purchase graph:
# the degeneracy probe of the iterative-graph family — "drop every
# part with fewer than 80 surviving co-purchase partners" iterated to
# (observed) fixpoint. The bounded-round contract keeps the oracle a
# fixed declarative statement at every scale: peeling is monotone, so
# extra rounds past convergence are no-ops, and the `converged` flag
# (round 8 == round 9) reports whether the bound sufficed — at sf0.01
# the graph stabilizes in 6 rounds with a 1857-node 80-core. The
# oracle unrolls the identical 9 rounds as CTEs (generated, like the
# pagerank Jacobi oracle).
# ---------------------------------------------------------------------------

_KCORE_K = 80
_KCORE_ROUNDS = 8


def _kcore_oracle() -> str:
    rounds = []
    for i in range(_KCORE_ROUNDS + 1):  # +1: the convergence probe round
        p, q = f"r{i}", f"r{i + 1}"
        rounds.append(
            f"d{i + 1} AS MATERIALIZED (SELECT src, COUNT(*) AS c FROM {p} GROUP BY 1),\n"
            f"k{i + 1} AS MATERIALIZED (SELECT src FROM d{i + 1} WHERE c >= {_KCORE_K}),\n"
            f"{q} AS MATERIALIZED (SELECT {p}.src, {p}.dst FROM {p}\n"
            f"  JOIN k{i + 1} USING (src)\n"
            f"  JOIN k{i + 1} kk ON {p}.dst = kk.src)"
        )
        last = q
    joined = ",\n".join(rounds)
    final = f"r{_KCORE_ROUNDS}"
    return f"""
WITH r0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
{joined}
SELECT {_KCORE_K} AS k,
       CAST(COUNT(DISTINCT src) AS BIGINT) AS n_nodes,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(DISTINCT src) AS BIGINT) AS node_sum,
       CAST((SELECT COUNT(DISTINCT src) FROM {last})
            = COUNT(DISTINCT src) AS INT) AS converged
FROM {final}
"""


@register("parts_copurchase_kcore", _kcore_oracle())
def parts_copurchase_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import kcore_peel

    # materialized once: round 1 scans the edge frame twice (degree
    # aggregate + survivor join) before the loop's own checkpoints
    # take over — without this the lineitem self-join lineage re-runs
    edges = (
        _copurchase_edges(spark, sf_dir)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    core = kcore_peel(edges, _KCORE_K, _KCORE_ROUNDS)
    probe = kcore_peel(core, _KCORE_K, 1)  # one extra round on survivors
    n_probe = probe.select("src").distinct().count()
    return core.agg(
        F.lit(_KCORE_K).alias("k"),
        F.countDistinct("src").alias("n_nodes"),
        F.count(F.lit(1)).alias("n_edges"),
        F.sum_distinct(F.col("src")).alias("node_sum"),
        (F.countDistinct("src") == F.lit(n_probe)).cast("int").alias(
            "converged"
        ),
    )
