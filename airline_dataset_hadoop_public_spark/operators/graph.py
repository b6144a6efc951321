"""Iterative graph algorithms over edge-list DataFrames.

The reference has no graph surface at all (its closest analog is the
single tagged reduce-side join, reference README.md:437-520); this
module supplies the Pregel-style *aggregate-then-iterate* pattern a
100 TB pipeline actually uses: the raw fact table is first collapsed
into a weighted edge list (linear scan + one shuffle), and the
iterative part then runs over the much smaller graph — each iteration
is one join + one aggregate on (src, dst, frac), never on the raw
facts.

Scale contracts:
- The contribution frame (edges normalized by out-degree) is computed
  once, cached for the loop, and unpersisted before return.
- Each iteration's rank frame is localCheckpoint-truncated so the
  logical plan stays O(1) in the iteration count instead of doubling
  per round (same discipline as connected components,
  operators/dedup.py:457).
- Double-precision rank sums are order-nondeterministic in their low
  bits; callers that need cross-engine stable output must round
  (ROUND(rank*N, 4) keeps ~11 safe decimal digits of headroom).

Related: connected components (operators/dedup.py:440) covers the
label-propagation family; this covers fixed-point scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    symmetric: bool = True,
    checkpoint_interval: int = 5,
) -> DataFrame:
    """Weighted PageRank over a directed edge list.

    Returns (pk, r) with sum(r) == 1 when every node has out-edges
    (no dangling-mass redistribution is performed; co-occurrence
    graphs are symmetric so the caller contract holds by
    construction — pass symmetric=False for graphs where sink-only
    nodes may exist, which also pays an extra union-distinct to
    collect them).

    The contribution frame is the ONLY cached materialization of the
    edge build: the out-degree aggregate inside it is an identical
    subtree to the edge groupBy, so Spark's ReuseExchange serves both
    from one shuffle, and with symmetric=True the node set is derived
    from the cached frame instead of re-scanning the edges.
    """
    out = edges.groupBy(src).agg(F.sum(weight).alias("outw"))
    contrib = (
        edges.join(out, src)
        .select(
            F.col(src).alias("c_src"),
            F.col(dst).alias("c_dst"),
            (F.col(weight).cast("double") / F.col("outw")).alias("frac"),
        )
        .cache()
    )
    if symmetric:
        nodes = contrib.select(F.col("c_src").alias("pk")).distinct()
    else:
        nodes = (
            edges.select(F.col(src).alias("pk"))
            .union(edges.select(F.col(dst).alias("pk")))
            .distinct()
        )
    nodes = nodes.cache()
    n = nodes.count()

    ranks = nodes.select("pk", F.lit(1.0 / n).alias("r"))
    base = (1.0 - damping) / n
    try:
        for i in range(iters):
            # ranks is node-cardinality (small vs edges): broadcast it
            # so the per-iteration join never shuffles the edge table
            msgs = (
                contrib.join(F.broadcast(ranks), contrib.c_src == ranks.pk)
                .groupBy("c_dst")
                .agg(F.sum(F.col("r") * F.col("frac")).alias("msum"))
            )
            ranks = nodes.join(msgs, nodes.pk == msgs.c_dst, "left").select(
                "pk",
                (
                    F.lit(base) + F.lit(damping) * F.coalesce("msum", F.lit(0.0))
                ).alias("r"),
            )
            # truncate lineage only every few rounds: deep runs stay
            # O(interval) in plan size, shallow runs stay one fully
            # pipelined job (each eager checkpoint is its own job)
            if (i + 1) % checkpoint_interval == 0 and (i + 1) < iters:
                ranks = ranks.localCheckpoint(eager=True)
        ranks = ranks.localCheckpoint(eager=True)
    finally:
        contrib.unpersist()
        nodes.unpersist()
    return ranks
