"""Adamic–Adar hub-cap A/B on the UNFLOORED sf0.1 co-purchase graph
(r6 verdict item 8).

The registered query floors edge support at 2, which bounds degrees
at tested scales; the unfloored graph is the stress case the r6 round
measured at 24–35s (20k nodes, 1.2M directed edges, max deg 222,
148M wedges). Wedge cost per center is C(deg, 2) — quadratic — while
a hub center's per-wedge AA contribution 1/ln(deg) vanishes, so the
true-scale mitigation drops wedge CENTERS with deg > cap before
expansion (operators/graph.adamic_adar_scores(hub_cap=...)).

For each cap this script records:
  - wedges:      Σ C(deg, 2) over surviving centers (the expansion
                 volume, computed exactly from the degree histogram)
  - wedge_pct:   share of the uncapped wedge volume kept
  - aa_mass_pct: share of the uncapped TOTAL AA mass kept —
                 Σ C(deg,2)/ln(deg) over surviving centers vs all;
                 the per-pair loss is bounded by the dropped mass
                 (bias, monotone in cap)
  - top20_keep:  |capped top-20 ∩ exact top-20| on the non-adjacent
                 pair report (the query's actual output contract)
  - wall_s:      end-to-end report wall, min of 2

Usage: python scripts/adamic_adar_hubcap_ab.py [sf_dir]
Writes a markdown table to stdout; BASELINE.md records the round's run.
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

CAPS = (None, 128, 64, 32, 16)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from airline_dataset_hadoop_public_spark.operators.graph import (
        adamic_adar_scores,
    )
    from airline_dataset_hadoop_public_spark.plans.fixtures_graph import (
        _copurchase_edges,
    )
    from airline_dataset_hadoop_public_spark.session import get_spark

    spark = get_spark("aa-hubcap-ab", cpus=8, shuffle_partitions=32)

    # unfloored: support >= 1 (every co-purchase line pair is an edge)
    adj = _copurchase_edges(spark, sf_dir).select("src", "dst").persist()
    n_edges = adj.count()

    # exact degree histogram: deg -> center count (tiny; drives the
    # analytic wedge/mass columns without expanding anything)
    hist = {
        r["d"]: r["n"]
        for r in adj.groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    def wedge_mass(cap: int | None) -> tuple[int, float]:
        w = m = 0.0
        for d, n in hist.items():
            if d < 2 or (cap is not None and d > cap):
                continue
            c2 = d * (d - 1) // 2
            w += n * c2
            m += n * c2 / math.log(d)
        return int(w), m

    def report(cap: int | None):
        score = adamic_adar_scores(adj, hub_cap=cap)
        nonadj = score.join(
            adj, (score.u == adj.src) & (score.v == adj.dst), "left_anti"
        )
        return (
            nonadj.select(
                "u", "v", "cn", F.round("aa", 4).alias("aa_score")
            )
            .orderBy(F.desc("aa_score"), "u", "v")
            .limit(20)
        )

    w_all, m_all = wedge_mass(None)
    exact_top = None
    rows = []
    for cap in CAPS:
        wall = float("inf")
        for _ in range(2):
            t0 = time.time()
            top = [(r["u"], r["v"]) for r in report(cap).collect()]
            wall = min(wall, time.time() - t0)
        if cap is None:
            exact_top = set(top)
        w, m = wedge_mass(cap)
        rows.append(
            {
                "cap": "none" if cap is None else cap,
                "wedges": w,
                "wedge_pct": round(100.0 * w / w_all, 2),
                "aa_mass_pct": round(100.0 * m / m_all, 2),
                "top20_keep": len(set(top) & exact_top),
                "wall_s": round(wall, 2),
            }
        )

    print(f"\nunfloored graph: {n_edges} directed edges, "
          f"max deg {max(hist)}, sf_dir={sf_dir}\n")
    cols = ["cap", "wedges", "wedge_pct", "aa_mass_pct", "top20_keep", "wall_s"]
    print("| " + " | ".join(cols) + " |")
    print("|" + "|".join("---" for _ in cols) + "|")
    for r in rows:
        print("| " + " | ".join(str(r[c]) for c in cols) + " |")
    adj.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
