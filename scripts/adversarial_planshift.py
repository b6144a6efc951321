"""Sixth adversarial axis: PLAN-SHIFT invariance.

The five data axes (zero-row / skew / NULLs / extremes / composed)
corrupt the INPUT; this axis perturbs the PHYSICAL PLAN and demands
bit-identical results against the same DuckDB oracles on clean data.
At 100 TB the optimizer's strategy choices differ from any toy run —
AQE re-plans mid-query, broadcast thresholds flip joins to sort-merge,
skew splitting rewrites partitioning — so an engine whose RESULTS
depend on which physical strategy fired is wrong in a way toy-scale
green cannot see. One full-registry gate run under:

- spark.sql.adaptive.enabled=false            (no runtime re-planning,
  no partition coalescing, no AQE skew splitting)
- spark.sql.autoBroadcastJoinThreshold=-1     (every auto-broadcast
  join becomes sort-merge/shuffled-hash; explicit broadcast() hints
  keep their meaning, as on a real cluster)
- spark.sql.join.preferSortMergeJoin=false    (where a shuffle join
  remains, prefer shuffled-hash over sort-merge — flips the join
  operator family end to end)
- spark.sql.optimizer.dynamicPartitionPruning.enabled=false
  (DPP off: pruned and unpruned scans must agree)
- local[7] / shuffle.partitions=13            (the determinism sweep's
  perturbed parallelism, so summation order shifts too)

Usage: python scripts/adversarial_planshift.py [sf_dir]
(defaults to sf0.001, like the composed-corruption sweep).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PLAN_SHIFT_CONF = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.optimizer.dynamicPartitionPruning.enabled": "false",
}


def main() -> int:
    os.environ["ADHPS_GATE_CPUS"] = "7"
    os.environ["ADHPS_GATE_SHUFFLE"] = "13"
    os.environ["ADHPS_GATE_CONF"] = ",".join(
        f"{k}={v}" for k, v in PLAN_SHIFT_CONF.items()
    )
    sys.argv = [sys.argv[0]] + (
        sys.argv[1:] if len(sys.argv) > 1 else ["/root/testdata/sf0.001"]
    )
    import check_correctness

    return check_correctness.main()


if __name__ == "__main__":
    raise SystemExit(main())
