"""CPU adjudication of the two r9 same-family upticks (r9 verdict
item 5): `embeddings_mutual_knn_graph` 28.3 -> 39.5 cpu_sec and
`dedup_semantic_keeplist` 18.9 -> 25.7 between the r8 and r9 bench
details, with ZERO r9 change in operators/similarity.py.

Protocol (the same controlled same-session warm A/B the winsorized
reshape got in r9): one bench-configured session, heavy hygiene
(clearCache + JVM/Python GC) before every measurement, the two
queries interleaved for N rounds at sf0.1, per-run wall + tree-CPU
via bench's own per-(pid,starttime) /proc deltas. If the controlled
numbers sit at the r8 level, the r9 readings were co-tenant smear; if
they reproduce the r9 level, the uptick is real and needs a code
explanation.

Usage: python scripts/knn_keeplist_cpu_ab.py [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_delta_detail, _tree_cpu_snapshot  # noqa: E402


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from airline_dataset_hadoop_public_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("knn-keeplist-ab", cpus=32, driver_memory="48g")
    qs = entrymod.queries()
    names = ["embeddings_mutual_knn_graph", "dedup_semantic_keeplist"]

    def hygiene() -> None:
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        import gc

        gc.collect()

    # warm the session + IO cache once per query, unmeasured
    for n in names:
        qs[n](spark, sf_dir).collect()

    out: dict[str, list[dict]] = {n: [] for n in names}
    for r in range(rounds):
        for n in names:
            hygiene()
            load1 = round(os.getloadavg()[0], 2)
            c0 = _tree_cpu_snapshot()
            t0 = time.time()
            qs[n](spark, sf_dir).collect()
            wall = round(time.time() - t0, 3)
            cpu, resid = _cpu_delta_detail(c0, _tree_cpu_snapshot())
            out[n].append(
                {"round": r, "wall": wall, "cpu": round(cpu, 2),
                 "resid": round(resid, 2), "load1": load1}
            )
    for n in names:
        cpus = sorted(x["cpu"] for x in out[n])
        walls = sorted(x["wall"] for x in out[n])
        print(json.dumps({
            "query": n,
            "runs": out[n],
            "cpu_min": cpus[0], "cpu_med": cpus[len(cpus) // 2],
            "cpu_max": cpus[-1],
            "wall_min": walls[0], "wall_med": walls[len(walls) // 2],
        }))


if __name__ == "__main__":
    main()
