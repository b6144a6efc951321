"""Per-query profiling harness for the optimization rounds.

Runs the named queries (default: the top wall/CPU heavies) at
$SPARK_GRAFT_SF_DIR with the SAME session conf and drain rule as
bench.py, and for each one records:

- wall seconds per pass (two passes, min reported) with the query
  additionally drained through the noop sink (guide §1.4) so the
  computation is timed without collect/count artifacts;
- the number of Spark jobs and stages the action spawned (via the
  status tracker deltas) — a proxy for scheduling overhead;
- `.explain("formatted")` written to plans/r10/<name>_<tag>.txt
  when --explain <tag> is passed.

Usage:
  python scripts/profile_query.py [--explain TAG] [--noop] [query ...]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "parts_copurchase_kcore",
    "dedup_minhash_incremental",
    "parts_copurchase_triple_itemsets",
    "dedup_minhash_neardup",
    "dedup_simhash_clusters",
    "dedup_ngram_jaccard",
    "parts_copurchase_bfs_hops",
    "text_winnowing_overlap",
    "docs_dsir_importance_weights",
    "embeddings_cluster_curation_report",
    "dedup_containment_neardup",
    "similarity_srp_lsh_pairs",
]


def main() -> int:
    args = sys.argv[1:]
    tag = None
    use_noop = False
    if "--explain" in args:
        i = args.index("--explain")
        tag = args[i + 1]
        del args[i : i + 2]
    if "--noop" in args:
        use_noop = True
        args.remove("--noop")
    names = args or DEFAULT

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entry
    from airline_dataset_hadoop_public_spark.session import get_spark

    spark = get_spark("profile", cpus=cpus, driver_memory="48g")
    sc = spark.sparkContext
    qs = entry.queries()

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("ADHPS_PLANS_DIR", "r11"),
    )
    os.makedirs(plans_dir, exist_ok=True)

    # warmup at the smallest sf so codegen is not attributed
    for name in names:
        try:
            qs[name](spark, "/root/testdata/sf0.001").count()
        except Exception as exc:  # noqa: BLE001
            print(f"WARMUP-FAIL {name}: {exc}", file=sys.stderr)
    spark.catalog.clearCache()

    tracker = sc.statusTracker()

    def job_ids() -> set[int]:
        return set(tracker.getJobIdsForGroup(None) or [])

    results: dict[str, dict] = {}
    for name in names:
        best = None
        for _ in range(2):
            spark.catalog.clearCache()
            sc.setJobDescription(f"profile:{name}")
            before_jobs = job_ids()
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            if use_noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                from bench import _DRAIN_WITH_COUNT

                if name in _DRAIN_WITH_COUNT:
                    df.count()
                else:
                    df.collect()
            wall = time.time() - t0
            n_jobs = len(job_ids() - before_jobs)
            if best is None or wall < best[0]:
                best = (wall, n_jobs)
            sc.setJobDescription(None)
        results[name] = {"wall": round(best[0], 3), "jobs": best[1]}
        if tag:
            df = qs[name](spark, sf_dir)
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            # strip plan-id noise so diffs across runs are readable
            out = os.path.join(plans_dir, f"{name}_{tag}.txt")
            with open(out, "w") as fh:
                fh.write(text)
        exch = ""
        if tag:
            n_ex = len(re.findall(r"\bExchange\b", text))
            exch = f" exchanges={n_ex}"
        print(f"{results[name]['wall']:8.3f}s jobs={results[name]['jobs']:3d}{exch}  {name}")

    total = round(sum(r["wall"] for r in results.values()), 3)
    print(f"TOTAL {total}s over {len(results)} queries")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
