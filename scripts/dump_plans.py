"""Dump `.explain("formatted")` for named queries to plans/<dir>/.

Explain-only: builds each query's DataFrame at $SPARK_GRAFT_SF_DIR and
writes the formatted physical plan — no drain, so it is cheap enough
to capture before/after evidence without a bench run (eager fixture
construction, e.g. the rank walks' size collects, still executes).

Usage: python scripts/dump_plans.py TAG query [query ...]
       ADHPS_PLANS_DIR=r11 (default) selects plans/<dir>.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag, names = sys.argv[1], sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entry
    from airline_dataset_hadoop_public_spark.session import get_spark

    spark = get_spark("dump-plans", cpus=cpus, driver_memory="48g")
    qs = entry.queries()
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("ADHPS_PLANS_DIR", "r11"),
    )
    os.makedirs(plans_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = os.path.join(plans_dir, f"{name}_{tag}.txt")
        with open(out, "w") as fh:
            fh.write(text)
        n_ex = len(re.findall(r"\bExchange\b", text))
        n_py = len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas", text)
        )
        print(f"{name}: exchanges={n_ex} python_nodes={n_py} -> {out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
