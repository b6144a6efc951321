"""Zero-row adversarial sweep: the full registry against SCHEMA-
PRESERVED EMPTY copies of every fixture table.

Empty partitions and empty sources are routine at 100 TB (a pruned
scan, a day with no data, a tenant with no rows); sf0.001 only
exercises NEAR-empty. The r4 first run of this axis found 11 real
divergences (BASELINE.md "r4 zero-row hardening sweep"); this commits
the harness so the axis stays a one-command re-run like the other
five (skew / NULLs / extremes / composed / plan-shift).

Usage: python scripts/adversarial_zerorow.py [src_sf_dir] [dst_dir] [query ...]
Defaults: src=/root/testdata/sf0.001, dst=<repo>/.scratch/zero_sf
"""

from __future__ import annotations

import os
import subprocess
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def build_mirror(src: str, dst: str) -> str:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        schema = pq.read_schema(os.path.join(src, f"{t}.parquet"))
        pq.write_table(
            schema.empty_table(), os.path.join(dst, f"{t}.parquet")
        )
    return dst


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".scratch", "zero_sf"
    )
    names = sys.argv[3:]
    build_mirror(src, dst)
    return subprocess.call(
        [sys.executable, os.path.join(REPO, "scripts", "check_correctness.py"),
         dst] + names,
        cwd=REPO,
    )


if __name__ == "__main__":
    raise SystemExit(main())
