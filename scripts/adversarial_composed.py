"""Composed-corruption sweep: skew, NULL injection, and IEEE-754
extremes applied TOGETHER to one mirror, then the full
registry-vs-DuckDB compare runs on it.

Fifth robustness axis (VERDICT r4 next-round #4): the first four axes
are each swept alone, but real 100 TB data is skewed AND null-ridden
AND special-valued at once, and several r4 contracts interact —
NULLS-LAST argmin meets NaN-LAST sort inside one top-k, identical-set
collapse meets null text inside one dedup, a hot key's group meets a
NaN measure inside one aggregate. Composition order is skew -> NULLs
-> extremes (each builder reads the previous mirror), so:

- the corruption masks use mostly-coprime periods (skew 2/3/4/5,
  NULLs 5-17, extremes 13-53) — most corrupted rows carry exactly one
  corruption (the "disjoint subsets" the axis is about), while the
  period collisions that do occur compose deterministically with the
  LAST writer winning (a viral-copied doc nulled by the NULL pass, a
  nulled measure revived as NaN by the extremes pass);
- the hot user/customer/part keys coexist with NULL join keys in the
  same column, so salting/broadcast machinery sees both at once;
- the viral duplicate cluster contains members whose text was then
  nulled/emptied, so collapse and candidate generation see a
  corrupted clique.

Both engines read the same composed parquet, so every query keeps its
full value oracle. Contracts this sweep forced live in FIXTURES.md §L.

Usage: python scripts/adversarial_composed.py [src_sf_dir] [dst_dir] [query ...]
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from adversarial_extremes import build_extreme  # noqa: E402
from adversarial_nulls import build_nulled  # noqa: E402
from adversarial_skew import build_skewed  # noqa: E402


def build_composed(src: str, dst: str) -> str:
    """skew(src) -> nulls -> extremes, materialized at dst."""
    stage1 = dst + ".stage_skew"
    stage2 = dst + ".stage_nulls"
    build_skewed(src, stage1)
    build_nulled(stage1, stage2)
    build_extreme(stage2, dst)
    shutil.rmtree(stage1, ignore_errors=True)
    shutil.rmtree(stage2, ignore_errors=True)
    return dst


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            REPO, ".scratch",
            "composed_" + os.path.basename(os.path.normpath(src)),
        )
    )
    only = sys.argv[3:]
    build_composed(src, dst)
    print(f"composed-corruption mirror at {dst}", flush=True)
    return subprocess.call(
        [sys.executable, os.path.join(REPO, "scripts", "check_correctness.py"), dst, *only]
    )


if __name__ == "__main__":
    sys.exit(main())
