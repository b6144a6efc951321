"""Distributed skyline (Pareto frontier) operator.

Absent from the reference (whose §2 surface is scan/agg/top-k/join)
and from Spark's builtin operator menu; a multi-criteria filter every
curation pipeline eventually needs ("keep documents no other document
beats on BOTH quality and length", "parts no other part beats on both
price and popularity"). Classic relational-operator literature:
Börzsönyi, Kossmann & Stocker, ICDE 2001 (the SKYLINE OF operator);
the single-pass sorted filter is Chomicki et al.'s SFS (ICDE 2003).

Scale layout — the canonical two-phase distributed skyline:

1. LOCAL phase (`mapInPandas`, Arrow batches): each partition emits
   only its partition-local skyline. Correct as a filter by dominance
   transitivity: a point dominated by a partition-local neighbor is
   dominated globally, and a global skyline point can never be
   locally dominated — so phase 1 never drops a true answer and never
   needs cross-partition data. The pass itself is SFS: sort the batch
   by a monotone preference score (the sum of normalized-direction
   dims); a point can only be dominated by points sorted AT OR BEFORE
   it, so one vectorized numpy compare of each point against the
   running skyline buffer suffices (O(n·s) with s = skyline size,
   s << n on real data).
2. GLOBAL phase: the union of local skylines (bounded: #partitions x
   local skyline size) is re-run through the same SFS kernel in a
   single task. No driver collect — the refine runs as one
   single-group Arrow batch, and the final skyline stays a DataFrame.

NULL/NaN contract: a row with a NULL or NaN in any skyline dimension
is not comparable and is excluded (FIXTURES.md §J/§K); oracles mirror
with IS NOT NULL + isfinite guards. Duplicate points (equal on every
dimension) are ALL kept — neither strictly improves on the other, so
neither dominates (the ICDE'01 definition).

Precision contract: dominance is evaluated in float64, so integer
dimensions must stay within the exact-double domain (|x| < 2^53 —
9e15; far above any count/cents measure). Two integers that collide
in float64 would be treated as ties (both kept) where an exact
comparison would drop one; keep dimensions inside the domain or
pre-scale them.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sfs_kernel(cols: Sequence[str], signs: Sequence[float]):
    """Return a mapInPandas kernel that emits the skyline of its
    input batches. `signs[i] = +1` for maximize, `-1` for minimize —
    internally everything becomes maximize."""
    import numpy as np

    sgn = np.asarray(signs, dtype=np.float64)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [pdf for pdf in it if len(pdf)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        x = pdf[list(cols)].to_numpy(dtype=np.float64) * sgn
        ok = np.isfinite(x).all(axis=1)
        pdf, x = pdf[ok], x[ok]
        if not len(pdf):
            return
        # SFS order: descending preference sum — any point's dominators
        # sort at-or-before it. Float addition is monotone, so a
        # dominator's ROUNDED sum is >= the dominated point's rounded
        # sum; equality (not inversion) is the only rounding hazard
        # (e.g. dims summing past 2^53). Break sum ties by descending
        # lexicographic order on the dimension vector itself: within an
        # equal-sum group a dominator is >= on every dim with one
        # strict, so it still sorts strictly before the point it
        # dominates. lexsort's LAST key is primary.
        order = np.lexsort(
            tuple(-x[:, k] for k in reversed(range(x.shape[1])))
            + (-x.sum(axis=1),)
        )
        x = x[order]
        keep_rows: list[int] = []
        buf = np.empty((0, x.shape[1]))
        for i in range(len(x)):
            p = x[i]
            if len(buf):
                ge = (buf >= p).all(axis=1)
                gt = (buf > p).any(axis=1)
                if bool((ge & gt).any()):
                    continue  # dominated by a skyline member
            keep_rows.append(i)
            buf = np.vstack([buf, p])
        yield pdf.iloc[order[keep_rows]]

    return kernel


def skyline(
    df: DataFrame,
    maximize: Sequence[str] = (),
    minimize: Sequence[str] = (),
) -> DataFrame:
    """Rows not dominated by any other row: no other row is >= on
    every `maximize` column, <= on every `minimize` column, and
    strictly better on at least one. All original columns pass
    through."""
    dims = list(maximize) + list(minimize)
    if not dims:
        raise ValueError("skyline needs at least one dimension")
    signs = [1.0] * len(maximize) + [-1.0] * len(minimize)
    cond = None
    for c in dims:
        col = F.col(c)
        ck = col.isNotNull() & ~F.isnan(col.cast("double"))
        cond = ck if cond is None else cond & ck
    clean = df.filter(cond)
    kernel = _sfs_kernel(dims, signs)
    local = clean.mapInPandas(kernel, clean.schema)
    # global refine over the bounded union of local skylines in one
    # task — via repartition(1), an EXCHANGE, not coalesce(1): a
    # shuffle-free coalesce is a narrow dependency that would collapse
    # the "parallel" local phase into the same single task (r5 review
    # finding), whereas the exchange moves only the small local-skyline
    # union and keeps phase 1 partition-parallel
    return local.repartition(1).mapInPandas(kernel, clean.schema)
