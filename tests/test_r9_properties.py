"""Property-based pins for the r9 arithmetic (SURVEY.md §5.2 style):
hypothesis-generated inputs checked against plain-Python reference
implementations of each DEFINITION, independent of both the Spark plan
and the DuckDB oracle.

Pure-Python properties run at full hypothesis budget (no Spark); the
one Spark property uses the repo's small-example convention."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# ntile_bucket closed form == definitional NTILE (SQL standard: with
# q = N div k, r = N mod k, buckets 1..r hold q+1 rows, buckets
# r+1..k hold q). Evaluated in pure integer Python exactly as the
# `div`-compiled Spark expression evaluates it.
# ---------------------------------------------------------------------------


def _bucket_closed_form(rank: int, n: int, k: int) -> int:
    q, r = divmod(n, k)
    big = r * (q + 1)
    if rank <= big:
        return -(-rank // (q + 1))
    return r + -(-(rank - big) // q)


def _ntile_definitional(n: int, k: int) -> list[int]:
    q, r = divmod(n, k)
    out = []
    for b in range(1, k + 1):
        out.extend([b] * (q + 1 if b <= r else q))
    return out


@settings(max_examples=300, deadline=None)
@given(st.integers(1, 5000), st.integers(1, 64))
def test_ntile_closed_form_matches_definition(n, k):
    want = _ntile_definitional(n, k)
    got = [_bucket_closed_form(rank, n, k) for rank in range(1, n + 1)]
    assert got == want


@settings(max_examples=120, deadline=None)
@given(st.integers(54, 62), st.integers(0, 1000), st.integers(2, 64))
def test_ntile_closed_form_huge_n_boundaries(expo, jitter, k):
    """Above 2^53 (where double division would round) the closed form
    must still place the first/last row of every bucket correctly."""
    n = (1 << expo) + jitter
    q, r = divmod(n, k)
    if q == 0:
        return
    assert _bucket_closed_form(1, n, k) == 1
    assert _bucket_closed_form(n, n, k) == k
    for b in (1, max(1, r), min(k, r + 1), k):
        # first rank of bucket b
        first = (b - 1) * (q + 1) + 1 if b <= r else r * (q + 1) + (b - 1 - r) * q + 1
        last = first + (q if b <= r else q - 1)
        assert _bucket_closed_form(first, n, k) == b, (b, "first")
        assert _bucket_closed_form(last, n, k) == b, (b, "last")


# ---------------------------------------------------------------------------
# KMV estimator definition: over any multiset of strings, the reported
# estimate equals (k-1)/U_(k) with U_(k) the k-th smallest normalized
# md5-60bit hash of the DISTINCT values — and exact below capacity.
# Python replay is hash-for-hash what both engines compute.
# ---------------------------------------------------------------------------

_HASH_SPACE = 2.0**60


def _kmv_reference(values: list[str], k: int) -> tuple[int, float]:
    distinct = sorted(set(values))
    hs = sorted(
        (int(hashlib.md5(v.encode()).hexdigest()[:15], 16), v)
        for v in distinct
    )
    n = len(hs)
    if n < k:
        return n, float(n)
    kth = max(hs[k - 1][0], 1)
    return n, (k - 1) / (kth / _HASH_SPACE)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 400)),
        min_size=1,
        max_size=120,
    ),
    st.integers(2, 16),
)
def test_kmv_matches_python_reference(spark, pairs, k):
    from airline_dataset_hadoop_public_spark.operators.sketches import (
        kmv_distinct_per_key,
    )

    df = spark.createDataFrame(
        [(t, str(u)) for t, u in pairs], "key string, val string"
    )
    got = {
        r["key"]: r
        for r in kmv_distinct_per_key(df, "key", "val", k=k).collect()
    }
    by_key: dict[str, list[str]] = {}
    for t, u in pairs:
        by_key.setdefault(t, []).append(str(u))
    assert set(got) == set(by_key)
    for key, vals in by_key.items():
        n, est = _kmv_reference(vals, k)
        assert got[key]["n_exact"] == n
        assert math.isclose(
            got[key]["kmv_estimate"], round(est, 4), abs_tol=1e-9
        ), key
